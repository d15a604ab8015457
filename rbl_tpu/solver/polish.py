"""Warm-started mixed-precision solve: f32 sweep → f64 restarted polish.

Motivation (measured, BENCHMARKS.md "At the reference's own tolerance"):
at the reference's absolute 1e-7 residual bound (RBL.jl:109) a clustered
spectrum needs restarts (ARPACK's own mechanism), and a full-f64 sweep on
TPU pays both the X64-emulation compile/compute tax and an HBM wall (the
512² basis OOMs above kryl ≈ 832).  But f32 sweeps are 10-40× cheaper and
reach an absolute residual floor of ~30·eps_f32·‖A‖ ≈ 1e-5-class — which
is an excellent WARM START: eigenvectors accurate to ~1e-5 in angle leave
the f64 restarted solver only the last 2-3 digits to earn, with short
sweeps and a basis bounded by the sweep length (not the full-solve cap).

Pipeline:
  1. coarse: f32/f32 plain sweep (`rbl`) at a relaxed tolerance — fast,
     no X64 emulation anywhere.
  2. polish: f64 restarted+deflating solve (`rbl_restarted`) whose start
     block and per-restart seeds are the coarse eigenvectors aligned with
     the not-yet-locked pairs (``warm_V`` — restarted.py).

This is the TPU answer to the role the reference's FLOAT/DOUBLE precision
pair plays (common.jl:5-6, README.md:69 mixed-precision rationale): the
reference spends FLOAT on the reorth/buffer tier inside one f64 sweep; on
TPU (no native f64 MXU) the winning split is f32 for the WHOLE subspace
discovery and f64 only for the final polish.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax.numpy as jnp

from ..config import RBLConfig
from .lanczos import LanczosResult
from .rbl import rbl
from .restarted import rbl_restarted


def rbl_polished(
    A: Any,
    k: int,
    cfg: Optional[RBLConfig] = None,
    b: int = 8,
    coarse_tol: float = 1e-4,
    coarse_cfg: Optional[RBLConfig] = None,
    polish_kryl_dim: Optional[int] = None,
    max_restarts: Optional[int] = None,
    which: str = "LM",
    timer=None,
    checkpoint_path: Optional[str] = None,
) -> LanczosResult:
    """Two-stage solve: f32 subspace discovery, f64 restarted polish.

    Parameters mirror ``rbl_restarted``; ``cfg`` governs the POLISH stage
    (its ``tol`` is the final bar; dtypes default f64).  The coarse stage
    runs ``rbl`` with f32 basis/compute at ``coarse_tol`` (absolute
    residual bound, like ``cfg.tol``) — override details via
    ``coarse_cfg``.  ``polish_kryl_dim`` caps each polish sweep (default
    ``max(8·b, 2·k)`` rounded up to a block multiple); the restarted
    driver's early convergence break keeps actual sweeps short.

    Returns the polish stage's ``LanczosResult``; ``iterations`` counts
    polish restarts.  If the coarse stage finds nothing (pathological),
    the polish runs cold — identical to plain ``rbl_restarted``.
    """
    cfg = cfg or RBLConfig()
    if coarse_cfg is None:
        coarse_cfg = cfg.replace(
            basis_dtype=jnp.float32,
            compute_dtype=jnp.float32,
            tol=max(coarse_tol, np.finfo(np.float32).eps),
            qr_method="auto",  # resolve per-dtype (cholqr2 for f32)
            sweep_checkpoint_path=None,
        )
    coarse = rbl(A, k, cfg=coarse_cfg, b=b, which=which, timer=timer)
    warm_V = coarse.eigenvectors
    if warm_V is not None and not bool(np.all(np.isfinite(np.asarray(warm_V)))):
        warm_V = None  # post-crash-worker garbage: run the polish cold

    if polish_kryl_dim is None:
        polish_kryl_dim = max(8 * b, 2 * k)
        polish_kryl_dim += (-polish_kryl_dim) % b
    if max_restarts is None:
        # measured on a clustered top-50 (128² Laplacian): ~0.7-8 pairs
        # lock per restart depending on gap structure — budget ~1 restart
        # per b/2 pairs plus stall slack
        max_restarts = 4 * (k + b - 1) // b + 16
    polish_cfg = cfg.replace(restart_kryl_dim=polish_kryl_dim)
    res = rbl_restarted(
        A, k, cfg=polish_cfg, b=b, max_restarts=max_restarts, timer=timer,
        checkpoint_path=checkpoint_path, which=which, warm_V=warm_V,
        # poll only the next ~2 groups per sweep: the all-or-nothing bound
        # over every remaining pair makes sweeps run to cap while locking
        # tiny prefixes (rbl_restarted docstring)
        poll_ahead=2 * b,
    )
    return res
