"""Projected (Rayleigh–Ritz) eigensolve, Ritz selection, and convergence.

Reference path: a raw ccall into LAPACK dsbev/ssbev on the *host*, even in
the GPU solver (common.jl:28-48; called at RBL.jl:107, RBL_gpu.jl:187) — T is
small so shipping it to the CPU is the right call there and here.

TPU build:
- "banded_host": scipy.linalg.eig_banded — the exact dsbev equivalent,
  running in f64 on the host while the device keeps the n-sized state.
- "device": jnp.linalg.eigh of the densified T — for fully-on-device jitted
  sweeps (no host round-trip; used by the jit-closed restarted sweep and the
  multichip dry run).

Ritz selection keeps the k largest by |λ| (reference sort_eig_abs,
common.jl:50-54); convergence is the all-or-nothing residual bound
‖B_i · V[last b rows, i]‖ ≤ tol over all k pairs (check_convergence,
common.jl:56-65).
"""

from __future__ import annotations

import numpy as np
import scipy.linalg

import jax.numpy as jnp


def eig_banded_host(band: np.ndarray):
    """All eigenpairs of the banded symmetric T (LAPACK sbevd path).
    Returns (w ascending, V) as numpy f64."""
    w, V = scipy.linalg.eig_banded(band.astype(np.float64), lower=True)
    return w, V


def eigh_device(T_dense):
    """On-device dense symmetric eigensolve of T."""
    return jnp.linalg.eigh(T_dense)


def sort_eig_abs(w, V, k: int):
    """Keep the k largest-|λ| eigenpairs, ordered ascending by |λ|
    (reference sort_eig_abs, common.jl:50-54 — callers reverse at return)."""
    xp = jnp if isinstance(w, jnp.ndarray) else np
    perm = xp.argsort(xp.abs(w))
    perm_k = perm[-k:]
    return w[perm_k], V[:, perm_k]


def ritz_residual_bounds(Bi, V, b: int):
    """Per-Ritz-pair residual bounds ‖B_i · V[last b rows, j]‖₂.

    The classical Lanczos bound: the residual of Ritz pair (θ, Q·y) equals
    ‖B_i · y[last b rows]‖ (used at common.jl:56-65 and restarted.jl:93)."""
    xp = jnp if isinstance(V, jnp.ndarray) else np
    Y = Bi @ V[-b:, :]
    return xp.linalg.norm(Y, axis=0)


def check_convergence(Bi, V, b: int, k: int, tol: float) -> bool:
    """All-or-nothing: every one of the k selected Ritz pairs must meet the
    residual bound (reference check_convergence, common.jl:56-65)."""
    bounds = ritz_residual_bounds(np.asarray(Bi), np.asarray(V[:, :k]), b)
    return bool(np.all(bounds <= tol))
