"""User-facing solver entry — the reference's `RBL(A, k, b)` / `RBL_gpu`
surface (RBL.jl:119-142, RBL_gpu.jl:205-221), as a single device-agnostic
function: the same code runs on one TPU chip, a CPU test mesh, or a
multi-chip row-sharded mesh depending on cfg.mesh.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import RBLConfig
from ..ops.spmm.operator import LinearOperator, as_operator
from ..parallel.memory import clamp_kryl_dim
from .basis import BasisStore
from .lanczos import (
    LanczosResult,
    lanczos_iteration,
    random_start_block,
    recover_eigvec,
)


def _row_sharding(cfg: RBLConfig):
    if cfg.mesh is None:
        return None
    from jax.sharding import NamedSharding, PartitionSpec as P

    return NamedSharding(cfg.mesh, P(cfg.rows_axis, None))


def rbl(
    A: Any,
    k: int,
    b: Optional[int] = None,
    cfg: Optional[RBLConfig] = None,
    compute_eigenvectors: bool = True,
    timer=None,
) -> LanczosResult:
    """Compute the k largest-magnitude eigenpairs of the symmetric operator A
    with randomized block Lanczos.

    Parameters mirror the reference's ``RBL(A, k, b) -> (D, V)``
    (RBL.jl:119-142): A may be a LinearOperator, dense/diagonal array, or
    scipy sparse matrix; k is the number of eigenpairs; b the block size.

    Returns a LanczosResult with eigenvalues sorted descending by |λ| and
    (optionally) the matching Ritz vectors.
    """
    cfg = cfg or RBLConfig()
    if b is not None:
        cfg = cfg.replace(block_size=b)
    b = cfg.block_size
    op = as_operator(A, dtype=cfg.compute_dtype)
    n = op.n
    if not (0 < k <= n):
        raise ValueError(f"k={k} out of range for n={n}")

    # TPU f32 matmuls default to bf16 input precision (MXU) — percent-level
    # reorth residue that runs the sweep away on long solves; "highest"
    # emulates true f32 (the reference's CUBLAS numerics).  Bound at trace
    # time; part of jit cache keys; no-op on CPU/f64.
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _rbl_impl(op, k, cfg, compute_eigenvectors, timer)


def _rbl_impl(op, k, cfg, compute_eigenvectors, timer):
    b = cfg.block_size
    n = op.n
    sharding = _row_sharding(cfg)
    max_kryl = clamp_kryl_dim(
        cfg.max_kryl_dim, n, b, cfg.basis_dtype, cfg.compute_dtype,
        n_devices=(cfg.mesh.devices.size if cfg.mesh is not None else 1),
        budget_fraction=cfg.hbm_budget_fraction,
    )
    cfg = cfg.replace(max_kryl_dim=max_kryl)

    key = jax.random.PRNGKey(cfg.seed)
    Qi = random_start_block(op, key, b, cfg, sharding=sharding)
    store = BasisStore(
        n, b, max_cols=max_kryl + b, dtype=cfg.basis_dtype,
        init_cols=cfg.min_basis_cols, sharding=sharding,
        device_cap_cols=cfg.basis_device_cap_cols,
    )

    w_sel, V_sel, T, bounds, converged, nblocks = lanczos_iteration(
        op, k, cfg, Qi, store, timer=timer
    )

    # ascending-|λ| → descending, as the reference returns
    # (D[end:-1:1], V[:,end:-1:1] — RBL.jl:116)
    D = np.asarray(w_sel)[::-1].copy()
    bounds_desc = bounds[::-1].copy() if bounds is not None else None
    V = None
    if compute_eigenvectors:
        Vk = np.asarray(V_sel)[:, ::-1]
        V = recover_eigvec(store, Vk)
        # Shifted Rayleigh-quotient refinement: the refined θ carries
        # O(eps·|θ|) rounding instead of the O(n·eps·‖A‖) accumulated in T.
        # The TRUE residual norms it computes along the way replace the
        # Lanczos bounds in the result — they stay honest even when the
        # basis degraded (the bounds assume exact orthonormality).
        from .lanczos import _rayleigh_refine

        D_j, res_j = _rayleigh_refine(
            op, V, jnp.asarray(D), cdt=jnp.dtype(cfg.compute_dtype)
        )
        D = np.asarray(D_j)
        bounds_desc = np.asarray(res_j)
        if converged and np.max(bounds_desc) > 10 * cfg.tol:
            # the Lanczos bound ‖B·y‖ assumes an orthonormal basis; if the
            # TRUE residuals contradict it, the basis degraded and the
            # convergence claim is not trustworthy — never report a
            # converged=True result whose actual residuals fail the
            # tolerance by an order of magnitude
            converged = False

    return LanczosResult(
        eigenvalues=D,
        eigenvectors=V,
        iterations=nblocks,
        kryl_dim=store.ncols,
        converged=converged,
        residual_bounds=bounds_desc,
    )


# Reference-shaped alias: RBL(A, k, b) -> (D, V)
def RBL(A, k: int, b: int, cfg: Optional[RBLConfig] = None):
    res = rbl(A, k, b, cfg=cfg)
    return res.eigenvalues, res.eigenvectors
