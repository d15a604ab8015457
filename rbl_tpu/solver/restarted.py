"""Explicitly restarted, deflating randomized block Lanczos.

Reference: restarted.jl — `RBL_gpu_restarted` / `RBL_restarted`
(restarted.jl:97-146, 196-246) run fixed-length Lanczos sweeps with no
convergence polling, deflate against a lock set of converged Ritz vectors
every 3rd iteration (restarted.jl:53-57), then after one banded eigensolve
lock every Ritz pair whose residual bound clears 1e-7, seed the next sweep
with the first unconverged Ritz vector, and grow the sweep by 10
(restarted.jl:131-142).  Memory stays bounded by the sweep length — the
variant trades restarts for basis storage.

TPU build notes:
- One device-agnostic implementation replaces the CPU/GPU twins.
- The lock set is a zero-padded (n, k) device buffer sharded like the basis;
  deflation is the same fused projection as partial reorth.
- The sweep state at a restart boundary (lock set, locked values, count,
  sweep length, next start block, PRNG key) is the checkpoint/resume
  surface (SURVEY §5 — the reference has no checkpointing; this variant is
  where it naturally attaches).
- Unlike the reference, which returns V = zeros and discards the locked
  vectors (restarted.jl:99-100,145 — SURVEY #20 notes the quirk), we return
  the locked Ritz vectors.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import RBLConfig
from ..ops.band import BlockTridiagonalT
from ..ops.eig import eig_banded_host, ritz_residual_bounds
from ..ops.qr import block_qr
from ..ops.reorth import deflate
from ..ops.spmm.operator import LinearOperator, as_operator
from .basis import BasisStore, _write_block
from .lanczos import (
    LanczosResult,
    _first_step,
    _sweep_chunk,
    random_start_block,
    recover_eigvec,
)


@dataclasses.dataclass
class RestartState:
    """Checkpointable restart-boundary state (SURVEY §5)."""

    lock_buf: Any              # (n, k) zero-padded locked Ritz vectors
    locked_values: np.ndarray  # (k,)
    count: int
    kryl_dim: int
    Qi: Any                    # next start block (n, b)
    restarts: int = 0


def _restarted_sweep(op, cfg: RBLConfig, Qi, store: BasisStore, lock_buf, timer):
    """One fixed-length sweep (reference lanczos_iteration_res,
    restarted.jl:23-95), chunk-fused like the main driver: iterations run
    in jitted windows (_sweep_chunk, deflation + partial reorth on the
    i % 3 cadence resolved to static per-step patterns) and each window's
    T blocks come back in one stacked transfer — the restarted variant has
    no convergence polls at all, so the whole sweep costs only
    ceil(sweep/window) RPC round-trips.  Returns (w desc-|λ|, V desc,
    bounds desc)."""
    from ..utils.profiling import null_timer

    timer = timer or null_timer()
    b = Qi.shape[1]
    cdt = jnp.dtype(cfg.compute_dtype)
    qr_method = cfg.resolved_qr_method()
    kryl = min(cfg.restart_kryl_dim, ((op.n + b - 1) // b) * b)
    T = BlockTridiagonalT(b, max_cols=kryl + b)

    # deflate + re-orthonormalize the start block (the reference deflates
    # without renormalizing, restarted.jl:40; we renormalize for a properly
    # scaled T)
    Qi = deflate(lock_buf, Qi)
    Qi, _ = block_qr(Qi.astype(cdt), method=qr_method)
    Qi = Qi.astype(cfg.basis_dtype)

    with timer.section("recurrence"):
        Qnext, Bnext, Ai = _first_step(op, Qi, cdt=cdt, qr_method=qr_method)
    AB0 = np.asarray(jnp.stack([Ai, Bnext.astype(Ai.dtype)]))
    T.append_diag(AB0[0])
    T.set_subdiag(AB0[1], 0)
    Qprev, Qi, Bi = Qi, Qnext, Bnext
    Bi_host = AB0[1]

    i = 1
    # last iteration of the sweep: max i with i·b < kryl (the replaced
    # loop's 'while (i+1)*b < kryl' pre-increment condition)
    i_last = (kryl - 1) // b
    dc = cfg.restart_reorth_cadence
    window = max(cfg.eig_poll_cadence, 1)
    while i < i_last:
        S = min(window, i_last - i)
        i0 = i + 1
        pattern = tuple((i0 + s) % dc == 0 for s in range(S))
        store._ensure(store.ncols + S * b)
        col0 = store.ncols - store.dev_base
        with timer.section("sweep_dispatch"):
            buf, Qi, Qprev, Bi, TB = _sweep_chunk(
                op, store.buf, Qi, Qprev, Bi, jnp.int32(col0), lock_buf,
                cdt=cdt, qr_method=qr_method, nsteps=S,
                reorth_pattern=pattern,
                loc_passes=cfg.loc_reorth_passes,
            )
            store.buf = buf
            store.ncols += S * b
        with timer.section("transfer"):
            TB = np.asarray(TB)
        for s in range(S):
            T.append_diag(TB[2 * s])
            if (i0 + s) < i_last:  # reference skips the last sub-diagonal
                T.set_subdiag(TB[2 * s + 1], i0 + s - 1)
        i += S
        Bi_host = TB[2 * (S - 1) + 1]

    # final cleanup reorth of the newest block before the single eigensolve
    # (reference restarted.jl:89-91 cleans the last two stored blocks)
    with timer.section("deflate"):
        Qprev = deflate(lock_buf, Qprev)
    with timer.section("partial_reorth"):
        from ..ops.reorth import project_out

        Qprev = project_out(store.view(), Qprev)
    store.append(Qprev)

    with timer.section("eig"):
        w, V = eig_banded_host(T.view(store.ncols))
    bounds = ritz_residual_bounds(Bi_host, V, b)
    # descending by |λ| (the reference orders by algebraic value,
    # restarted.jl:93-94; |λ| keeps parity with the main solver's
    # largest-magnitude contract)
    order = np.argsort(-np.abs(w))
    return w[order], V[:, order], bounds[order]


def rbl_restarted(
    A: Any,
    k: int,
    cfg: Optional[RBLConfig] = None,
    b: int = 1,
    max_restarts: int = 200,
    timer=None,
    checkpoint_path: Optional[str] = None,
    state: Optional[RestartState] = None,
) -> LanczosResult:
    """Restarted + deflated RBL — reference `RBL_gpu_restarted(A, k)`
    (restarted.jl:97-146) with block size b (reference fixes b=1).

    Pass ``checkpoint_path`` to persist the restart state each sweep, and/or
    ``state`` (e.g. from utils.checkpoint.load_restart_state) to resume."""
    cfg = cfg or RBLConfig()
    cfg = cfg.replace(block_size=b)
    op = as_operator(A, dtype=cfg.compute_dtype)
    n = op.n
    if not (0 < k <= n):
        raise ValueError(f"k={k} out of range for n={n}")

    from .rbl import _row_sharding

    sharding = _row_sharding(cfg)
    lock_cols = max(k, 1)

    if state is None:
        key = jax.random.PRNGKey(cfg.seed)
        Qi = random_start_block(op, key, b, cfg, sharding=sharding)
        lock_buf = jnp.zeros((n, lock_cols), dtype=cfg.basis_dtype)
        if sharding is not None:
            lock_buf = jax.device_put(lock_buf, sharding)
        state = RestartState(
            lock_buf=lock_buf,
            locked_values=np.zeros(k),
            count=0,
            kryl_dim=cfg.restart_kryl_dim,
            Qi=Qi,
        )

    while state.count < k and state.restarts < max_restarts:
        sweep_cfg = cfg.replace(restart_kryl_dim=state.kryl_dim)
        store = BasisStore(
            n, b, max_cols=state.kryl_dim + b, dtype=cfg.basis_dtype,
            init_cols=cfg.min_basis_cols, sharding=sharding,
        )
        w, V, bounds = _restarted_sweep(
            op, sweep_cfg, state.Qi, store, state.lock_buf, timer
        )
        ncomp = 0
        next_start = None
        for j in range(len(w)):
            if state.count + ncomp >= k:
                break
            if bounds[j] < cfg.tol:
                qv = recover_eigvec(store, V[:, j : j + 1])
                qv = qv / jnp.linalg.norm(qv)
                state.lock_buf = _write_block(
                    state.lock_buf, qv, jnp.int32(state.count + ncomp)
                )
                state.locked_values[state.count + ncomp] = w[j]
                ncomp += 1
            else:
                next_start = recover_eigvec(store, V[:, j : j + 1])
                break
        state.count += ncomp
        state.kryl_dim += cfg.restart_growth
        state.restarts += 1
        if next_start is not None:
            state.Qi = next_start.astype(cfg.basis_dtype)
        if checkpoint_path is not None:
            from ..utils.checkpoint import save_restart_state

            save_restart_state(checkpoint_path, state)

    converged = state.count >= k
    # order descending by |λ|
    order = np.argsort(-np.abs(state.locked_values[: state.count]))
    D = state.locked_values[: state.count][order]
    V_cols = np.asarray(state.lock_buf[:, : state.count])[:, order]
    return LanczosResult(
        eigenvalues=D,
        eigenvectors=jnp.asarray(V_cols),
        iterations=state.restarts,
        kryl_dim=state.kryl_dim,
        converged=converged,
    )


def RBL_restarted(A, k: int, cfg: Optional[RBLConfig] = None):
    """Reference-shaped alias (restarted.jl:196): returns (D, V)."""
    res = rbl_restarted(A, k, cfg=cfg)
    return res.eigenvalues, res.eigenvectors
