"""Randomized block Lanczos iteration driver — the TPU-native core.

One device-agnostic driver replaces the reference's three near-duplicate
loops (CPU lanczos_iteration RBL.jl:74-117, GPU lanczos_iteration
RBL_gpu.jl:134-203, legacy.jl): the hot path is a small set of jitted,
static-shaped step functions (SpMM + three-term recurrence + tall-skinny QR;
fused partial reorth; CGS2 local reorth), driven by a host loop that owns
only the tiny replicated state — the banded T, convergence polling, and
iteration cadences (partial reorth every 2nd iteration RBL.jl:93, eig poll
every 4th RBL.jl:106).  The n-sized state never leaves the device(s); only
b×b blocks (A_i, B_i) cross to the host, exactly as the reference ships only
T's blocks across the PCIe boundary (RBL_gpu.jl:159-161,185).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..config import RBLConfig
from ..ops.band import BlockTridiagonalT
from ..ops.eig import check_convergence, eig_banded_host, sort_eig_abs
from ..ops.qr import block_qr
from ..ops.reorth import local_reorth, partial_reorth
from ..ops.spmm.operator import LinearOperator, _pet
from .basis import BasisStore


@dataclasses.dataclass
class LanczosResult:
    eigenvalues: np.ndarray          # (k,), descending by |λ|
    eigenvectors: Optional[jax.Array]  # (n, k) or None
    iterations: int                  # number of Lanczos blocks generated
    kryl_dim: int                    # final Krylov dimension used
    converged: bool
    residual_bounds: Optional[np.ndarray] = None  # (k,), matching order


# ----------------------------------------------------------------------------
# jitted step functions (static-shaped; cached across iterations)
# ----------------------------------------------------------------------------

def first_step_fn(op: LinearOperator, Qb, cdt, qr_method):
    """Unrolled first iteration (reference RBL.jl:79-89)."""
    from ..ops.contract import gram

    Qc = Qb.astype(cdt)
    U = op.apply(Qc)
    Ai = gram(Qc, U)
    U = U - jnp.dot(Qc, Ai, preferred_element_type=_pet(cdt))
    Qn, Bn = block_qr(U, method=qr_method)
    return Qn.astype(Qb.dtype), Bn, Ai


def recurrence_step_fn(op: LinearOperator, Qi_b, Qprev_b, Bi, cdt, qr_method):
    """Three-term block recurrence (reference RBL.jl:97-104):
    U = A·Q_i − Q_{i−1}·B_iᵀ;  A_i = Q_iᵀU;  U −= Q_i·A_i;  Q_{i+1}B_{i+1} = qr(U).
    Promotes the basis-precision blocks to compute precision on entry — the
    mixed-precision seam of RBL_gpu.jl:142-143,173-175."""
    from ..ops.contract import gram

    acc = _pet(cdt)
    Qc = Qi_b.astype(cdt)
    Qp = Qprev_b.astype(cdt)
    U = op.apply(Qc) - jnp.dot(Qp, Bi.T, preferred_element_type=acc)
    Ai = gram(Qc, U)
    U = U - jnp.dot(Qc, Ai, preferred_element_type=acc)
    Qn, Bn = block_qr(U, method=qr_method)
    return Qn.astype(Qi_b.dtype), Bn, Ai


_first_step = partial(jax.jit, static_argnames=("cdt", "qr_method"))(first_step_fn)
_recurrence_step = partial(jax.jit, static_argnames=("cdt", "qr_method"))(recurrence_step_fn)


@partial(jax.jit, static_argnames=("qr_method",))
def _partial_reorth_step(basis_buf, Qi, Qprev, qr_method="householder"):
    return partial_reorth(basis_buf, Qi, Qprev, qr_method=qr_method)


@partial(jax.jit, static_argnames=("qr_method",))
def _rerandomize_block(basis_buf, Qi, Qprev, key, qr_method):
    """Breakdown recovery: replace a numerically rank-deficient residual
    block with fresh random directions orthogonalized against the whole
    basis.  The reference has no breakdown handling (SURVEY §5) — after an
    invariant subspace converges, its QR renormalizes noise and re-injects
    converged directions ("ghost" Ritz values), which can stall the
    all-or-nothing convergence test.  Re-randomizing keeps the basis
    orthonormal and the sweep productive; the (tiny) true B_i retained in T
    keeps the Rayleigh–Ritz projection consistent."""
    from ..ops.reorth import project_out

    W = jax.random.normal(key, Qi.shape, dtype=Qi.dtype)
    for _ in range(2):
        W = project_out(basis_buf, W)
        W = project_out(jnp.concatenate([Qprev, Qi], axis=1), W)
        W, _ = block_qr(W, method=qr_method)
    return W


@partial(jax.jit, static_argnames=("cdt",))
def _rayleigh_refine(op: LinearOperator, X, theta0, cdt):
    """Shifted Rayleigh-quotient refinement of converged Ritz values:
    θ = θ₀ + xᵀ(Ax − θ₀x)/xᵀx.  The correction contracts residual-scale
    quantities, so the refined value carries O(eps·|θ|) rounding instead of
    the O(n·eps·‖A‖) accumulated through T's assembly — recovering the
    reference's strict 1e-13 eigenvalue gate at n = 10⁵⁻⁶."""
    from ..ops.contract import gram

    Xc = X.astype(cdt)
    Y = op.apply(Xc) - Xc * theta0[None, :]
    num = jnp.diagonal(gram(Xc, Y))
    den = jnp.diagonal(gram(Xc, Xc))
    return theta0 + num / den


@partial(jax.jit, static_argnames=("passes", "qr_method"))
def _local_reorth_step(Qi, Qprev, passes, qr_method):
    return local_reorth(Qi, Qprev, passes=passes, qr_method=qr_method)


@jax.jit
def _recover(basis_buf, Vk_padded, cdt_scale=None):
    """Ritz-vector recovery V = Q_basis · Ṽ as one MXU GEMM (reference
    accumulates per-block GEMMs: RBL.jl:61-71, RBL_gpu.jl:106-132)."""
    return jnp.dot(
        basis_buf, Vk_padded.astype(basis_buf.dtype),
        preferred_element_type=_pet(basis_buf.dtype),
    )


def recover_eigvec(store: BasisStore, Vk: np.ndarray, k: int) -> jax.Array:
    """Recover k Ritz vectors from the basis store; Vk has store.ncols rows."""
    pad = store.capacity - Vk.shape[0]
    Vk_p = np.zeros((store.capacity, Vk.shape[1]), dtype=Vk.dtype)
    Vk_p[: Vk.shape[0]] = Vk
    return _recover(store.view(), jnp.asarray(Vk_p))


def random_start_block(op: LinearOperator, key, b: int, cfg: RBLConfig,
                       sharding=None):
    """Randomized start: Q₁ = qr(A·Ω).Q with Ω ~ N(0,1)ⁿˣᵇ (reference
    RBL.jl:136-137 — note the single power-iteration step A·Ω)."""
    n = op.n
    cdt = jnp.dtype(cfg.compute_dtype)
    Omega = jax.random.normal(key, (n, b), dtype=cdt)
    if sharding is not None:
        Omega = jax.device_put(Omega, sharding)
    Y = op.apply(Omega)
    Q1, _ = block_qr(Y, method=cfg.resolved_qr_method())
    return Q1.astype(cfg.basis_dtype)


def lanczos_iteration(
    op: LinearOperator,
    k: int,
    cfg: RBLConfig,
    Qi,
    store: BasisStore,
    lock_basis=None,
    timer=None,
    key=None,
) -> tuple[np.ndarray, np.ndarray, "BlockTridiagonalT", Optional[np.ndarray], bool, int]:
    """Run the block Lanczos sweep until convergence or the Krylov cap.

    Returns (w_sel ascending-|λ|, V_sel, T, residual_bounds, converged, nblocks)
    where V_sel has nblocks*b rows and k columns.  ``store`` holds all
    nblocks basis blocks on return.
    """
    from ..utils.profiling import null_timer

    timer = timer or null_timer()
    b = cfg.block_size
    n = op.n
    cdt = jnp.dtype(cfg.compute_dtype)
    qr_method = cfg.resolved_qr_method()
    max_kryl = min(cfg.max_kryl_dim, ((n + b - 1) // b) * b)

    T = BlockTridiagonalT(b, max_cols=max_kryl + b)
    if key is None:
        key = jax.random.PRNGKey(cfg.seed + 1)
    eps = float(jnp.finfo(cdt).eps)

    def _maybe_rerandomize(Qn, Bn_host, tscale, i):
        """Breakdown guard: tiny ‖B_i‖ relative to T's scale means the new
        block is numerically rank-deficient noise — replace it."""
        nonlocal key
        if tscale > 0 and np.abs(Bn_host).max() < np.sqrt(eps) * tscale:
            key, sub = jax.random.split(key)
            with timer.section("rerandomize"):
                return _rerandomize_block(
                    store.view(), Qi, Qprev, sub, qr_method=qr_method
                )
        return Qn

    # --- first iteration, unrolled ---
    with timer.section("recurrence"):
        Qnext, Bnext, Ai = _first_step(op, Qi, cdt=cdt, qr_method=qr_method)
    T.append_diag(np.asarray(Ai))
    T.set_subdiag(np.asarray(Bnext), 0)
    tscale = np.abs(np.asarray(Ai)).max()
    Qprev, Qi, Bi = Qi, Qnext, Bnext

    w_sel = V_sel = bounds = None
    converged = False
    i = 1
    while i * b < max_kryl:
        i += 1
        if i % cfg.partial_reorth_cadence == 0:
            with timer.section("partial_reorth"):
                Qi, Qprev = _partial_reorth_step(
                    store.view(), Qi, Qprev, qr_method=qr_method
                )
        if lock_basis is not None and i % cfg.restart_reorth_cadence == 0:
            from ..ops.reorth import deflate
            with timer.section("deflate"):
                Qi = deflate(lock_basis, Qi)
                Qprev = deflate(lock_basis, Qprev)
        with timer.section("local_reorth"):
            Qi = _local_reorth_step(
                Qi, Qprev, passes=cfg.loc_reorth_passes, qr_method=qr_method
            )
        store.append(Qprev)  # block i-1 is final from here on
        with timer.section("recurrence"):
            Qnext, Bnext, Ai = _recurrence_step(
                op, Qi, Qprev, Bi, cdt=cdt, qr_method=qr_method
            )
        Ai_host = np.asarray(Ai)
        Bn_host = np.asarray(Bnext)
        T.append_diag(Ai_host)
        tscale = max(tscale, np.abs(Ai_host).max())
        Qnext = _maybe_rerandomize(Qnext, Bn_host, tscale, i)
        # Poll on cadence (reference RBL.jl:106), or opportunistically when
        # ‖B_i‖ collapses — a sharp drop means the Krylov space is nearly
        # invariant and the Rayleigh–Ritz values are ripe *now*; waiting for
        # the cadence lets rounding noise re-seed converged ("ghost")
        # directions that can stall the all-or-nothing convergence test.
        residual_collapsed = np.abs(Bn_host).max() < 1e-4 * tscale
        if i * b > k and (i % cfg.eig_poll_cadence == 0 or residual_collapsed):
            with timer.section("eig"):
                w, V = eig_banded_host(T.view())
                w_sel, V_sel = sort_eig_abs(w, V, k)
            if check_convergence(Bn_host, V_sel, b, k, cfg.tol):
                from ..ops.eig import ritz_residual_bounds
                bounds = ritz_residual_bounds(Bn_host, V_sel, b)
                converged = True
                store.append(Qi)  # block i completes the basis
                break
        T.set_subdiag(Bn_host, i - 1)
        Qprev, Qi, Bi = Qi, Qnext, Bnext

    if not converged:
        # Cap reached: final Rayleigh–Ritz with everything we have.  (The
        # reference returns the last poll's stale factorization here —
        # RBL.jl:116 — which can disagree with the stored basis length; we
        # re-solve so D/V always match the basis.)
        store.append(Qprev)
        i_final = store.ncols // b
        with timer.section("eig"):
            w, V = eig_banded_host(T.view(store.ncols))
            w_sel, V_sel = sort_eig_abs(w, V, k)
        from ..ops.eig import ritz_residual_bounds
        bounds = ritz_residual_bounds(np.asarray(Bi), V_sel, b)
        i = i_final

    return w_sel, V_sel, T, np.asarray(bounds) if bounds is not None else None, converged, i
