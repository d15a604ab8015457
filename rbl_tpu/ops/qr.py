"""Tall-skinny QR / block orthonormalization.

The reference leans on LAPACK geqrf (RBL.jl:86,103) and CUSOLVER qr
(RBL_gpu.jl:155,180) for the n×b residual block.  On TPU the two native
choices are:

- "householder": XLA's QR (jnp.linalg.qr) — bitwise-robust, used for the
  strict f64 accuracy gates.
- "cholqr2": CholeskyQR2 — G = XᵀX (one MXU GEMM, psum-reduced when X is
  row-sharded), Cholesky of the b×b Gram on every device, triangular solve,
  repeated twice.  O(eps) orthogonality for κ(X) ≲ eps^-1/2 and runs at
  matmul speed; the natural distributed tall-skinny QR (single b×b
  collective instead of gathering the n×b block).

A small symmetric shift (shifted CholeskyQR) guards against breakdown when
the residual block is numerically rank-deficient — a case the reference never
handles (SURVEY §5: no breakdown handling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .spmm.operator import _pet


def _chol_qr_once(X, acc_dtype):
    from .contract import gram

    n, b = X.shape
    G = gram(X, X, acc_dtype=acc_dtype)
    eps = jnp.finfo(acc_dtype).eps
    L = jnp.linalg.cholesky(G)
    # Fall back to a shifted Cholesky only on breakdown (nearly
    # rank-deficient X): the shift keeps G positive definite under rounding
    # at the cost of O(shift/σ_min²) orthogonality, which the next pass or
    # the enclosing CGS sweep repairs.
    shift = 11.0 * (n * b + b * (b + 1)) * eps * jnp.trace(G) / b
    L_shifted = jnp.linalg.cholesky(G + shift * jnp.eye(b, dtype=G.dtype))
    bad = jnp.any(jnp.isnan(L))
    R = jnp.where(bad, L_shifted, L).T  # upper triangular
    Q = jax.lax.linalg.triangular_solve(
        R.astype(X.dtype), X, left_side=False, lower=False
    )
    return Q, R


def cholqr(X, passes: int = 2):
    """CholeskyQR with `passes` refinement sweeps. Returns (Q, R) with
    X = Q @ R, R upper-triangular (product of per-pass factors)."""
    acc = _pet(X.dtype)
    Q, R = _chol_qr_once(X, acc)
    for _ in range(passes - 1):
        Q, R2 = _chol_qr_once(Q, acc)
        R = jnp.dot(R2, R, preferred_element_type=acc)
    return Q, R.astype(X.dtype)


def householder_qr(X):
    Q, R = jnp.linalg.qr(X, mode="reduced")
    return Q, R


def block_qr(X, method: str = "householder"):
    """Orthonormalize the columns of the tall-skinny block X.

    Returns (Q, R): the reference consumes Q as the next Lanczos block and
    R as the super-/sub-diagonal block B_i of T (RBL.jl:86-88)."""
    if method == "householder":
        return householder_qr(X)
    if method == "cholqr2":
        return cholqr(X, passes=2)
    if method == "cholqr3":
        return cholqr(X, passes=3)
    raise ValueError(f"unknown qr method: {method}")
