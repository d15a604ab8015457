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

from functools import partial

import numpy as np
import scipy.linalg

import jax

import jax.numpy as jnp

from ..utils.aot import aot_jit


def eig_banded_host(band: np.ndarray, backend: str = "scipy"):
    """All eigenpairs of the banded symmetric T.  Returns (w ascending, V)
    as numpy f64.

    backend="scipy": LAPACK dsbevd via scipy (default — fastest).
    backend="native": the in-repo C++ tred2/tql2 solver (native/band_eig.cpp)
    — the framework's own replacement for the reference's raw LAPACK ccall
    (common.jl:28-48); falls back to scipy if the library can't build.
    backend="device": dense jnp.linalg.eigh of the expanded T on the
    accelerator — useful when T grows large enough to beat the host path
    or when host LAPACK is unavailable; pays two transfers per poll."""
    if backend == "native":
        from ..native import available, band_eigh

        if available():
            return band_eigh(band)
    if backend == "device":
        from .band import band_to_dense

        w, V = jnp.linalg.eigh(jnp.asarray(band_to_dense(band)))
        return np.asarray(w), np.asarray(V)
    w, V = scipy.linalg.eig_banded(band.astype(np.float64), lower=True)
    return w, V


def _topk_abs_split(w_all: np.ndarray, k: int) -> tuple[int, int]:
    """Two-pointer top-k-by-|λ| selection over an ascending spectrum:
    returns (a, t) with the selected set = prefix [0, a) ∪ suffix [t, m).
    (argsort could split ties non-contiguously, which LAPACK's index-range
    query cannot express.)"""
    m = len(w_all)
    a, t = 0, m
    for _ in range(k):
        if abs(w_all[a]) >= abs(w_all[t - 1]):
            a += 1
        else:
            t -= 1
    return a, t


def eig_banded_values_topk(band: np.ndarray, k: int) -> np.ndarray:
    """The k largest-|λ| eigenvalues (no vectors) of banded symmetric T,
    ascending by |λ|.  O(m²b) via dsbevd's values-only path — ~6× cheaper
    than the full factorization at m ≈ 768 (19 ms vs 121 ms measured), used
    to pre-screen convergence polls: eigenvectors (needed for the residual
    bounds) are only computed once the Ritz values have stabilized."""
    w_all = scipy.linalg.eigvals_banded(band.astype(np.float64), lower=True)
    a, t = _topk_abs_split(w_all, min(k, len(w_all)))
    w = np.concatenate([w_all[:a], w_all[t:]])
    return w[np.argsort(np.abs(w))]


def eig_banded_topk(band: np.ndarray, k: int):
    """The k largest-|λ| eigenpairs of banded symmetric T, ascending by |λ|
    — the exact output of ``sort_eig_abs(*eig_banded_host(band), k)`` via
    values-only bisection plus index-range inverse iteration.  NB: measured
    on LAPACK's dsbevx this is *slower* than the full dsbevd factorization
    for the solver's sizes (223 ms vs 121 ms at m=768, k=50 — the band
    reduction runs twice and inverse iteration is costly), so the hot path
    uses eig_banded_values_topk screening + eig_banded_host instead; this
    function remains for callers that need pairs at tiny k/m ratios."""
    band = band.astype(np.float64)
    m = band.shape[1]
    if k >= m:
        w, V = eig_banded_host(band)
        return sort_eig_abs(w, V, k)
    w_all = scipy.linalg.eigvals_banded(band, lower=True)
    a, t = _topk_abs_split(w_all, k)
    parts = []
    if a > 0:
        parts.append(
            scipy.linalg.eig_banded(
                band, lower=True, select="i", select_range=(0, a - 1)
            )
        )
    if k - a > 0:
        parts.append(
            scipy.linalg.eig_banded(
                band, lower=True, select="i", select_range=(m - (k - a), m - 1)
            )
        )
    w = np.concatenate([p[0] for p in parts])
    V = np.concatenate([p[1] for p in parts], axis=1)
    order = np.argsort(np.abs(w))
    return w[order], V[:, order]


def eig_banded_topk_dense(band: np.ndarray, k: int):
    """The k largest-|λ| eigenpairs of banded symmetric T, ascending by |λ|
    — the fast host path for the solver's polls: a values-only dsbevd sweep
    locates the top-k split (a two-ended index range over the ascending
    spectrum), then MRRR subset queries (scipy ``eigh(subset_by_index=…)``,
    LAPACK dsyevr on the densified T) form only those k eigenvectors.
    Measured 54 ms vs 121 ms for the full dsbevd factorization at m = 768,
    k = 50 (306 ms vs 800 ms at m = 1400) — the reference always runs the
    full dsbev (common.jl:36-48).  Falls back to the full factorization
    when k is a large fraction of m (subset bookkeeping stops paying)."""
    band = band.astype(np.float64)
    m = band.shape[1]
    if k * 3 >= m:
        w, V = eig_banded_host(band)
        return sort_eig_abs(w, V, k)
    from .band import band_to_dense

    w_all = scipy.linalg.eigvals_banded(band, lower=True)
    a, t = _topk_abs_split(w_all, k)
    dense = band_to_dense(band)
    parts = []
    if a > 0:
        parts.append(scipy.linalg.eigh(dense, subset_by_index=(0, a - 1)))
    if t < m:
        parts.append(scipy.linalg.eigh(dense, subset_by_index=(t, m - 1)))
    w = np.concatenate([p[0] for p in parts])
    V = np.concatenate([p[1] for p in parts], axis=1)
    order = np.argsort(np.abs(w))
    return w[order], V[:, order]


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


@partial(aot_jit, name="power_norm", static_argnames=("iters",))
def _power_norm(op, key, iters: int):
    v = jax.random.normal(key, (op.shape[0], 1), dtype=op.dtype)

    def body(_, carry):
        v, _ = carry
        w = op.apply(v)
        nrm = jnp.linalg.norm(w)
        return w / nrm, nrm

    v0 = v / jnp.linalg.norm(v)
    _, nrm = jax.lax.fori_loop(
        0, iters, body, (v0, jnp.zeros((), dtype=v.dtype))
    )
    return nrm


def spectral_norm_bound(op, key, iters: int = 24, margin: float = 1.1) -> float:
    """An upper estimate of ‖A‖₂ = |λ|max of a symmetric operator: power
    iteration (a monotone UNDER-estimate converging geometrically in
    |λ₂/λ₁|) times a safety margin.  Used to size the spectral shift for
    ``which="LA"/"SA"`` solves — an overshoot only compresses relative
    gaps by O(margin), while an undershoot could leave the wrong spectrum
    end dominant."""
    return margin * float(_power_norm(op, key, iters))
