"""Geometric multigrid preconditioner for the structured stencil operators.

The interior/smallest-eigenvalue paths (``eigsh(sigma=...)``, ``which="SM"``)
spend their time in the inner MINRES solve, and Jacobi does nothing for a
Laplacian's near-constant diagonal — the measured gap to a factorization-
based shift-invert is purely inner iterations (BENCHMARKS.md "Generalized
pencils", NEXT.md item 1).  A V-cycle on the stencil's own grid hierarchy
is the classical fix, and maps cleanly onto TPU: every level is a 3×3(×3)
stencil apply (shifted adds on a folded grid — VPU work), restriction/
prolongation are 2×-decimation/replication (reshape-means), and the whole
cycle jits as one static-shape computation.

Design (cell-centered, Galerkin):

- Coarsening: 2×2(×2) cell means (our grids are powers of two — the
  vertex-centered 2^k−1 hierarchy of textbook Dirichlet MG doesn't fit).
  Prolongation is the exact adjoint scaled to replication, so the Galerkin
  product R·A·P stays symmetric.
- Level operators: Galerkin stencils extracted NUMERICALLY at
  construction — apply R·A·P to a delta function on a small probe grid
  and read off the (constant-coefficient) 3×3 stencil.  Correct by
  construction for any constant-coefficient fine stencil, and each level
  stays a 3×3 stencil (nearest-neighbor coupling spreads ≤ one cell
  through PWC transfer operators).
- Smoother: weighted Jacobi (ω = 0.8), ν pre- and ν post-smoothing steps
  — the symmetric V-cycle with an exact coarsest solve is an SPD operator
  for SPD A, which preconditioned MINRES requires.
- Coarsest level (≤ 8×8 cells): dense inverse, precomputed.

Used by ``ShiftInvertOperator(precond="mg")`` (ops/minres.py): the cycle
approximates A⁻¹ (not (A−σI)⁻¹) — the right preconditioner for σ at or
near 0 (the ``which="SM"`` / lowest-modes cases) and still useful while
|σ| ≪ ‖A‖; for interior shifts deep in the spectrum it degrades
gracefully toward unpreconditioned MINRES.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["MultigridCycle2D", "mg_psolve_for"]


def _stencil_apply_2d(G, S):
    """Apply a 3x3 constant stencil to G: (nx, ny, b), Dirichlet halo.
    S is a HOST numpy array — its entries bake into the trace as
    constants (the stencils are static per level)."""
    S = np.asarray(S)
    Gp = jnp.pad(G, ((1, 1), (1, 1), (0, 0)))
    out = jnp.zeros_like(G)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            c = float(S[di + 1, dj + 1])
            if c != 0.0:
                out = out + c * Gp[
                    1 + di : 1 + di + G.shape[0],
                    1 + dj : 1 + dj + G.shape[1],
                ]
    return out


def _restrict_2d(G):
    """2x2 cell means: (nx, ny, b) -> (nx/2, ny/2, b)."""
    nx, ny, b = G.shape
    return G.reshape(nx // 2, 2, ny // 2, 2, b).mean(axis=(1, 3))


def _prolong_2d(G):
    """Replication (4x the adjoint of _restrict_2d): coarse -> fine."""
    nx, ny, b = G.shape
    return jnp.broadcast_to(
        G[:, None, :, None, :], (nx, 2, ny, 2, b)
    ).reshape(2 * nx, 2 * ny, b)


def _stencil_apply_np(G: np.ndarray, S: np.ndarray) -> np.ndarray:
    """Host-side (pure numpy) twin of _stencil_apply_2d — construction
    runs inside jit traces, where any jnp op would produce a tracer."""
    Gp = np.pad(G, ((1, 1), (1, 1), (0, 0)))
    out = np.zeros_like(G)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            c = float(S[di + 1, dj + 1])
            if c != 0.0:
                out = out + c * Gp[
                    1 + di : 1 + di + G.shape[0],
                    1 + dj : 1 + dj + G.shape[1],
                ]
    return out


def _galerkin_stencil_2d(S: np.ndarray) -> np.ndarray:
    """Coarse-level 3x3 stencil of R·A(S)·P, extracted numerically on a
    probe grid (constant coefficients ⇒ grid-size independent).  Pure
    numpy: runs at construction, possibly inside a jit trace."""
    m = 8  # coarse probe grid; fine is 16x16
    delta = np.zeros((m, m, 1))
    delta[m // 2, m // 2, 0] = 1.0
    fine = np.repeat(np.repeat(delta, 2, axis=0), 2, axis=1)
    Af = _stencil_apply_np(fine, S)
    coarse = Af.reshape(m, 2, m, 2, 1).mean(axis=(1, 3))[:, :, 0]
    c = m // 2
    return coarse[c - 1 : c + 2, c - 1 : c + 2].copy()


def _dense_coarse_inverse_2d(S: np.ndarray, nx: int, ny: int) -> np.ndarray:
    """Dense inverse of the coarsest-level operator (nx*ny ≤ ~256)."""
    n = nx * ny
    A = np.zeros((n, n))
    for j in range(n):
        e = np.zeros((nx, ny, 1))
        e[j // ny, j % ny, 0] = 1.0
        A[:, j] = _stencil_apply_np(e, S)[:, :, 0].ravel()
    return np.linalg.inv(A)


def _COARSE_CELL_CAP(coarsest: int) -> int:
    """Max cells allowed on the coarsest level (it gets a dense inverse):
    the hierarchy may legitimately stop one halving early on non-square
    or odd-factor grids (e.g. 12*2^k), so allow up to (2*coarsest)^2."""
    return 4 * coarsest * coarsest


def _hierarchy_bottom(nx: int, ny: int, coarsest: int = 8) -> tuple[int, int]:
    """Where the 2x-coarsening hierarchy for (nx, ny) stops."""
    x, y = nx, ny
    while x % 2 == 0 and y % 2 == 0 and min(x, y) > coarsest:
        x, y = x // 2, y // 2
    return x, y


class MultigridCycle2D:
    """One symmetric V-cycle ≈ A⁻¹ for a constant-coefficient 3x3 stencil
    on an (nx, ny) grid with Dirichlet boundaries.  SPD as an operator
    (equal pre/post weighted-Jacobi smoothing + exact coarsest solve)."""

    def __init__(self, nx: int, ny: int, stencil: np.ndarray,
                 nu: int = 2, omega: float = 0.8, coarsest: int = 8):
        self.nx, self.ny = nx, ny
        self.nu, self.omega = nu, omega
        self.stencils = []
        sizes = []
        S = np.asarray(stencil, dtype=np.float64)
        x, y = nx, ny
        while x % 2 == 0 and y % 2 == 0 and min(x, y) > coarsest:
            self.stencils.append(S)
            sizes.append((x, y))
            S = _galerkin_stencil_2d(S)
            x, y = x // 2, y // 2
        # The loop stops at the first odd dimension, wherever that is.  A
        # grid like 1026x1026 goes odd after ONE halving (513x513), and
        # the dense coarsest inverse below is O((x*y)^3) memory/work — a
        # silent hang/OOM, not a preconditioner.  Refuse to build unless
        # the hierarchy bottomed out near the intended coarsest size;
        # mg_psolve_for pre-checks the same bound and falls back cleanly.
        if x * y > _COARSE_CELL_CAP(coarsest):
            raise ValueError(
                f"multigrid hierarchy for {nx}x{ny} bottoms out at "
                f"{x}x{y} (> {_COARSE_CELL_CAP(coarsest)} cells): grid "
                "dims must be divisible by 2 enough times to reach the "
                f"~{coarsest}x{coarsest} coarsest level"
            )
        self.coarse_size = (x, y)
        self.coarse_stencil = S
        self.sizes = sizes
        self.coarse_inv = _dense_coarse_inverse_2d(S, x, y)

    def _vcycle(self, level, R):
        """Solve A_level e = R approximately; R: (nx_l, ny_l, b)."""
        if level == len(self.stencils):
            ci = jnp.asarray(self.coarse_inv, dtype=R.dtype)
            x, y = self.coarse_size
            return (ci @ R.reshape(x * y, -1)).reshape(x, y, -1)
        S = self.stencils[level]
        # python float, NOT np.float64: a numpy scalar is strongly typed
        # and would promote an f32 cycle to f64 under x64 mode
        w = float(self.omega / S[1, 1])
        E = w * R  # first Jacobi sweep from zero initial guess
        for _ in range(self.nu - 1):
            E = E + w * (R - _stencil_apply_2d(E, S))
        r_c = _restrict_2d(R - _stencil_apply_2d(E, S))
        E = E + _prolong_2d(self._vcycle(level + 1, r_c))
        for _ in range(self.nu):
            E = E + w * (R - _stencil_apply_2d(E, S))
        return E

    def psolve(self, X):
        """X: (n, b) flat — one V-cycle."""
        b = X.shape[1]
        G = X.reshape(self.nx, self.ny, b)
        return self._vcycle(0, G).reshape(-1, b)


@functools.lru_cache(maxsize=8)
def _cycle_for_lap2d(nx: int, ny: int) -> MultigridCycle2D:
    S = np.array([[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]])
    return MultigridCycle2D(nx, ny, S)


def mg_psolve_for(op):
    """Return a V-cycle psolve for a supported structured operator, or
    None (callers fall back to Jacobi/unpreconditioned).  Requires the
    2x-coarsening hierarchy to bottom out near the coarsest target —
    a grid that goes odd early (e.g. 1026 -> 513) would otherwise get a
    dense inverse of the whole remaining level (ADVICE r2, medium)."""
    from .spmm.operator import Laplacian2D

    if isinstance(op, Laplacian2D) and op.nx % 2 == 0 and op.ny % 2 == 0:
        x, y = _hierarchy_bottom(op.nx, op.ny)
        if x * y > _COARSE_CELL_CAP(8):
            return None
        cyc = _cycle_for_lap2d(op.nx, op.ny)
        return cyc.psolve
    return None
