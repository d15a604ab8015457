"""Geometric multigrid preconditioner for the structured stencil operators.

The interior/smallest-eigenvalue paths (``eigsh(sigma=...)``, ``which="SM"``)
spend their time in the inner MINRES solve, and Jacobi does nothing for a
Laplacian's near-constant diagonal — the measured gap to a factorization-
based shift-invert is purely inner iterations (BENCHMARKS.md "Generalized
pencils", NEXT.md item 1).

Round-3 redesign.  The round-2 cycle (cell-centered PWC transfers,
ν=2, naive (nx, ny, b) layout) cut inner iterations 11.4× yet LOST
wall-clock (130.2 s vs 108.1 s unpreconditioned, 512² SM — VERDICT r2
weak #1).  Three structural fixes:

1. **Vertex-centered coarsening with exact separable Galerkin.**  The
   model operators are Kronecker sums (Laplacian2D = L⊗I + I⊗L —
   operator.py:291), and the vertex-centered linear-interpolation
   transfer P (inject odd points, average even) is itself separable, so
   every Galerkin level stays EXACTLY Σ_t ⊗_a T_t^(a) with small 1-D
   tridiagonal factors T — including the boundary rows that a
   constant-stencil approximation gets wrong (the round-3 cell-centered
   bilinear attempt diverged at depth ≥ 3 from exactly that error;
   measured ρ/cycle 1.2 at 3 levels).  Exact Galerkin restores textbook
   mesh-independent contraction: measured ρ = 0.34/cycle for V(1,1),
   0.12 for V(2,2), at 64²–128² alike.
2. **Folded-lane applies.**  Tridiagonal axis applies run on the free
   ``(n0, …, n_last·b)`` folded view (CLAUDE.md layout rule — a b ≈ 8
   minor dim wastes 15/16 of the VPU; the same fix measured 7.5× on
   Laplacian2D.apply).  Per-axis coefficient vectors broadcast along
   lanes, so position-dependent (boundary-corrected) coefficients cost
   the same as constants.
3. **V(1,1) default** (ν=1, ω=0.8): the pre-sweep from a zero guess is
   a free scaled copy, so a cycle costs ~2 level applies ≈ 2.7
   fine-grid-equivalents.  ν=2 halves ρ but nearly doubles cycle cost;
   as an SPD preconditioner (what MINRES sees: κ ≈ (1+ρ)/(1−ρ)) the
   ν=1 cycle wins total wall-clock.

The symmetric V-cycle (equal pre/post damped-Jacobi smoothing, R = Pᵀ/2
per axis, exact coarsest solve) is an SPD operator for SPD A — the
PMINRES requirement.

Note ``ops/fdm.py``: for the Kronecker-sum operators an EXACT shifted
solve by fast diagonalization (4–6 MXU matmuls) exists and is strictly
better than any preconditioner — ``precond="auto"`` resolves to it
first.  This cycle remains the tier for structured operators under a
mesh (sharded stencils) and as the general symmetric-V-cycle machinery.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["SeparableMultigrid", "MultigridCycle2D", "MultigridCycle3D",
           "mg_psolve_for"]


# ---------------------------------------------------------------------------
# 1-D pieces (host): vertex-centered transfer matrix + tridiag utilities
# ---------------------------------------------------------------------------


def _prolong_matrix(m: int) -> np.ndarray:
    """Vertex-centered linear interpolation, coarse m -> fine 2m.

    Fine index 2j+1 is the coarse point j (injection); fine 2j averages
    coarse j−1 and j (the missing c_{−1} is the homogeneous-Dirichlet
    boundary).  The fine grid's right boundary (point 2m+1 in matrix
    coordinates) is likewise zero, so no row needs it."""
    P = np.zeros((2 * m, m))
    for j in range(m):
        P[2 * j + 1, j] = 1.0
        P[2 * j, j] = 0.5
        if j - 1 >= 0:
            P[2 * j, j - 1] = 0.5
    return P


def _tridiag_bands(T: np.ndarray, tol: float = 1e-14):
    """(lo, d, up) bands of a (numerically) tridiagonal matrix; raises if
    T has entries beyond the first off-diagonals (the vertex-centered
    Galerkin of a tridiagonal factor is provably tridiagonal — this
    guards the implementation, not the math)."""
    n = T.shape[0]
    off = np.abs(T - np.diag(np.diag(T))
                 - np.diag(np.diag(T, 1), 1) - np.diag(np.diag(T, -1), -1))
    if off.max() > tol * max(1.0, np.abs(T).max()):
        raise ValueError("Galerkin factor is not tridiagonal")
    lo = np.zeros(n)
    lo[1:] = np.diag(T, -1)  # lo[i] multiplies x[i-1]
    up = np.zeros(n)
    up[:-1] = np.diag(T, 1)  # up[i] multiplies x[i+1]
    return lo, np.diag(T).copy(), up


def _is_identity(T: np.ndarray, tol: float = 1e-14) -> bool:
    return bool(np.abs(T - np.eye(T.shape[0])).max() <= tol)


# ---------------------------------------------------------------------------
# device kernels: folded-lane tridiagonal axis apply + vertex transfers
# ---------------------------------------------------------------------------


def _tridiag_apply_axis(G, bands, axis: int, b: int):
    """Apply a tridiagonal factor along ``axis`` of the FOLDED view
    (last axis is n_last·b).  Coefficient vectors are host numpy — they
    bake into the trace; broadcasting along the other axes keeps the
    VPU full-width."""
    lo, d, up = bands
    nd = G.ndim
    if axis < nd - 1:
        n = G.shape[axis]
        pad = [(0, 0)] * nd
        pad[axis] = (1, 1)
        Gp = jnp.pad(G, pad)

        def sl(s):
            idx = [slice(None)] * nd
            idx[axis] = slice(s, s + n)
            return Gp[tuple(idx)]

        shape = [1] * nd
        shape[axis] = n
        dv = jnp.asarray(d.reshape(shape), dtype=G.dtype)
        lov = jnp.asarray(lo.reshape(shape), dtype=G.dtype)
        upv = jnp.asarray(up.reshape(shape), dtype=G.dtype)
        return dv * G + lov * sl(0) + upv * sl(2)
    # last axis: y-neighbors are ±b lane shifts; coefficients repeat per
    # folded block
    nyb = G.shape[-1]
    pad = [(0, 0)] * nd
    pad[-1] = (b, b)
    Gp = jnp.pad(G, pad)
    shape = [1] * (nd - 1) + [nyb]
    dv = jnp.asarray(np.repeat(d, b).reshape(shape), dtype=G.dtype)
    lov = jnp.asarray(np.repeat(lo, b).reshape(shape), dtype=G.dtype)
    upv = jnp.asarray(np.repeat(up, b).reshape(shape), dtype=G.dtype)
    return dv * G + lov * Gp[..., : nyb] + upv * Gp[..., 2 * b :]


def _restrict_axis_vertex(F, axis: int):
    """R = Pᵀ/2 along ``axis`` (unfolded logical view): r_j = ½f_{2j+1}
    + ¼(f_{2j} + f_{2j+2}), with f_n ≡ 0 (Dirichlet).

    Stride-free formulation (reshape even/odd split + unit-stride
    shifts): step-2 slices of the padded array corrupted the heap on
    XLA:CPU under --xla_force_host_platform_device_count (glibc malloc
    assertions after a few applications — an XLA:CPU strided-slice
    codegen bug, not a logic error; reshapes and unit slices are safe)."""
    n = F.shape[axis]
    m = n // 2
    nd = F.ndim
    shape = list(F.shape)
    shape[axis : axis + 1] = [m, 2]
    Fr = F.reshape(shape)

    def pick(par):
        idx = [slice(None)] * (nd + 1)
        idx[axis + 1] = par
        return Fr[tuple(idx)]

    even, odd = pick(0), pick(1)  # f[2j], f[2j+1]
    # f[2j+2] via concatenate, NOT pad+slice: the eager pad+slice on an
    # f64 picked array corrupts the heap on XLA:CPU under
    # --xla_force_host_platform_device_count (reproduced; jit is fine)
    idx = [slice(None)] * nd
    idx[axis] = slice(1, m)
    zidx = [slice(None)] * nd
    zidx[axis] = slice(0, 1)
    even_next = jnp.concatenate(
        [even[tuple(idx)], jnp.zeros_like(even[tuple(zidx)])], axis=axis
    )  # f[2j+2] (f_n = 0)
    return 0.5 * odd + 0.25 * (even + even_next)


def _prolong_axis_vertex(C, axis: int):
    """P along ``axis`` (unfolded logical view): f_{2j+1} = c_j,
    f_{2j} = ½(c_{j−1} + c_j)."""
    n = C.shape[axis]
    nd = C.ndim
    pad = [(0, 0)] * nd
    pad[axis] = (1, 0)
    Cp = jnp.pad(C, pad)
    idx = [slice(None)] * nd
    idx[axis] = slice(0, n)
    even = 0.5 * (Cp[tuple(idx)] + C)
    F = jnp.stack([even, C], axis=axis + 1)
    shape = list(C.shape)
    shape[axis] = 2 * n
    return F.reshape(shape)


# ---------------------------------------------------------------------------
# the V-cycle
# ---------------------------------------------------------------------------


class _Level:
    """One grid level: dims, term list of per-axis tridiagonal factor
    bands (with identity factors marked None → skipped in the apply),
    and the folded inverse-diagonal smoother weights."""

    def __init__(self, dims, terms, omega: float):
        self.dims = tuple(dims)
        d = len(dims)
        self.terms = []     # list of per-axis (bands|None)
        diag = np.zeros(dims)
        for fac in terms:
            per_axis = []
            ds = []
            for a, T in enumerate(fac):
                if _is_identity(T):
                    per_axis.append(None)
                    ds.append(np.ones(dims[a]))
                else:
                    per_axis.append(_tridiag_bands(T))
                    ds.append(np.diag(T).copy())
            self.terms.append(per_axis)
            # the term's diagonal is the outer product of factor diagonals
            t = ds[0]
            for v in ds[1:]:
                t = np.multiply.outer(t, v)
            diag = diag + t
        self.winv = omega / diag  # (dims); repeated along b at trace time

    def apply(self, G, b: int):
        """(Σ_t ⊗_a T_t^(a)) G on the folded view."""
        out = None
        for per_axis in self.terms:
            t = G
            for a, bands in enumerate(per_axis):
                if bands is not None:
                    t = _tridiag_apply_axis(t, bands, a, b)
            out = t if out is None else out + t
        return out

    def smooth_weights(self, b: int, dtype):
        w = np.repeat(self.winv, b, axis=-1).reshape(
            self.dims[:-1] + (self.dims[-1] * b,)
        )
        return jnp.asarray(w, dtype=dtype)


class SeparableMultigrid:
    """Symmetric V-cycle ≈ A⁻¹ for A = Σ_t ⊗_a T_t^(a) (Kronecker-sum /
    separable operators, e.g. the model Laplacians) on a d-dim grid with
    homogeneous Dirichlet boundaries.

    Vertex-centered coarsening (dims halve; all dims must be even down
    to the coarsest level), exact separable Galerkin (R = Pᵀ/2 per
    axis), damped-Jacobi V(ν,ν) with a position-dependent diagonal,
    dense coarsest inverse.  SPD as an operator."""

    def __init__(self, dims, terms, nu: int = 1, omega: float = 0.8,
                 coarsest: int = 8, max_coarse_cells: int = 1024):
        dims = tuple(int(x) for x in dims)
        d = len(dims)
        terms = [[np.asarray(T, dtype=np.float64) for T in fac]
                 for fac in terms]
        self.nu, self.omega = nu, omega
        self.levels = []
        while all(x % 2 == 0 for x in dims) and min(dims) > coarsest:
            self.levels.append(_Level(dims, terms, omega))
            Ps = [_prolong_matrix(x // 2) for x in dims]
            terms = [
                [Ps[a].T @ fac[a] @ Ps[a] / 2.0 for a in range(d)]
                for fac in terms
            ]
            dims = tuple(x // 2 for x in dims)
        ncoarse = int(np.prod(dims))
        # The loop stops at the first odd dimension, wherever that is —
        # a 1026-wide grid goes odd after ONE halving, and the dense
        # coarsest inverse below is O(cells³): refuse instead of
        # building a multi-GB "preconditioner" (ADVICE r2, medium).
        if ncoarse > max_coarse_cells:
            raise ValueError(
                f"multigrid hierarchy bottoms out at {dims} "
                f"({ncoarse} > {max_coarse_cells} cells): grid dims must "
                "be divisible by 2 enough times to reach the "
                f"~{coarsest}-wide coarsest level"
            )
        self.coarse_dims = dims
        self.coarse_terms = terms
        A = np.zeros((ncoarse, ncoarse))
        for fac in terms:
            K = fac[0]
            for T in fac[1:]:
                K = np.kron(K, T)
            A = A + K
        self.coarse_inv = np.linalg.inv(A)

    @property
    def n_levels(self) -> int:
        return len(self.levels)

    def _vcycle(self, lvl: int, R, b: int):
        if lvl == len(self.levels):
            ci = jnp.asarray(self.coarse_inv, dtype=R.dtype)
            flat = R.reshape(-1, b)
            return (ci @ flat).reshape(R.shape)
        level = self.levels[lvl]
        W = level.smooth_weights(b, R.dtype)
        E = W * R  # first damped-Jacobi sweep from the zero guess (free)
        for _ in range(self.nu - 1):
            E = E + W * (R - level.apply(E, b))
        resid = R - level.apply(E, b)
        # transfers act on the logical unfolded view (free reshape)
        dims = level.dims
        rc = resid.reshape(dims + (b,))
        for a in range(len(dims)):
            rc = _restrict_axis_vertex(rc, a)
        cdims = tuple(x // 2 for x in dims)
        rc = rc.reshape(cdims[:-1] + (cdims[-1] * b,))
        Ec = self._vcycle(lvl + 1, rc, b)
        Ec = Ec.reshape(cdims + (b,))
        for a in range(len(dims)):
            Ec = _prolong_axis_vertex(Ec, a)
        E = E + Ec.reshape(dims[:-1] + (dims[-1] * b,))
        for _ in range(self.nu):
            E = E + W * (R - level.apply(E, b))
        return E

    def psolve(self, X):
        """X: (n, b) flat — one V-cycle (all shapes static).  Always runs
        jitted: besides speed, eager XLA:CPU mis-executes some of the
        cycle's pad/slice patterns under forced host device counts (see
        _restrict_axis_vertex) — the compiled path is the tested one."""
        if not hasattr(self, "_psolve_jit"):
            self._psolve_jit = jax.jit(self._psolve_impl)
        return self._psolve_jit(X)

    def _psolve_impl(self, X):
        b = X.shape[1]
        dims = self.levels[0].dims if self.levels else self.coarse_dims
        G = X.reshape(dims[:-1] + (dims[-1] * b,))
        return self._vcycle(0, G, b).reshape(-1, b)


def _cross_terms_2d(nx, ny, stencil):
    """Split a 5-point cross stencil into Kronecker-sum terms
    Lx⊗I + I⊗Ly (raises on corner entries — not separable)."""
    S = np.asarray(stencil, dtype=np.float64)
    if S.shape != (3, 3):
        raise ValueError("expected a 3x3 stencil")
    if np.abs(S[np.ix_((0, 2), (0, 2))]).max() > 0:
        raise ValueError("corner entries: stencil is not a Kronecker sum")
    ax, ay, c = float(S[0, 1]), float(S[1, 0]), float(S[1, 1])
    # row-sum-zero split per axis; any remainder (e.g. a shifted
    # stencil) goes half to each axis
    rem = c + 2.0 * ax + 2.0 * ay
    cx, cy = -2.0 * ax + rem / 2.0, -2.0 * ay + rem / 2.0
    Lx = (np.diag(np.full(nx, cx)) + np.diag(np.full(nx - 1, ax), 1)
          + np.diag(np.full(nx - 1, ax), -1))
    Ly = (np.diag(np.full(ny, cy)) + np.diag(np.full(ny - 1, ay), 1)
          + np.diag(np.full(ny - 1, ay), -1))
    return [[Lx, np.eye(ny)], [np.eye(nx), Ly]]


def MultigridCycle2D(nx: int, ny: int, stencil, nu: int = 1,
                     omega: float = 0.8, coarsest: int = 8):
    """V-cycle for a 5-point cross stencil on an (nx, ny) Dirichlet grid
    (see SeparableMultigrid; kept as the 2-D construction surface)."""
    return SeparableMultigrid(
        (nx, ny), _cross_terms_2d(nx, ny, stencil), nu=nu, omega=omega,
        coarsest=coarsest,
    )


def MultigridCycle3D(nx: int, ny: int, nz: int, stencil=None, nu: int = 1,
                     omega: float = 0.8, coarsest: int = 4):
    """V-cycle for the 7-point Laplacian cross on (nx, ny, nz).
    ``stencil`` (3,3,3) must be a cross; default is the Laplacian."""
    if stencil is None:
        S = np.zeros((3, 3, 3))
        S[1, 1, 1] = 6.0
        S[0, 1, 1] = S[2, 1, 1] = -1.0
        S[1, 0, 1] = S[1, 2, 1] = -1.0
        S[1, 1, 0] = S[1, 1, 2] = -1.0
    else:
        S = np.asarray(stencil, dtype=np.float64)
    mask = np.ones((3, 3, 3), bool)
    mask[1, 1, 1] = False
    for a, idx in ((0, (0, 1, 1)), (0, (2, 1, 1)), (1, (1, 0, 1)),
                   (1, (1, 2, 1)), (2, (1, 1, 0)), (2, (1, 1, 2))):
        mask[idx] = False
    if np.abs(S[mask]).max() > 0:
        raise ValueError("non-cross entries: stencil is not a Kronecker sum")
    aa = [float(S[0, 1, 1]), float(S[1, 0, 1]), float(S[1, 1, 0])]
    c = float(S[1, 1, 1])
    rem = c + 2.0 * sum(aa)
    dims = (nx, ny, nz)
    eyes = [np.eye(x) for x in dims]
    terms = []
    for a in range(3):
        ca = -2.0 * aa[a] + rem / 3.0
        L = (np.diag(np.full(dims[a], ca))
             + np.diag(np.full(dims[a] - 1, aa[a]), 1)
             + np.diag(np.full(dims[a] - 1, aa[a]), -1))
        fac = [eyes[0], eyes[1], eyes[2]]
        fac[a] = L
        terms.append(fac)
    return SeparableMultigrid(dims, terms, nu=nu, omega=omega,
                              coarsest=coarsest,
                              max_coarse_cells=8 * coarsest ** 3)


def _hierarchy_cells(dims, coarsest: int) -> int:
    dims = list(dims)
    while all(x % 2 == 0 for x in dims) and min(dims) > coarsest:
        dims = [x // 2 for x in dims]
    return int(np.prod(dims))


@functools.lru_cache(maxsize=8)
def _cycle_for_lap2d(nx: int, ny: int):
    S = np.array([[0.0, -1.0, 0.0], [-1.0, 4.0, -1.0], [0.0, -1.0, 0.0]])
    return MultigridCycle2D(nx, ny, S)


@functools.lru_cache(maxsize=8)
def _cycle_for_lap3d(nx: int, ny: int, nz: int):
    return MultigridCycle3D(nx, ny, nz)


def mg_psolve_for(op):
    """Return a V-cycle psolve for a supported structured operator, or
    None (callers fall back to Jacobi/unpreconditioned).  Requires the
    2x-coarsening hierarchy to bottom out near the coarsest target —
    a grid that goes odd early (e.g. 1026 -> 513) would otherwise get a
    dense inverse of the whole remaining level (ADVICE r2, medium)."""
    from .spmm.operator import Laplacian2D, Laplacian3D

    if isinstance(op, Laplacian2D):
        if _hierarchy_cells((op.nx, op.ny), 8) > 1024:
            return None
        return _cycle_for_lap2d(op.nx, op.ny).psolve
    if isinstance(op, Laplacian3D):
        if _hierarchy_cells((op.nx, op.ny, op.nz), 4) > 8 * 4 ** 3:
            return None
        return _cycle_for_lap3d(op.nx, op.ny, op.nz).psolve
    return None
