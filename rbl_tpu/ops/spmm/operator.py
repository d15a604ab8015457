"""Linear-operator abstraction for the sparse symmetric matrix A.

The reference binds the operator to concrete CPU/GPU storage types
(SparseMatrixCSC / CuSparseMatrixCSC, dispatched at RBL.jl:74 and
RBL_gpu.jl:134).  Here the solver core is written against a single abstract
``LinearOperator`` whose implementations are JAX pytrees, so the same jitted
solver traces over any of them — dense, diagonal, matrix-free stencil, COO
segment-sum, or the Pallas BSR kernel — on any backend and under any sharding.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _pet(dtype):
    """MXU accumulation dtype: accumulate sub-f32 inputs in f32."""
    return jnp.float32 if jnp.dtype(dtype).itemsize < 4 else dtype


class LinearOperator:
    """A symmetric n×n linear operator.  Subclasses are registered pytrees.

    Required:
      - ``shape`` property -> (n, n)
      - ``dtype`` property
      - ``apply(X)``: block matvec, (n, b) -> (n, b)
    """

    @property
    def shape(self):
        raise NotImplementedError

    @property
    def dtype(self):
        raise NotImplementedError

    def apply(self, X: jax.Array) -> jax.Array:
        raise NotImplementedError

    def diagonal(self):
        """The matrix diagonal as an (n,) array, or None when extraction
        is not supported (matrix-free/composite operators).  Used to build
        Jacobi preconditioners for the shift-invert inner MINRES solves
        (ops/minres.py) — a None simply disables preconditioning."""
        return None

    def __matmul__(self, X):
        return self.apply(X)

    @property
    def n(self) -> int:
        return self.shape[0]


def register_operator(cls):
    """Register an operator dataclass as a JAX pytree (array fields are
    leaves, everything else is static aux data)."""
    fields = [f.name for f in dataclasses.fields(cls)]
    array_fields = [f.name for f in dataclasses.fields(cls) if f.metadata.get("leaf", True)]
    static_fields = [f for f in fields if f not in array_fields]

    def flatten(op):
        children = tuple(getattr(op, f) for f in array_fields)
        aux = tuple(getattr(op, f) for f in static_fields)
        return children, aux

    def unflatten(aux, children):
        kw = dict(zip(array_fields, children))
        kw.update(dict(zip(static_fields, aux)))
        return cls(**kw)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


def static_field(**kw):
    return dataclasses.field(metadata={"leaf": False}, **kw)


def cast_operator(op, dtype):
    """An operator equal to ``op`` with every floating array leaf (and
    any static ``_dtype`` field) cast to ``dtype``.

    Powers the mixed-precision inner-solve tier (ops/minres.py): the TPU
    has no native f64, so f64 inner iterations run X64-emulated — casting
    the operator once and iterating in f32 with f64 defect correction is
    the TPU-native formulation.  Works for any registered operator pytree
    (array-backed formats cast their value arrays; matrix-free stencils
    flip their static dtype)."""
    dtype = jnp.dtype(dtype)

    def cast_leaf(a):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating):
            return a.astype(dtype)
        return a

    new = jax.tree_util.tree_map(cast_leaf, op)
    if dataclasses.is_dataclass(new) and any(
        f.name == "_dtype" for f in dataclasses.fields(new)
    ):
        new = dataclasses.replace(new, _dtype=dtype)
    return new


@register_operator
@dataclasses.dataclass(frozen=True)
class DiagonalOperator(LinearOperator):
    """A = diag(d).  The reference's unit-test matrices are exactly this
    (Unit Testing/test.jl:17-50 builds sparse(Diagonal(a)))."""

    diag: jax.Array  # (n,)

    @property
    def shape(self):
        return (self.diag.shape[0], self.diag.shape[0])

    @property
    def dtype(self):
        return self.diag.dtype

    def apply(self, X):
        return self.diag[:, None] * X

    def diagonal(self):
        return self.diag


@register_operator
@dataclasses.dataclass(frozen=True)
class DenseOperator(LinearOperator):
    """A as a dense matrix — MXU matmul.  Used for the Gram-matrix path of
    the image demo (images.jl:21-25) and as the reference oracle in tests."""

    mat: jax.Array  # (n, n)

    @property
    def shape(self):
        return self.mat.shape

    @property
    def dtype(self):
        return self.mat.dtype

    def apply(self, X):
        return jnp.dot(self.mat, X, preferred_element_type=_pet(X.dtype))

    def diagonal(self):
        return jnp.diagonal(self.mat)


@register_operator
@dataclasses.dataclass(frozen=True)
class GramOperator(LinearOperator):
    """A = BᵀB (or B·Bᵀ) of a rectangular factor B, applied matrix-free as
    two chained MXU GEMMs — the Gram matrix is never materialized.

    The reference's image demo forms the n×n Gram densely before solving
    (images.jl:21 ``RBL(B'B, k)``); matrix-free keeps HBM at O(m·n)
    instead of O(n²) + O(m·n) and both GEMMs MXU-shaped.  Used by
    ``rbl_svd`` (solver/svd.py)."""

    B: jax.Array  # (m, n)
    left: bool = static_field(default=False)  # True: A = B·Bᵀ (m×m)

    @property
    def shape(self):
        s = self.B.shape[0] if self.left else self.B.shape[1]
        return (s, s)

    @property
    def dtype(self):
        return self.B.dtype

    def apply(self, X):
        acc = _pet(X.dtype)
        F, S = (self.B.T, self.B) if self.left else (self.B, self.B.T)
        Y = jnp.dot(F, X, preferred_element_type=acc)
        return jnp.dot(S, Y, preferred_element_type=acc)

    def diagonal(self):
        # diag(BᵀB) = squared column norms (rows for the B·Bᵀ side)
        ax = 1 if self.left else 0
        return jnp.sum(
            jnp.square(self.B), axis=ax,
            dtype=_pet(self.B.dtype),
        ).astype(self.B.dtype)


@register_operator
@dataclasses.dataclass(frozen=True)
class FunctionOperator(LinearOperator):
    """Matrix-free operator from a user-supplied JAX-traceable function
    ``fun(X) -> A·X`` on (n, b) blocks.  The function must be symmetric as
    a linear map and pure (it is traced under jit inside the solver's
    fused sweep chunks); closure constants become compile-time constants.
    The scipy-LinearOperator migration path for matrix-free users — except
    the map stays on device instead of calling back to the host."""

    fun: Any = static_field()
    _n: int = static_field(default=0)
    _dtype: Any = static_field(default=None)

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return jnp.dtype(self._dtype or jnp.float64)

    def apply(self, X):
        return self.fun(X)


@register_operator
@dataclasses.dataclass(frozen=True)
class SparseGramOperator(LinearOperator):
    """A = BᵀB (or B·Bᵀ) of a SPARSE rectangular factor B, applied
    matrix-free as two chained sparse SpMMs — neither the Gram matrix nor
    a dense copy of B is ever materialized.  The sparse upgrade of
    GramOperator for ``rbl_svd``/``svds`` on large sparse factors (the
    reference's images.jl:21 forms BᵀB densely; scipy's ``svds`` keeps B
    sparse — this is the TPU-native equivalent of the latter).

    Bf is the (m, n) forward factor, Bt its (n, m) transpose — both
    pre-sorted COO layouts built once at construction (coo.py
    RectCooOperator); keeping them separate avoids re-sorting triplets
    inside the hot loop."""

    Bf: Any  # RectCooOperator (m, n)
    Bt: Any  # RectCooOperator (n, m)
    left: bool = static_field(default=False)  # True: A = B·Bᵀ (m×m)

    @property
    def shape(self):
        s = self.Bf.shape[0] if self.left else self.Bf.shape[1]
        return (s, s)

    @property
    def dtype(self):
        return self.Bf.dtype

    def apply(self, X):
        if self.left:
            return self.Bf.apply(self.Bt.apply(X))
        return self.Bt.apply(self.Bf.apply(X))

    def diagonal(self):
        # diag(BᵀB)_j = Σ_{nnz with col j} val² (rows for the B·Bᵀ side);
        # COO pad slots carry val 0, so they contribute nothing
        if self.left:
            idx, n = self.Bf.rows, self.Bf.shape[0]
            sorted_ = True  # Bf triplets are row-sorted
        else:
            idx, n = self.Bf.cols, self.Bf.shape[1]
            sorted_ = False
        return jax.ops.segment_sum(
            jnp.square(self.Bf.vals), idx, num_segments=n,
            indices_are_sorted=sorted_,
        )

    @classmethod
    def from_scipy(cls, B, dtype=None, left: bool = False):
        from .coo import RectCooOperator

        Bf = RectCooOperator.from_scipy(B, dtype=dtype)
        return cls(Bf=Bf, Bt=Bf.transpose(), left=left)


@register_operator
@dataclasses.dataclass(frozen=True)
class AffineOperator(LinearOperator):
    """α·A + β·I of a base operator — the spectral-shift combinator behind
    ``rbl(..., which="LA"/"SA")`` (solver/rbl.py): shifting by β ≥ ‖A‖₂
    moves the algebraic extreme of the spectrum to the magnitude extreme,
    which is what Lanczos converges to.  α and β are 0-d arrays (pytree
    leaves), so different shifts reuse the same compiled solver."""

    base: LinearOperator
    alpha: jax.Array  # 0-d scalar
    beta: jax.Array   # 0-d scalar

    @classmethod
    def shift(cls, base, alpha: float, beta: float):
        dt = base.dtype
        return cls(
            base=base,
            alpha=jnp.asarray(alpha, dtype=dt),
            beta=jnp.asarray(beta, dtype=dt),
        )

    @property
    def shape(self):
        return self.base.shape

    @property
    def dtype(self):
        return self.base.dtype

    def apply(self, X):
        return self.alpha * self.base.apply(X) + self.beta * X

    def diagonal(self):
        d = self.base.diagonal()
        return None if d is None else self.alpha * d + self.beta


@register_operator
@dataclasses.dataclass(frozen=True)
class Laplacian2D(LinearOperator):
    """Matrix-free 5-point 2D Laplacian stencil on an nx×ny grid
    (Dirichlet).  n = nx*ny.  TPU-native 'sparse' operator: the stencil is
    pure VPU shifts/adds — no gathers.

    Layout note: the block is processed as a FOLDED (nx, ny·b) 2-D view.
    A (…, b) minor dim with b ≈ 8 pads to 128 lanes in TPU registers and
    tiled memory (16× waste); folding the y dimension into the lanes makes
    every op full-width.  y-neighbors become ±b lane shifts of a
    zero-padded row (the zero pad IS the Dirichlet boundary), x-neighbors
    row shifts.  Measured 7.5× over the naive (nx, ny, b) scatter-add
    formulation (6.06 → 0.80 ms, 512² grid, b=8, TPU v5e)."""

    nx: int = static_field()
    ny: int = static_field()
    _dtype: Any = static_field(default=jnp.float64)

    @property
    def shape(self):
        return (self.nx * self.ny, self.nx * self.ny)

    @property
    def dtype(self):
        return jnp.dtype(self._dtype)

    def apply(self, X):
        b = X.shape[1]
        G = X.reshape(self.nx, self.ny * b)
        Gx = jnp.pad(G, ((1, 1), (0, 0)))
        Gy = jnp.pad(G, ((0, 0), (b, b)))
        out = 4.0 * G - Gx[:-2] - Gx[2:] - Gy[:, : -2 * b] - Gy[:, 2 * b :]
        return out.reshape(self.nx * self.ny, b)

    def diagonal(self):
        return jnp.full((self.n,), 4.0, dtype=self.dtype)


@register_operator
@dataclasses.dataclass(frozen=True)
class Laplacian3D(LinearOperator):
    """Matrix-free 7-point 3D Laplacian on an nx×ny×nz grid (Dirichlet)."""

    nx: int = static_field()
    ny: int = static_field()
    nz: int = static_field()
    _dtype: Any = static_field(default=jnp.float64)

    @property
    def shape(self):
        n = self.nx * self.ny * self.nz
        return (n, n)

    @property
    def dtype(self):
        return jnp.dtype(self._dtype)

    def apply(self, X):
        # folded (nx, ny, nz·b) layout — see Laplacian2D.apply
        b = X.shape[1]
        G = X.reshape(self.nx, self.ny, self.nz * b)
        Gx = jnp.pad(G, ((1, 1), (0, 0), (0, 0)))
        Gy = jnp.pad(G, ((0, 0), (1, 1), (0, 0)))
        Gz = jnp.pad(G, ((0, 0), (0, 0), (b, b)))
        out = (
            6.0 * G
            - Gx[:-2] - Gx[2:]
            - Gy[:, :-2] - Gy[:, 2:]
            - Gz[:, :, : -2 * b] - Gz[:, :, 2 * b :]
        )
        return out.reshape(-1, b)

    def diagonal(self):
        return jnp.full((self.n,), 6.0, dtype=self.dtype)


def _pick_sparse_format(A, dtype):
    """Choose the TPU-native layout for a scipy sparse matrix.

    Measured on TPU v5e (9-diagonal banded, n = 131072, b = 8):
    DIA 1.09 Gnnz/s > BSR/Pallas 0.29 > ELL scan 0.20 — so banded matrices
    (few populated diagonals) go to DIA; block-structured matrices with
    adequate tile fill go to the Pallas BSR kernel (f32/bf16 only — the MXU
    has no f64); everything else to the portable ELL scan."""
    import numpy as _np

    from .dia import count_diagonals

    n = A.shape[0]
    coo = A.tocoo()
    ndiags = count_diagonals(A)
    if ndiags <= 64:
        return "dia", None
    # the operator is built at dtype or, when unspecified, A's own dtype —
    # an f32/bf16 matrix with dtype=None must still reach the BSR branch
    itemsize = jnp.dtype(dtype if dtype is not None else A.dtype).itemsize
    if jax.default_backend() == "tpu" and itemsize <= 4:
        from .pallas_bsr import (
            _tile_census, modeled_bsr_apply_seconds, pick_tile_plan,
        )

        # ONE joint plan computation (the census is an O(nnz log nnz)
        # host sort — threading the plan through from here to from_scipy
        # avoids re-running it ~3x); plan is None when every candidate's
        # tile-id array would overflow SMEM (huge matrices) — BSR is then
        # unbuildable and the ELL/HYB fallbacks apply.
        plan = pick_tile_plan(A)
        bsr_s = (modeled_bsr_apply_seconds(A, plan=plan)
                 if plan is not None else float("inf"))
        # DIA vs BSR by calibrated time models (TPU v5e 2026-08-20,
        # tpu_*_spmm3.log: a 99-diagonal real FEM matrix ran 0.68 ms DIA
        # vs 1.64 ms best-BSR — the old hard <=64-diagonal rule missed
        # it).  DIA streams A once plus one shifted X pass per diagonal
        # at ~450 GB/s effective (measured); nominal b = 8.
        if ndiags <= 256:  # DiaOperator's max_diags guard
            dia_s = ndiags * n * (4 + 4 * 8) / 450e9
            if dia_s < bsr_s:
                return "dia", None
        if plan is not None:
            # probe fill at the tuned height — the packed layout stores
            # several x fewer zeros than 128x128 blocked-ELL on FEM-class
            # matrices, which moves the BSR-vs-ELL crossover
            bm = plan[0]
            _, ukey, _, _, _, _, _ = _tile_census(coo, bm, 128)
            fill = A.nnz / max(len(ukey) * bm * 128, 1)
            if fill >= 0.02:
                return "bsr", plan
    # No MXU-kernel tier here (f64, or a non-TPU backend): DIA's static
    # shifted adds beat the gather-bound ELL scan whenever the matrix
    # fits the diagonal format at all — measured on the f64 fem3d-16
    # stiffness (~243 diagonals): ELL 4.37 ms vs DIA ~1 ms class
    # (f32 DIA: 0.129 ms).  The old rule sent every >64-diagonal f64
    # matrix to the scan (tpu_*_amg_diag.log, round 3).
    if ndiags <= 256:
        return "dia", None
    # ELL pads every row to the max row nnz: under row-length skew
    # (power-law graphs, a few dense rows) that multiplies memory and scan
    # length by the skew factor — route to HYB (capped ELL + COO overflow)
    row_nnz = _np.diff(A.tocsr().indptr)
    if row_nnz.size and row_nnz.max() > 4 * max(row_nnz.mean(), 1.0):
        return "hyb", None
    return "ell", None


def as_operator(A, dtype=None, format: str = "auto") -> LinearOperator:
    """Coerce a user-supplied matrix into a LinearOperator.

    Accepts: LinearOperator (returned as-is), dense ndarray/jax array,
    scipy.sparse matrix, ``jax.experimental.sparse`` BCOO/BCSR (converted
    through scipy triplets so the same format auto-selection applies),
    1-D array (diagonal).  Sparse matrices pick the TPU-native layout
    automatically ("auto"): DIA for banded, Pallas BSR for
    block-structured (TPU, ≤f32), HYB for skewed row-length
    distributions, ELL otherwise; or force one with
    format="dia" | "bsr" | "ell" | "hyb" | "coo".
    """
    if isinstance(A, LinearOperator):
        # honor an explicit dtype request: a mismatched operator dtype
        # poisons downstream lax.while_loop carries with promotions
        # (e.g. an f64 DiagonalOperator mass under an f32 solve)
        if dtype is not None and jnp.dtype(A.dtype) != jnp.dtype(dtype):
            return cast_operator(A, dtype)
        return A
    if (
        type(A).__module__.startswith("jax.experimental.sparse")
        and hasattr(A, "todense")
    ):  # BCOO / BCSR: route through scipy COO triplets (host-side,
        #   one-time) so the structure probe + layout auto-pick apply
        import scipy.sparse as _sp

        Ac = A.to_bcoo() if hasattr(A, "to_bcoo") else A  # BCSR → BCOO
        if getattr(Ac, "n_batch", 0) or getattr(Ac, "n_dense", 0):
            raise TypeError(
                "batched/block BCOO not supported — pass an unbatched 2-D "
                "matrix (n_batch == n_dense == 0)"
            )
        idx = np.asarray(Ac.indices)
        dat = np.asarray(Ac.data)
        # BCOO pads its nse slots with out-of-range or duplicate indices
        # and zero data; drop them (scipy's tocsr sums any remaining dupes)
        live = (
            (dat != 0)
            & (idx[:, 0] < Ac.shape[0])
            & (idx[:, 1] < Ac.shape[1])
        )
        A = _sp.coo_matrix(
            (dat[live], (idx[live, 0], idx[live, 1])), shape=Ac.shape
        ).tocsr()
    if hasattr(A, "tocsr"):  # scipy.sparse
        if (
            format == "auto"
            and A.shape[0] == A.shape[1]
            and A.nnz <= A.shape[0]  # cheap screen: diagonal ⇒ nnz ≤ n
        ):
            # exactly-diagonal matrix → DiagonalOperator: cheaper applies
            # than any sparse layout AND the exact fast paths keyed on it
            # (rbl_generalized's degree-0 M^{±1/2}, reference test
            # matrices are sparse(Diagonal(...)) — test.jl:17-50)
            import scipy.sparse as _sp

            coo = _sp.coo_matrix(A)
            if coo.nnz == 0 or bool(np.all(coo.row == coo.col)):
                d = np.zeros(A.shape[0], dtype=coo.data.dtype)
                np.add.at(d, coo.row, coo.data)
                return DiagonalOperator(
                    jnp.asarray(d, dtype=dtype or d.dtype)
                )
        plan = None
        if format == "auto":
            fmt, plan = _pick_sparse_format(A, dtype)
        else:
            fmt = format
        if fmt == "dia":
            from .dia import DiaOperator

            return DiaOperator.from_scipy(A, dtype=dtype)
        if fmt == "bsr":
            from .pallas_bsr import BlockSparseOperator

            return BlockSparseOperator.from_scipy(
                A, dtype=dtype or jnp.float32,
                bm=plan[0] if plan else None,
                unroll=plan[1] if plan else None,
            )
        if fmt == "hyb":
            from .coo import HybOperator

            return HybOperator.from_scipy(A, dtype=dtype)
        if fmt == "coo":
            from .coo import CooOperator

            return CooOperator.from_scipy(A, dtype=dtype)
        from .ell import SparseEllOperator

        return SparseEllOperator.from_scipy(A.tocsr(), dtype=dtype)
    A = jnp.asarray(A, dtype=dtype)
    if A.ndim == 1:
        return DiagonalOperator(A)
    if A.ndim == 2:
        return DenseOperator(A)
    raise TypeError(f"cannot interpret {type(A)} as a linear operator")
