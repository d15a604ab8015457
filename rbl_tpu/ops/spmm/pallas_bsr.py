"""Pallas TPU block-sparse (BSR / blocked-ELL) SpMM kernel.

TPU-native replacement for the reference's CuSPARSE SpMM (``mul!(U, Ag, Qg_d)``
— RBL_gpu.jl:152,176; restarted.jl:41,66): where CuSPARSE walks CSC
column-pointer lists with hardware gathers, the TPU has no gather unit and a
128×128 systolic MXU, so the natural sparse layout is *block*-sparse with
MXU-shaped tiles:

- A is tiled into (BM, BK) = (128, 128) blocks; only nonzero blocks are
  stored, padded per block-row to a fixed count L (blocked-ELL), giving
  ``block_vals``: (nb, L, BM, BK) and ``block_cols``: (nb, L) int32.
- The kernel grid is (nb, L).  ``block_cols`` rides scalar prefetch
  (PrefetchScalarGridSpec), so the X-tile BlockSpec's index_map can select
  the (BK, b) RHS tile *by the block's column index* before the body runs —
  Pallas double-buffers the HBM→VMEM DMAs of both the A-tile and the X-tile
  across grid steps, which is the TPU analogue of CuSPARSE's
  gather-while-multiply pipelining.
- Each grid step is one MXU contraction ``acc += A_blk @ X_blk`` accumulated
  in f32 in the (BM, b) output tile that stays resident in VMEM across the
  L reduction steps.

Padding slots point at column-block 0 with all-zero values, contributing
exactly nothing — the same zero-padding-is-identity trick the solver uses for
the basis buffer, keeping every shape static for XLA.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .operator import LinearOperator, register_operator, static_field


def _make_bsr_kernel(unroll: int):
    """Kernel for one (block-row i, slot-group j) grid step:
    acc += Σ_u A[i, j·U+u] @ X[cols[i, j·U+u]].

    ``unroll`` A-tiles (and their X tiles) are fetched per grid step —
    fewer, larger DMAs amortize the per-step issue overhead that dominates
    when each tile's MXU work is tiny (measured +20% HBM bandwidth at
    U=2 on a FEM-blocky matrix)."""

    def kernel(cols_ref, vals_ref, *rest):
        x_refs, (out_ref, acc_ref) = rest[:unroll], rest[unroll:]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # HIGHEST: full-f32 MXU passes (bf16x3) — the kernel is HBM-bound
        # on the A tiles, so the extra passes cost nothing and keep SpMM at
        # true f32 accuracy (the recurrence's convergence depends on it).
        for u in range(unroll):
            acc_ref[:] += jnp.dot(
                vals_ref[u], x_refs[u][:],
                preferred_element_type=acc_ref.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bk", "L", "unroll", "interpret", "out_dtype"),
)
def bsr_spmm(block_cols, block_vals, X, *, bm: int, bk: int, L: int,
             unroll: int = 1, interpret: bool = False, out_dtype=None):
    """Y = A @ X for blocked-ELL A.

    block_cols: (nb*L,) int32, row-major over (block-row, slot) — column-
        block index per slot (0 for padding).  Flat 1-D: a 2-D SMEM operand
        pads its minor dim to 128 lanes, overflowing the ~1 MB scalar
        memory for large nb.
    block_vals: (nb*L, bm, bk) — dense tiles (zeros in padding slots),
        flattened over (block-row, slot) so every BlockSpec index map is
        ≤3-D (Mosaic cannot legalize 4-D maps with >2 constant outputs).
    X: padded to (ncb*bk, b) rows.
    unroll: A-tiles fetched per grid step (L must be a multiple).
    Returns (nb*bm, b).
    """
    nb = block_cols.shape[0] // L
    b = X.shape[1]
    out_dtype = out_dtype or X.dtype
    U = unroll
    assert L % U == 0, f"L={L} not a multiple of unroll={U}"
    H = L // U

    # NB: literal 0s in index maps lower to i64 constants under x64 mode,
    # which Mosaic refuses to mix with the i32 program ids ("failed to
    # legalize func.func") — derive every constant from the i32 grid ids.
    def x_spec(u):
        return pl.BlockSpec(
            (bk, b),
            lambda i, j, cols: (cols[(i * H + j) * U + u], i * 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, H),
        in_specs=[
            pl.BlockSpec(
                (U, bm, bk),
                lambda i, j, cols: (i * H + j, i * 0, i * 0),
            ),
            *[x_spec(u) for u in range(U)],
        ],
        out_specs=pl.BlockSpec((bm, b), lambda i, j, cols: (i, i * 0)),
        # f32 accumulation except for f64 inputs (interpret/CPU test mode —
        # the TPU MXU has no f64 and never sees this dtype)
        scratch_shapes=[pltpu.VMEM(
            (bm, b),
            jnp.float64 if X.dtype == jnp.float64 else jnp.float32,
        )],
    )
    return pl.pallas_call(
        _make_bsr_kernel(U),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bm, b), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nb * L * bm * bk * b,
            bytes_accessed=(
                block_vals.size * block_vals.dtype.itemsize
                + nb * L * bk * b * X.dtype.itemsize
                + nb * bm * b * np.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(block_cols, block_vals, *([X] * U))


def _device_put_large(x: np.ndarray, chunk_bytes: int = 128 * 2**20):
    """Host→device transfer in bounded chunks along axis 0.  Remote-attached
    TPU transports (and some RPC stacks) cap single-request payloads; a
    GB-scale block_vals array must stream in pieces."""
    if x.nbytes <= chunk_bytes:
        return jnp.asarray(x)
    rows_per = max(int(chunk_bytes // max(x.nbytes // x.shape[0], 1)), 1)
    parts = [
        jnp.asarray(x[i : i + rows_per])
        for i in range(0, x.shape[0], rows_per)
    ]
    return jnp.concatenate(parts, axis=0)


def _blocked_ell_from_scipy(A, bm: int, bk: int, dtype):
    """Host-side conversion scipy CSR → blocked-ELL arrays."""
    import scipy.sparse as sp

    A = sp.coo_matrix(A)
    A.sum_duplicates()  # fancy-index scatter below keeps only last writes
    n = A.shape[0]
    nb = -(-n // bm)          # block rows
    ncb = -(-n // bk)         # block cols
    br = A.row // bm
    bc = A.col // bk
    key = br.astype(np.int64) * ncb + bc
    ukey, inv = np.unique(key, return_inverse=True)
    ubr = (ukey // ncb).astype(np.int64)
    ubc = (ukey % ncb).astype(np.int32)
    # slot = rank of each unique block within its block-row
    row_start = np.searchsorted(ubr, np.arange(nb))
    slot = np.arange(len(ukey)) - row_start[ubr]
    L = int(slot.max()) + 1 if len(ukey) else 1
    block_cols = np.zeros((nb, L), dtype=np.int32)
    block_cols[ubr, slot] = ubc
    block_vals = np.zeros((nb, L, bm, bk), dtype=np.dtype(dtype))
    block_vals[br, slot[inv], A.row % bm, A.col % bk] = A.data.astype(
        np.dtype(dtype)
    )
    return block_cols, block_vals, nb, ncb, L


@register_operator
@dataclasses.dataclass(frozen=True)
class BlockSparseOperator(LinearOperator):
    """Symmetric sparse operator in blocked-ELL layout, applied with the
    Pallas BSR SpMM kernel on TPU (interpret mode on CPU test backends).

    Tiles are MXU-shaped; use f32/bf16 (the TPU MXU has no f64 — f64 solves
    should use the ELL/DIA operators, which XLA emulates correctly)."""

    block_cols: jax.Array   # (nb*L,) int32, row-major over (block-row, slot)
    block_vals: jax.Array   # (nb*L, bm, bk), row-major over (block-row, slot)
    _n: int = static_field(default=0)
    L: int = static_field(default=1)
    bm: int = static_field(default=128)
    bk: int = static_field(default=128)
    unroll: int = static_field(default=1)
    interpret: bool = static_field(default=False)

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self.block_vals.dtype

    @property
    def nnz_blocks(self):
        return int(self.block_cols.shape[0])

    def apply(self, X):
        # X is indexed by column blocks: pad its rows to ncb*bk
        ncb = -(-self._n // self.bk)
        pad = ncb * self.bk - self._n
        Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
        Y = bsr_spmm(
            self.block_cols, self.block_vals, Xp.astype(self.dtype),
            bm=self.bm, bk=self.bk, L=self.L, unroll=self.unroll,
            interpret=self.interpret, out_dtype=X.dtype,
        )
        nrows = (self.block_cols.shape[0] // self.L) * self.bm
        return Y[: self._n] if nrows != self._n else Y

    def diagonal(self):
        if self.bm != self.bk:
            return None  # diagonal straddles tiles for rectangular blocks
        nb = self.block_cols.shape[0] // self.L
        cols = self.block_cols.reshape(nb, self.L)
        vals = self.block_vals.reshape(nb, self.L, self.bm, self.bk)
        tile_diag = jnp.diagonal(vals, axis1=2, axis2=3)  # (nb, L, bm)
        mask = (cols == jnp.arange(nb, dtype=cols.dtype)[:, None])
        # padding slots have zero values, so a col-0 pad cannot pollute
        d = jnp.sum(tile_diag * mask[:, :, None], axis=1).reshape(-1)
        return d[: self._n]

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, bm: int = 128, bk: int = 128,
                   interpret: bool | None = None):
        """Build from a scipy sparse symmetric matrix.

        ``interpret`` defaults to True off-TPU (CPU test backend) and False
        on TPU."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        block_cols, block_vals, nb, ncb, L = _blocked_ell_from_scipy(
            A, bm, bk, dtype
        )
        # fetch 2 tiles per grid step once there's enough reduction depth
        # to amortize the padding (measured +20% HBM bandwidth)
        unroll = 2 if L >= 4 else 1
        if L % unroll:
            pad = unroll - L % unroll
            block_cols = np.pad(block_cols, ((0, 0), (0, pad)))
            block_vals = np.pad(
                block_vals, ((0, 0), (0, pad), (0, 0), (0, 0))
            )
            L += pad
        # X is padded to ncb*bk rows; index_map addresses it in bk units.
        nb, L = block_cols.shape
        return cls(
            block_cols=jnp.asarray(block_cols.reshape(nb * L)),
            block_vals=_device_put_large(block_vals.reshape(nb * L, bm, bk)),
            _n=A.shape[0],
            L=L,
            bm=bm,
            bk=bk,
            unroll=unroll,
            interpret=interpret,
        )

    def density_report(self) -> str:
        nb = self.block_cols.shape[0] // self.L
        nnz = int(np.count_nonzero(np.asarray(self.block_vals)))
        stored = int(self.block_vals.size)
        return (
            f"BlockSparseOperator: n={self._n}, {nb}x{self.L} tiles of "
            f"{self.bm}x{self.bk}, fill={nnz/max(stored,1):.3f}"
        )
