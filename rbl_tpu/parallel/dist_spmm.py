"""Row-partitioned distributed SpMM with halo exchange.

TPU-native replacement for the reference's single-GPU CuSPARSE SpMM +
host↔device streaming (RBL_gpu.jl:152,176 and hybrid_part_reorth's copyto!
loop): A's rows live on a 1-D "rows" mesh; applying a stencil/banded
operator needs only the neighbor devices' boundary rows, moved with
``jax.lax.ppermute`` over ICI (the sparse analogue of ring/context
parallelism — SURVEY §2c).  Non-circular permutes deliver zeros at the mesh
edges, which is exactly the Dirichlet boundary.

For general sparse matrices the fallback is an all-gather of the block
(``AllGatherSpMM``), which XLA overlaps with local compute where possible;
the Pallas BSR kernel path composes with the same shard_map wrapper.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.spmm.operator import LinearOperator, register_operator, static_field


@register_operator
@dataclasses.dataclass(frozen=True)
class ShardedLaplacian2D(LinearOperator):
    """5-point 2D Laplacian with grid rows slabbed across the mesh's
    "rows" axis.  apply() runs under shard_map: local stencil plus a
    two-neighbor ppermute halo exchange of one grid row each way."""

    nx: int = static_field()
    ny: int = static_field()
    mesh: Mesh = static_field(default=None)
    axis: str = static_field(default="rows")
    _dtype: Any = static_field(default=jnp.float32)

    @property
    def shape(self):
        n = self.nx * self.ny
        return (n, n)

    @property
    def dtype(self):
        return jnp.dtype(self._dtype)

    def apply(self, X):
        ndev = self.mesh.shape[self.axis]
        if self.nx % ndev:
            raise ValueError(
                f"nx={self.nx} not divisible by mesh axis size {ndev}"
            )
        nx_local = self.nx // ndev
        ny = self.ny

        def local_apply(x_slab):
            # x_slab: (nx_local*ny, b) — this device's slab of grid rows,
            # processed in the folded (nx_local, ny·b) full-lane layout
            # (see Laplacian2D.apply)
            b = x_slab.shape[1]
            G = x_slab.reshape(nx_local, ny * b)
            fwd = [(i, i + 1) for i in range(ndev - 1)]
            bwd = [(i + 1, i) for i in range(ndev - 1)]
            # halo rows from the neighbors (zeros at the mesh edges)
            halo_lo = jax.lax.ppermute(G[-1], self.axis, perm=fwd)
            halo_hi = jax.lax.ppermute(G[0], self.axis, perm=bwd)
            up = jnp.concatenate([halo_lo[None], G[:-1]], axis=0)
            down = jnp.concatenate([G[1:], halo_hi[None]], axis=0)
            Gy = jnp.pad(G, ((0, 0), (b, b)))
            out = 4.0 * G - up - down - Gy[:, : -2 * b] - Gy[:, 2 * b :]
            return out.reshape(nx_local * ny, b)

        return jax.shard_map(
            local_apply,
            mesh=self.mesh,
            in_specs=P(self.axis, None),
            out_specs=P(self.axis, None),
        )(X)

    def diagonal(self):
        return jnp.full((self.n,), 4.0, dtype=self.dtype)


@register_operator
@dataclasses.dataclass(frozen=True)
class ShardedEllSpMM(LinearOperator):
    """General row-partitioned sparse SpMM: each device owns a row band of A
    in ELL layout (cols/vals (L, n) sharded over rows, i.e. axis 1) and
    all-gathers the (n, b) block over ICI before the local multiply — the
    generic distributed path when the operator has no exploitable halo
    structure.  Column indices are global, so the gathered full block is
    indexed directly."""

    cols: jax.Array  # (L, n) int32, global column ids; sharded on axis 1
    vals: jax.Array  # (L, n)
    _n: int = static_field(default=0)
    mesh: Mesh = static_field(default=None)
    axis: str = static_field(default="rows")

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self.vals.dtype

    @classmethod
    def from_scipy(cls, A, mesh, axis: str = "rows", dtype=None):
        from ..ops.spmm.ell import SparseEllOperator

        ndev = mesh.shape[axis]
        if A.shape[0] % ndev:
            raise ValueError(
                f"n={A.shape[0]} not divisible by mesh axis size {ndev}"
            )
        ell = SparseEllOperator.from_scipy(A, dtype=dtype)
        sh = NamedSharding(mesh, P(None, axis))
        return cls(
            cols=jax.device_put(ell.cols, sh),
            vals=jax.device_put(ell.vals, sh),
            _n=ell._n, mesh=mesh, axis=axis,
        )

    def apply(self, X):
        from ..ops.spmm.operator import _pet

        def local_apply(cols_l, vals_l, x_local):
            x_full = jax.lax.all_gather(x_local, self.axis, axis=0, tiled=True)
            acc_dt = _pet(x_local.dtype)

            def body(acc, row):
                c, v = row
                return acc + (
                    v[:, None] * jnp.take(x_full, c, axis=0)
                ).astype(acc_dt), None

            out, _ = jax.lax.scan(
                body,
                # zeros_like keeps x_local's shard_map varying axes (a
                # fresh jnp.zeros is unvarying → carry type mismatch)
                jnp.zeros_like(x_local, dtype=acc_dt),
                (cols_l, vals_l),
            )
            return out.astype(x_local.dtype)

        return jax.shard_map(
            local_apply,
            mesh=self.mesh,
            in_specs=(P(None, self.axis), P(None, self.axis), P(self.axis, None)),
            out_specs=P(self.axis, None),
        )(self.cols, self.vals, X)

    def diagonal(self):
        # (L, n) sharded on axis 1 → the (n,) result shards like X's rows;
        # padding slots self-point with value 0 (SparseEllOperator layout)
        r = jnp.arange(self._n, dtype=self.cols.dtype)
        return jnp.sum(
            jnp.where(self.cols == r[None, :], self.vals, 0.0), axis=0
        )


def _banded_coo_shards(A, ndev, dtype, mesh, axis):
    """Split a scipy matrix into ``ndev`` row bands of row-sorted COO
    triplets, padded to the max per-band nnz (uniform shard shapes), and
    device_put over the mesh axis.  Pad slots target the band's last local
    row with val 0 — zero contribution, ascending rows preserved (the
    ``indices_are_sorted=True`` segment_sum contract).  Returns the three
    sharded flat arrays."""
    import numpy as np
    import scipy.sparse as sp

    A = sp.csr_matrix(A)
    ml = A.shape[0] // ndev
    dtype = np.dtype(dtype or A.dtype)
    shards = []
    for d in range(ndev):
        band = A[d * ml : (d + 1) * ml].tocoo()
        order = np.argsort(band.row, kind="stable")
        shards.append((band.row[order], band.col[order], band.data[order]))
    cap = max(max(len(s[0]) for s in shards), 1)
    rows = np.full((ndev, cap), ml - 1, np.int32)
    cols = np.zeros((ndev, cap), np.int32)
    vals = np.zeros((ndev, cap), dtype)
    for d, (r, c, v) in enumerate(shards):
        rows[d, : len(r)] = r
        cols[d, : len(c)] = c
        vals[d, : len(v)] = v.astype(dtype)
    sh = NamedSharding(mesh, P(axis))
    return (
        jax.device_put(rows.reshape(-1), sh),
        jax.device_put(cols.reshape(-1), sh),
        jax.device_put(vals.reshape(-1), sh),
    )


def _sharded_coo_apply(op, X, nrows_local):
    """Shared shard_map body for the row-banded COO operators: all-gather
    the input block over ICI, gather + sorted segment_sum into the local
    band, accumulating in ``_pet(X.dtype)`` (bf16 inputs segment-sum in
    f32, matching the single-device CooOperator/RectCooOperator)."""
    from ..ops.spmm.operator import _pet

    def local_apply(rows_l, cols_l, vals_l, x_local):
        x_full = jax.lax.all_gather(x_local, op.axis, axis=0, tiled=True)
        contrib = (
            vals_l[:, None] * jnp.take(x_full, cols_l, axis=0)
        ).astype(_pet(x_local.dtype))
        return jax.ops.segment_sum(
            contrib, rows_l, num_segments=nrows_local, indices_are_sorted=True
        ).astype(x_local.dtype)

    return jax.shard_map(
        local_apply,
        mesh=op.mesh,
        in_specs=(P(op.axis), P(op.axis), P(op.axis), P(op.axis, None)),
        out_specs=P(op.axis, None),
    )(op.rows, op.cols, op.vals, X)


@register_operator
@dataclasses.dataclass(frozen=True)
class ShardedCooSpMM(LinearOperator):
    """Row-partitioned COO segment-sum SpMM: each device owns its row
    band's nonzero triplets (row indices LOCAL to the band, padded to the
    max per-device count so shapes are uniform), all-gathers the (n, b)
    block over ICI, and reduces with one sorted ``segment_sum`` — the
    skew-robust general distributed path (the single-device rationale is
    in ops/spmm/coo.py; padding row-length-skewed matrices to ELL wastes
    the skew factor in memory AND makes the per-device scan length the
    GLOBAL max row length)."""

    rows: jax.Array  # (ndev * nnz_shard,) int32 LOCAL row ids, sharded
    cols: jax.Array  # (ndev * nnz_shard,) int32 global column ids
    vals: jax.Array  # (ndev * nnz_shard,)
    _n: int = static_field(default=0)
    mesh: Mesh = static_field(default=None)
    axis: str = static_field(default="rows")

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self.vals.dtype

    @classmethod
    def from_scipy(cls, A, mesh, axis: str = "rows", dtype=None):
        n = A.shape[0]
        ndev = mesh.shape[axis]
        if n % ndev:
            raise ValueError(f"n={n} not divisible by mesh axis size {ndev}")
        rows, cols, vals = _banded_coo_shards(A, ndev, dtype, mesh, axis)
        return cls(rows=rows, cols=cols, vals=vals, _n=n, mesh=mesh, axis=axis)

    def apply(self, X):
        return _sharded_coo_apply(self, X, self._n // self.mesh.shape[self.axis])

    def diagonal(self):
        # rows are LOCAL band ids: the diagonal entry of local row r on
        # device d sits at global column d·ml + r; pad slots carry val 0
        ml = self._n // self.mesh.shape[self.axis]

        def local_diag(rows_l, cols_l, vals_l):
            base = (jax.lax.axis_index(self.axis) * ml).astype(cols_l.dtype)
            eq = cols_l == rows_l + base
            return jax.ops.segment_sum(
                jnp.where(eq, vals_l, 0.0), rows_l, num_segments=ml,
                indices_are_sorted=True,
            )

        return jax.shard_map(
            local_diag,
            mesh=self.mesh,
            in_specs=(P(self.axis), P(self.axis), P(self.axis)),
            out_specs=P(self.axis),
        )(self.rows, self.cols, self.vals)


@register_operator
@dataclasses.dataclass(frozen=True)
class ShardedRectCooSpMM:
    """RECTANGULAR (m, n) row-partitioned COO factor: the distributed twin
    of ops.spmm.coo.RectCooOperator, used in pairs (forward + transpose)
    by the sharded sparse Gram operator behind ``rbl_svd`` on a mesh.
    Output rows (m) are banded across the mesh axis; the input block
    arrives sharded over its own rows (n) and is all-gathered over ICI
    before the local gather + sorted segment_sum.  Both m and n must be
    divisible by the mesh axis size (the caller falls back to the dense
    sharded path otherwise)."""

    rows: jax.Array  # (ndev * cap,) int32 LOCAL output-row ids, sharded
    cols: jax.Array  # (ndev * cap,) int32 global input-column ids
    vals: jax.Array  # (ndev * cap,)
    _m: int = static_field(default=0)
    _ncols: int = static_field(default=0)
    mesh: Mesh = static_field(default=None)
    axis: str = static_field(default="rows")

    @property
    def shape(self):
        return (self._m, self._ncols)

    @property
    def dtype(self):
        return self.vals.dtype

    @classmethod
    def from_scipy(cls, B, mesh, axis: str = "rows", dtype=None):
        m, n = B.shape
        ndev = mesh.shape[axis]
        if m % ndev or n % ndev:
            raise ValueError(
                f"shape {B.shape} not divisible by mesh axis size {ndev}"
            )
        rows, cols, vals = _banded_coo_shards(B, ndev, dtype, mesh, axis)
        return cls(
            rows=rows, cols=cols, vals=vals,
            _m=m, _ncols=n, mesh=mesh, axis=axis,
        )

    def apply(self, X):
        return _sharded_coo_apply(self, X, self._m // self.mesh.shape[self.axis])
