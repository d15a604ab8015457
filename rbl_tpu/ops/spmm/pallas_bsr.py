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


def _make_packed_kernel(unroll: int):
    """Packed variable-length variant: one (block-row i, chunk j) grid step
    accumulates U tiles from the row's packed tile list; steps past the
    row's chunk count are masked no-ops whose clamped index maps repeat the
    previous block (Pallas skips the DMA when the block index is
    unchanged), so short rows cost idle grid steps, not HBM traffic."""

    def kernel(cols_ref, hcnt_ref, rptr_ref, vals_ref, *rest):
        x_refs, (out_ref, acc_ref) = rest[:unroll], rest[unroll:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(j < hcnt_ref[i])
        def _():
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
    static_argnames=("bm", "bk", "H", "unroll", "interpret", "out_dtype"),
)
def bsr_spmm_packed(tile_cols, hcount, rptr, vals, X, *, bm: int, bk: int,
                    H: int, unroll: int = 1, interpret: bool = False,
                    out_dtype=None):
    """Y = A @ X for packed (CSR-of-tiles) blocked-sparse A.

    Unlike ``bsr_spmm``'s blocked-ELL, rows store only their own tiles:
    ``vals``: (nchunks*U, bm, bk) row-major packed, each block-row's tile
    list zero-padded to a multiple of U (padding tiles have col 0 and zero
    values); ``tile_cols``: (nchunks*U,) int32 column-block ids;
    ``rptr``: (nb,) int32 first chunk of each block-row; ``hcount``: (nb,)
    int32 chunk count per block-row; H = max(hcount).  Memory padding is
    at most U-1 tiles per row (vs. blocked-ELL's pad-to-L_max), which is
    what lifts useful-bytes throughput on skewed tile-count matrices.
    """
    nb = rptr.shape[0]
    b = X.shape[1]
    out_dtype = out_dtype or X.dtype
    U = unroll

    def clamped(i, j, hcnt, rptr_):
        # last valid chunk re-addressed on padding steps → DMA skipped
        return rptr_[i] + jnp.minimum(j, jnp.maximum(hcnt[i] - 1, i * 0))

    def x_spec(u):
        return pl.BlockSpec(
            (bk, b),
            lambda i, j, cols, hcnt, rptr_: (
                cols[clamped(i, j, hcnt, rptr_) * U + u], i * 0
            ),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, H),
        in_specs=[
            pl.BlockSpec(
                (U, bm, bk),
                lambda i, j, cols, hcnt, rptr_: (
                    clamped(i, j, hcnt, rptr_), i * 0, i * 0
                ),
            ),
            *[x_spec(u) for u in range(U)],
        ],
        out_specs=pl.BlockSpec(
            (bm, b), lambda i, j, cols, hcnt, rptr_: (i, i * 0)
        ),
        scratch_shapes=[pltpu.VMEM(
            (bm, b),
            jnp.float64 if X.dtype == jnp.float64 else jnp.float32,
        )],
    )
    return pl.pallas_call(
        _make_packed_kernel(U),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bm, b), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.shape[0] * bm * bk * b,
            bytes_accessed=(
                vals.size * vals.dtype.itemsize
                + vals.shape[0] * bk * b * X.dtype.itemsize
                + nb * bm * b * np.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(tile_cols, hcount, rptr, vals, *([X] * U))


def _make_packed_resident_kernel(unroll: int, bk: int):
    """Packed variant with the WHOLE RHS resident in VMEM.

    The standard packed kernel issues ``unroll`` separate (bk, b) X-tile
    DMAs per grid step (4 KB each at b=8) — at fine tile heights these
    tiny descriptors throttle the pipeline to ~180 GB/s vs the ~420 GB/s
    the contiguous A-tile stream reaches alone (BENCHMARKS.md tile-sweep
    lesson 1; NEXT.md r2 item 3).  Here X rides in once as a (ncb, b, bk)
    VMEM block (lane-exact: bk=128 minor — a (n, b≈8) layout would pad
    16×) and the kernel picks tiles by dynamic major-dim indexing, so
    steady-state HBM traffic is the A tiles only."""

    def kernel(cols_ref, hcnt_ref, rptr_ref, vals_ref, xt_ref, out_ref,
               acc_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(j < hcnt_ref[i])
        def _():
            base = (rptr_ref[i] + j) * unroll
            for u in range(unroll):
                c = cols_ref[base + u]
                xs = xt_ref[c]  # (b, bk)
                acc_ref[:] += jax.lax.dot_general(
                    vals_ref[u], xs,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=acc_ref.dtype,
                    precision=jax.lax.Precision.HIGHEST,
                )

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:].astype(out_ref.dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bk", "H", "unroll", "interpret", "out_dtype",
                     "gather"),
)
def bsr_spmm_panel(tile_cols, hcount, rptr, vals_t, X, *, bm: int,
                   bk: int, H: int, unroll: int = 1,
                   interpret: bool = False, out_dtype=None,
                   gather: str = "swap"):
    """Y = A @ X, packed-PANEL layout: ONE large-contraction MXU dot per
    chunk.  MEASURED SLOWER than the packed kernel (round-4 batch F:
    2-3x — the gather relayout and the skinny (b, U*bk) operand's 8/128
    MXU lane utilization outweigh the issue-count savings); kept as the
    recorded negative result of the ceiling investigation.

    The round-4 DMA-stream decomposition (BENCHMARKS.md "SpMM fine-tile
    ceiling") showed the packed kernel is MXU-ISSUE bound, not DMA bound:
    per chunk, U separate (bm, bk)@(bk, b) dots cap effective bandwidth
    at ~300-410 GB/s while the bare tile stream runs 900-1200 GB/s.  Here
    the chunk's U tiles are stored as one TRANSPOSED (U·bk, bm) panel
    (host-side repack: ``vals_t``: (nchunks, U·bk, bm), tile u at rows
    [u·bk, (u+1)·bk)) and contracted in a single dot against the stacked
    X gather — contraction length U·bk (2-4k), one MXU issue per chunk.

    The X gather uses the lane-exact resident (ncb, b, bk) layout;
    building the (b, U·bk) left operand swaps the two SUBLANE axes (U, b)
    and reshapes — lanes (bk) untouched, no relayout of the wide dim.
    The accumulator is (b, bm); out is written transposed once per
    block-row.  X must already be padded to (ncb*bk, b) rows."""
    nb = rptr.shape[0]
    ncb = X.shape[0] // bk
    b = X.shape[1]
    out_dtype = out_dtype or X.dtype
    U = unroll
    Xt = X.reshape(ncb, bk, b).transpose(0, 2, 1)  # (ncb, b, bk)

    def clamped(i, j, hcnt, rptr_):
        return rptr_[i] + jnp.minimum(j, jnp.maximum(hcnt[i] - 1, i * 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, H),
        in_specs=[
            pl.BlockSpec(
                (1, U * bk, bm),
                lambda i, j, cols, hcnt, rptr_: (
                    clamped(i, j, hcnt, rptr_), i * 0, i * 0
                ),
            ),
            pl.BlockSpec(
                (ncb, b, bk),
                lambda i, j, cols, hcnt, rptr_: (i * 0, i * 0, i * 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, b), lambda i, j, cols, hcnt, rptr_: (i, i * 0)
        ),
        scratch_shapes=[pltpu.VMEM(
            (b, bm),
            jnp.float64 if X.dtype == jnp.float64 else jnp.float32,
        )],
    )

    def kernel(cols_ref, hcnt_ref, rptr_ref, vals_ref, xt_ref, out_ref,
               acc_ref):
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        @pl.when(j < hcnt_ref[i])
        def _():
            base = (rptr_ref[i] + j) * U
            if gather == "concat":
                # round-5 variant (VERDICT r4 item 3): build the stacked
                # multi-X operand by LANE concatenation of the (b, bk)
                # tiles — U adjacent VMEM copies, lanes untouched —
                # instead of the sublane stack+swapaxes relayout the
                # round-4 panel A/B measured as the loss
                xflat = jnp.concatenate(
                    [xt_ref[cols_ref[base + u]] for u in range(U)],
                    axis=1,
                )  # (b, U*bk)
            else:
                xs = jnp.stack(
                    [xt_ref[cols_ref[base + u]] for u in range(U)], axis=0
                )  # (U, b, bk)
                xflat = jnp.swapaxes(xs, 0, 1).reshape(b, U * bk)
            acc_ref[:] += jax.lax.dot_general(
                xflat, vals_ref[0],
                (((1,), (0,)), ((), ())),
                preferred_element_type=acc_ref.dtype,
                precision=jax.lax.Precision.HIGHEST,
            )

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            out_ref[:] = acc_ref[:].T.astype(out_ref.dtype)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bm, b), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * vals_t.shape[0] * U * bm * bk * b,
            bytes_accessed=(
                vals_t.size * vals_t.dtype.itemsize
                + Xt.size * X.dtype.itemsize
                + nb * bm * b * np.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(tile_cols, hcount, rptr, vals_t, Xt)


# X kept VMEM-resident when its lane-exact layout fits comfortably beside
# the double-buffered A tiles (v5e VMEM ≈ 16 MB; leave headroom)
_RESIDENT_X_BYTES = 8 * 2**20


@functools.partial(
    jax.jit,
    static_argnames=("bm", "bk", "H", "unroll", "interpret", "out_dtype"),
)
def bsr_spmm_packed_resident(tile_cols, hcount, rptr, vals, X, *, bm: int,
                             bk: int, H: int, unroll: int = 1,
                             interpret: bool = False, out_dtype=None):
    """Y = A @ X, packed layout, RHS resident in VMEM (see kernel doc).
    X must already be padded to (ncb*bk, b) rows."""
    nb = rptr.shape[0]
    ncb = X.shape[0] // bk
    b = X.shape[1]
    out_dtype = out_dtype or X.dtype
    U = unroll
    Xt = X.reshape(ncb, bk, b).transpose(0, 2, 1)  # (ncb, b, bk)

    def clamped(i, j, hcnt, rptr_):
        return rptr_[i] + jnp.minimum(j, jnp.maximum(hcnt[i] - 1, i * 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nb, H),
        in_specs=[
            pl.BlockSpec(
                (U, bm, bk),
                lambda i, j, cols, hcnt, rptr_: (
                    clamped(i, j, hcnt, rptr_), i * 0, i * 0
                ),
            ),
            # whole X: constant index map → DMA'd once, then resident
            pl.BlockSpec(
                (ncb, b, bk),
                lambda i, j, cols, hcnt, rptr_: (i * 0, i * 0, i * 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (bm, b), lambda i, j, cols, hcnt, rptr_: (i, i * 0)
        ),
        scratch_shapes=[pltpu.VMEM(
            (bm, b),
            jnp.float64 if X.dtype == jnp.float64 else jnp.float32,
        )],
    )
    return pl.pallas_call(
        _make_packed_resident_kernel(U, bk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * bm, b), out_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * vals.shape[0] * bm * bk * b,
            bytes_accessed=(
                vals.size * vals.dtype.itemsize
                + Xt.size * X.dtype.itemsize
                + nb * bm * b * np.dtype(out_dtype).itemsize
            ),
            transcendentals=0,
        ),
    )(tile_cols, hcount, rptr, vals, Xt)


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


def _tile_census(A, bm: int, bk: int):
    """Host-side (block-row id, col id) pairs of nonzero tiles + per-row
    counts — the cheap statistic both the packed converter and the tile-
    height auto-tuner need."""
    import scipy.sparse as sp

    C = A if isinstance(A, sp.coo_matrix) else sp.coo_matrix(A)
    n = C.shape[0]
    nb = -(-n // bm)
    ncb = -(-n // bk)
    key = (C.row // bm).astype(np.int64) * ncb + (C.col // bk)
    ukey = np.unique(key)
    ubr = (ukey // ncb).astype(np.int64)
    ubc = (ukey % ncb).astype(np.int32)
    counts = np.bincount(ubr, minlength=nb)
    return key, ukey, ubr, ubc, counts, nb, ncb


# Calibrated on TPU v5e 2026-08-20 (benchmarks/results/tpu_*_spmm3.log,
# *_tile_sweep.log, round-3 *_resident_sweep.log): each grid step costs
# ~0.25-0.5 us of pipeline overhead — the HBM-time equivalent of
# ~280 kB at the ~800 GB/s roofline.  The resident-RHS sweep showed the
# step term DOMINATES at fine tiles: blocky-64k (16x128) runs 3.42 ms at
# U=32/H=1 (1.07 GB padded) vs 4.21 ms at U=16/H=2 (0.62 GB) — 70% more
# bytes beats 2x the steps.  The model reproduced the measured ordering
# on both benchmark fixtures.
_STEP_COST_BYTES = 280_000
# ~1 MB SMEM total (CLAUDE.md gotcha 6); 768 kB leaves margin for the
# grid bookkeeping — the 557 kB blocky-64k (16,32) plan builds and runs
# (round-3 resident sweep), which the old 512 kB budget wrongly rejected
_SMEM_TILE_IDS_BYTES = 768 * 1024


def pick_tile_plan(A, bk: int = 128,
                   heights=(128, 64, 32, 16),
                   unrolls=(4, 8, 16, 32)) -> tuple[int, int]:
    """Jointly choose (tile height, unroll) minimizing modeled apply time.

    Finer tiles store fewer zeros but multiply the grid-step count (each
    step pays ~0.25 us of pipeline overhead — the dominant cost at small
    tiles); larger unroll divides the step count but pads every row's
    tile list to a multiple of U.  The 2-D grid runs nb x max(chunks)
    steps (short rows idle through clamped no-op steps), so the step term
    uses the MAX per-row chunk count.  Heights whose tile-id array would
    overflow scalar memory (~1 MB SMEM, CLAUDE.md gotcha 6) are rejected.
    """
    best, best_cost = None, float("inf")
    for bm in heights:
        _, ukey, _, _, counts, nb, _ = _tile_census(A, bm, bk)
        for U in unrolls:
            # U>=32 restricted to bm=16 — MEASURED, not provisional
            # (round-4 batch W, blocky-64k: bm16/U32 3.40 ms vs bm32
            # 5.09, bm64 6.50, bm128 8.68; U16 likewise prefers bm16):
            # taller tiles at high unroll pad more bytes than the larger
            # chunks save
            if U >= 32 and bm > 16:
                continue
            chunks = np.maximum(-(-counts // U), 1)
            tiles_padded = int(chunks.sum()) * U
            # SMEM holds ALL THREE scalar-prefetch arrays: tile_cols
            # (tiles_padded), plus hcount and rptr (nb each) — at fine
            # tile heights on large n the nb terms dominate and a
            # tile-ids-only check would pass plans that fail at kernel
            # build (ADVICE r2).
            if (tiles_padded + 2 * nb) * 4 > _SMEM_TILE_IDS_BYTES:
                continue
            bytes_tiles = tiles_padded * bm * bk * 4
            steps = nb * int(chunks.max())
            cost = bytes_tiles + steps * _STEP_COST_BYTES
            if cost < best_cost:
                best, best_cost = (bm, U), cost
    # best is None when EVERY candidate's tile-id array overflows SMEM
    # (huge matrices with many tiles per row) — the operator cannot be
    # built; callers route to ELL/HYB instead
    return best


def pick_tile_height(A, bk: int = 128, unroll: int = 4,
                     candidates=(128, 64, 32, 16)):
    """Tile height of the jointly-tuned plan (see pick_tile_plan), or
    None when no plan fits SMEM."""
    plan = pick_tile_plan(A, bk=bk, heights=candidates)
    return plan[0] if plan is not None else None


def modeled_bsr_apply_seconds(A, bk: int = 128, hbm_bw: float = 800e9,
                              plan: tuple | None = None) -> float:
    """Modeled apply time of the (given or best) packed-BSR plan — used
    by the format router to compare against the DIA model on equal terms.
    Returns inf when no plan fits SMEM."""
    if plan is None:
        plan = pick_tile_plan(A, bk=bk)
    if plan is None:
        return float("inf")
    bm, U = plan
    _, ukey, _, _, counts, nb, _ = _tile_census(A, bm, bk)
    chunks = np.maximum(-(-counts // U), 1)
    cost = (int(chunks.sum()) * U * bm * bk * 4
            + nb * int(chunks.max()) * _STEP_COST_BYTES)
    return cost / hbm_bw


def _packed_bsr_from_scipy(A, bm: int, bk: int, unroll: int, dtype):
    """Host-side conversion scipy sparse → packed (CSR-of-tiles) arrays.

    Each block-row's tile list is zero-padded to a multiple of ``unroll``
    (padding tiles point at column-block 0 with zero values — the
    identity-contribution trick)."""
    import scipy.sparse as sp

    C = sp.coo_matrix(A)
    C.sum_duplicates()
    n = C.shape[0]
    key, ukey, ubr, ubc, counts, nb, ncb = _tile_census(C, bm, bk)
    chunks = np.maximum(-(-counts // unroll), 1)  # ≥1 so hcount ≥ 1
    rptr = np.zeros(nb, dtype=np.int32)
    rptr[1:] = np.cumsum(chunks)[:-1]
    T = int(chunks.sum()) * unroll

    # slot of each unique tile within its row, then its packed position
    row_start = np.searchsorted(ubr, np.arange(nb))
    slot = np.arange(len(ukey)) - row_start[ubr]
    pos = rptr[ubr] * unroll + slot  # packed tile index

    tile_cols = np.zeros(T, dtype=np.int32)
    tile_cols[pos] = ubc
    vals = np.zeros((T, bm, bk), dtype=np.dtype(dtype))
    inv = np.searchsorted(ukey, key)  # nnz → unique-tile rank
    vals[pos[inv], C.row % bm, C.col % bk] = C.data.astype(np.dtype(dtype))
    hcount = chunks.astype(np.int32)
    return tile_cols, hcount, rptr, vals, nb, ncb, int(chunks.max())


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
    """Symmetric sparse operator in packed (CSR-of-tiles) block layout,
    applied with the Pallas packed-BSR SpMM kernel on TPU (interpret mode
    on CPU test backends).

    Tile height is auto-tuned per matrix (``pick_tile_height``): FEM-class
    matrices with scattered dense node blocks store far fewer zeros at
    16x128 than at the MXU-square 128x128 (measured 10.4% -> ~40%+ tile
    fill on the blocky fixture), and the packed layout pays no
    ELL pad-to-max on skewed tile counts.  Tiles are MXU-shaped in the
    contraction dim (bk=128); use f32/bf16 (the TPU MXU has no f64 — f64
    solves should use the ELL/DIA operators, which XLA emulates
    correctly)."""

    tile_cols: jax.Array    # (T,) int32 column-block id per packed tile
    hcount: jax.Array       # (nb,) int32 chunk count per block-row
    rptr: jax.Array         # (nb,) int32 first chunk of each block-row
    vals: jax.Array         # (T, bm, bk) packed tiles — or, when
    #                         panel=True, (T//U, U·bk, bm) transposed panels
    diag: jax.Array | None = None  # (n,) — stashed at construction
    _n: int = static_field(default=0)
    H: int = static_field(default=1)
    bm: int = static_field(default=128)
    bk: int = static_field(default=128)
    unroll: int = static_field(default=1)
    interpret: bool = static_field(default=False)
    panel: bool = static_field(default=False)
    panel_gather: str = static_field(default="swap")

    @property
    def shape(self):
        return (self._n, self._n)

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def nnz_blocks(self):
        return int(self.tile_cols.shape[0])

    def apply(self, X):
        # X is indexed by column blocks: pad its rows to ncb*bk
        ncb = -(-self._n // self.bk)
        pad = ncb * self.bk - self._n
        Xp = jnp.pad(X, ((0, pad), (0, 0))) if pad else X
        # RHS-resident variant when X fits VMEM beside the A-tile
        # pipeline: kills the per-step tiny X DMAs (NEXT r2 item 3)
        xbytes = ncb * self.bk * X.shape[1] * jnp.dtype(self.dtype).itemsize
        if self.panel:
            if xbytes > _RESIDENT_X_BYTES:
                raise ValueError(
                    "panel layout requires the RHS resident in VMEM "
                    f"({xbytes} bytes > {_RESIDENT_X_BYTES}) — rebuild "
                    "with panel=False for this block width"
                )
            Y = bsr_spmm_panel(
                self.tile_cols, self.hcount, self.rptr, self.vals,
                Xp.astype(self.dtype),
                bm=self.bm, bk=self.bk, H=self.H, unroll=self.unroll,
                interpret=self.interpret, out_dtype=X.dtype,
                gather=self.panel_gather,
            )
            nrows = self.rptr.shape[0] * self.bm
            return Y[: self._n] if nrows != self._n else Y
        fn = (bsr_spmm_packed_resident
              if xbytes <= _RESIDENT_X_BYTES else bsr_spmm_packed)
        Y = fn(
            self.tile_cols, self.hcount, self.rptr, self.vals,
            Xp.astype(self.dtype),
            bm=self.bm, bk=self.bk, H=self.H, unroll=self.unroll,
            interpret=self.interpret, out_dtype=X.dtype,
        )
        nrows = self.rptr.shape[0] * self.bm
        return Y[: self._n] if nrows != self._n else Y

    def diagonal(self):
        return self.diag

    @classmethod
    def from_scipy(cls, A, dtype=jnp.float32, bm: int | None = None,
                   bk: int = 128, interpret: bool | None = None,
                   unroll: int | None = None, panel: bool = False,
                   panel_gather: str = "swap"):
        """Build from a scipy sparse symmetric matrix.

        ``bm=None`` auto-tunes the tile height from the matrix's tile-fill
        profile; ``interpret`` defaults to True off-TPU (CPU test backend)
        and False on TPU."""
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        if bm is None and unroll is None:
            plan = pick_tile_plan(A, bk=bk)
            if plan is None:
                raise ValueError(
                    "no packed-BSR plan fits the scalar-prefetch budget "
                    "for this matrix (too many tiles per row at every "
                    "tile height) — use the ELL/HYB operators instead"
                )
            bm, unroll = plan
        elif bm is None:
            bm = pick_tile_height(A, bk=bk, unroll=unroll)
            if bm is None:
                raise ValueError(
                    "no packed-BSR tile height fits the scalar-prefetch "
                    "budget — use the ELL/HYB operators instead"
                )
        elif unroll is None:
            unroll = 4
        tile_cols, hcount, rptr, vals, nb, ncb, H = _packed_bsr_from_scipy(
            A, bm, bk, unroll, dtype
        )
        if panel:
            # repack (T, bm, bk) tiles → (T/U, U·bk, bm) transposed panels
            nch = vals.shape[0] // unroll
            vals = np.ascontiguousarray(
                vals.reshape(nch, unroll, bm, bk)
                .transpose(0, 1, 3, 2)
                .reshape(nch, unroll * bk, bm)
            )
        import scipy.sparse as sp

        return cls(
            tile_cols=jnp.asarray(tile_cols),
            hcount=jnp.asarray(hcount),
            rptr=jnp.asarray(rptr),
            vals=_device_put_large(vals),
            diag=jnp.asarray(
                sp.csr_matrix(A).diagonal().astype(np.dtype(dtype))
            ),
            _n=A.shape[0],
            H=H,
            bm=bm,
            bk=bk,
            unroll=unroll,
            interpret=interpret,
            panel=panel,
            panel_gather=panel_gather,
        )

    def density_report(self) -> str:
        nnz = int(np.count_nonzero(np.asarray(self.vals)))
        stored = int(self.vals.size)
        return (
            f"BlockSparseOperator: n={self._n}, {self.nnz_blocks} packed "
            f"tiles of {self.bm}x{self.bk} (H={self.H}, unroll="
            f"{self.unroll}), fill={nnz/max(stored,1):.3f}"
        )
