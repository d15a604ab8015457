"""DMA-stream micro-benchmark — isolates the packed-BSR kernel's cost terms.

VERDICT r2/r3 carry-over: the packed-BSR SpMM reaches ~180 GB/s effective
at 16-row tiles (~420 at 128-row) vs the ~800 GB/s HBM roofline, and the
ask is "manual two-ahead double-buffering via pltpu.make_async_copy, or a
measurement-backed proof that fine-row DMA bandwidth is the hardware
ceiling".  This bench separates the candidate explanations by measuring,
for each (tile height bm, unroll U):

  stream      — pure A-tile stream through the SAME BlockSpec pipeline the
                packed kernel uses (per-step chunk (U·bm, 128)), VPU
                reduce only.  Isolates {DMA + per-grid-step pipeline
                overhead}; no MXU, no scalar-prefetch indexing.
  stream_dot  — the same stream plus the packed-resident kernel's compute
                structure (U per-tile MXU dots against a resident (8, 128)
                RHS tile).  The stream→stream_dot delta is the MXU-issue
                term.
  manual      — the whole stream in ONE grid step, two-slot in-kernel
                double-buffered pltpu.make_async_copy ping-pong + the same
                VPU reduce.  The stream→manual delta is what manual DMA
                control can actually buy over Pallas's implicit grid
                pipelining at this chunk shape.

(128, 8) is the coarse-tile control ≈ contiguous-stream ceiling proxy.
Timing: device-chained reps with a flowing seed tile (the chain input) so
the loop body cannot be hoisted and byte-identical-execution caching
(CLAUDE.md gotcha 4) cannot serve a stale result; marginal cost between
two trip counts cancels fixed dispatch latency (same scheme as
spmm_bench.time_apply).

Usage: python benchmarks/dma_stream_bench.py [--mb 256] [--reps 8]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _build_kernels():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def stream_kernel(seed_ref, vals_ref, out_ref, acc_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc_ref[:] = seed_ref[:]

        acc_ref[:] += jnp.sum(vals_ref[:], axis=0)[None, :]

        @pl.when(i == pl.num_programs(0) - 1)
        def _():
            out_ref[:] = acc_ref[:]

    def make_stream(S, CH, interpret):
        @jax.jit
        def run(vals, seed):
            return pl.pallas_call(
                stream_kernel,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0)),
                    pl.BlockSpec((CH, 128), lambda i: (i, i * 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                interpret=interpret,
            )(seed, vals)

        return run

    def make_stream_dot(S, CH, bm, U, interpret):
        # vals chunk seen as U tiles of (bm, 128); per-tile dot against a
        # resident (8, 128) RHS tile — the packed-resident kernel's
        # compute shape (pallas_bsr._make_packed_resident_kernel).  The
        # (bm, 8) dot results fold into the lane-128 accumulator through a
        # scalar reduce (the reduced value is irrelevant; the dots must
        # merely stay live).
        def kernel(seed_ref, vals_ref, xt_ref, out_ref, acc_ref):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                acc_ref[:] = seed_ref[:]

            s = jnp.zeros((bm, 8), jnp.float32)
            for u in range(U):
                tile = vals_ref[u * bm : (u + 1) * bm]  # (bm, 128)
                s = s + jax.lax.dot_general(
                    tile, xt_ref[:],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST,
                )
            acc_ref[:] += jnp.sum(s)

            @pl.when(i == pl.num_programs(0) - 1)
            def _():
                out_ref[:] = acc_ref[:]

        @jax.jit
        def run(vals, seed, xt):
            return pl.pallas_call(
                kernel,
                grid=(S,),
                in_specs=[
                    pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0)),
                    pl.BlockSpec((CH, 128), lambda i: (i, i * 0)),
                    pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0)),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda i: (i * 0, i * 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
                interpret=interpret,
            )(seed, vals, xt)

        return run

    def make_manual(S, CH, interpret):
        def kernel(seed_ref, vals_hbm, out_ref, acc_ref, scratch, sems):
            def get_dma(slot, idx):
                return pltpu.make_async_copy(
                    vals_hbm.at[pl.ds(idx * CH, CH)],
                    scratch.at[slot],
                    sems.at[slot],
                )

            acc_ref[:] = seed_ref[:]
            get_dma(0, 0).start()

            def body(idx, carry):
                slot = jax.lax.rem(idx, 2)
                nxt = jax.lax.rem(idx + 1, 2)

                @pl.when(idx + 1 < S)
                def _():
                    get_dma(nxt, idx + 1).start()

                get_dma(slot, idx).wait()
                acc_ref[:] += jnp.sum(scratch[slot], axis=0)[None, :]
                return carry

            jax.lax.fori_loop(0, S, body, 0)
            out_ref[:] = acc_ref[:]

        @jax.jit
        def run(vals, seed):
            return pl.pallas_call(
                kernel,
                in_specs=[
                    pl.BlockSpec((8, 128), lambda: (0, 0)),
                    pl.BlockSpec(memory_space=pltpu.ANY if not hasattr(pl, "ANY") else pl.ANY),
                ],
                out_specs=pl.BlockSpec((8, 128), lambda: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
                scratch_shapes=[
                    pltpu.VMEM((8, 128), jnp.float32),
                    pltpu.VMEM((2, CH, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
                interpret=interpret,
            )(seed, vals)

        return run

    return make_stream, make_stream_dot, make_manual


def time_chained(call, vals, seed0, reps, extra=()):
    """Marginal per-call seconds: device-chained via the flowing seed."""
    import jax
    import jax.numpy as jnp

    def chain(vals_, seed, r, *ex):
        def body(i, y):
            out = call(vals_, y, *ex)
            n = jnp.linalg.norm(out)
            return out / jnp.where(n > 0, n, 1.0)

        return jax.lax.fori_loop(0, r, body, seed)

    ch = jax.jit(chain, static_argnames=())
    salt_counter = iter(range(1, 10**6))

    def run(r):
        salt = jnp.float32(next(salt_counter) * 1e-6)
        t0 = time.perf_counter()
        y = ch(vals, seed0 + salt, r, *extra)
        float(y[0, 0])
        return time.perf_counter() - t0

    run(1)  # warm/compile
    lo = float(np.median([run(reps) for _ in range(3)]))
    hi = float(np.median([run(4 * reps) for _ in range(3)]))
    return max(hi - lo, 1e-9) / (3 * reps)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mb", type=int, default=256)
    p.add_argument("--reps", type=int, default=8)
    p.add_argument("--configs", type=str, default=None,
                   help="comma list bm:U, e.g. 16:8,16:32")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    interpret = jax.default_backend() != "tpu"
    make_stream, make_stream_dot, make_manual = _build_kernels()

    total_rows = (args.mb * 2**20) // (128 * 4)
    key = jax.random.PRNGKey(0)
    seed0 = jnp.zeros((8, 128), jnp.float32)
    xt = jax.random.normal(jax.random.PRNGKey(1), (8, 128), jnp.float32)

    if args.configs:
        configs = [tuple(map(int, c.split(":")))
                   for c in args.configs.split(",")]
    else:
        configs = [(16, 8), (16, 32), (16, 64), (32, 16), (32, 32),
                   (128, 8)]
    rows = []
    for bm, U in configs:
        CH = bm * U
        S = max(total_rows // CH, 2)
        rows_used = S * CH
        vals = jax.random.normal(key, (rows_used, 128), jnp.float32)
        nbytes = rows_used * 128 * 4
        for name, fn, extra in (
            ("stream", make_stream(S, CH, interpret), ()),
            ("stream_dot", make_stream_dot(S, CH, bm, U, interpret), (xt,)),
            ("manual", make_manual(S, CH, interpret), ()),
        ):
            try:
                dt = time_chained(fn, vals, seed0, args.reps, extra=extra)
                gbs = nbytes / dt / 1e9
            except Exception as e:  # record per-config failures, keep going
                print(f"  [err] bm={bm} U={U} {name}: "
                      f"{type(e).__name__}: {e}"[:300], flush=True)
                continue
            print(f"  [row] bm={bm:4d} U={U:3d} {name:>10} "
                  f"{dt*1e3:8.3f} ms  {gbs:7.1f} GB/s", flush=True)
            rows.append({"bm": bm, "U": U, "variant": name,
                         "ms": round(dt * 1e3, 3), "GBps": round(gbs, 1)})
        del vals
    print(json.dumps({"metric": "dma_stream_sweep", "mb": args.mb,
                      "rows": rows}))


if __name__ == "__main__":
    main()
