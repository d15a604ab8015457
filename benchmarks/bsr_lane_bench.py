"""BSR lane-utilization experiments (VERDICT r4 item 3).

The standing ceiling: blocky-64k at the tuned (bm=16, U=32) plan runs
3.40 ms ≈ 316 GB/s padded-tile bandwidth, ~40% of the measured ~929 GB/s
chunk-stream rate, diagnosed MXU-ISSUE-bound — each of the U per-chunk
(16, 128) @ (128, 8) dots uses 8/128 output lanes.  Two untried levers:

1. RHS WIDTH: the same kernel at b = 16/32/64/128 (the polish filter,
   SVD, and AMG call sites apply A to (n, m ~ 90-128) blocks).  Each dot
   becomes (16, 128) @ (128, b): lanes fill at no extra issue cost, so
   effective A-tile bandwidth should climb toward the stream rate.
2. LANE-CONCAT PANEL: the one-big-dot panel variant lost 2-3x in round 4
   to its sublane stack+swapaxes X-gather; rebuilding the (b, U*bk)
   operand by LANE concatenation (U adjacent VMEM copies) retries the
   issue-count saving without that relayout.

Prints one JSON line per measurement; asserts correctness vs scipy on
every variant first.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=50)
    p.add_argument("--widths", type=int, nargs="*",
                   default=[8, 16, 32, 64, 128])
    args = p.parse_args()

    import scipy.sparse as sp

    import jax
    import jax.numpy as jnp

    import rbl_tpu as rt
    from benchmarks.spmm_bench import time_apply

    rng = np.random.default_rng(0)
    # blocky-64k: the spmm_bench fixture (4096 block-rows of 16x16 dense
    # blocks, ~14 blocks/row after symmetrization)
    nbn = 65536 // 16
    bpr = 7
    rb = np.repeat(np.arange(nbn), bpr)
    cb = rng.integers(0, nbn, rb.size)
    key = np.unique(
        np.concatenate([rb, cb]).astype(np.int64) * nbn
        + np.concatenate([cb, rb])
    )
    rb, cb = key // nbn, key % nbn
    ii = (rb[:, None, None] * 16 + np.arange(16)[None, :, None]
          ).repeat(16, axis=2).ravel()
    jj = (cb[:, None, None] * 16 + np.arange(16)[None, None, :]
          ).repeat(16, axis=1).ravel()
    G = sp.coo_matrix(
        (rng.standard_normal(ii.size).astype(np.float32), (ii, jj)),
        shape=(nbn * 16, nbn * 16),
    ).tocsr()
    n = G.shape[0]

    op = rt.BlockSparseOperator.from_scipy(G, dtype=jnp.float32)
    tile_bytes = int(op.vals.size) * 4
    print(f"plan: bm={op.bm} U={op.unroll} H={op.H} "
          f"padded tiles {tile_bytes/1e9:.2f} GB", flush=True)

    # correctness fixture
    Xc = rng.standard_normal((n, 8)).astype(np.float32)
    ref = G @ Xc

    # ---- 1. RHS width sweep on the tuned packed kernel ----------------
    for b in args.widths:
        X = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))
        y = np.asarray(op.apply(jnp.asarray(Xc[:, :1]).repeat(b, axis=1)))
        err = np.abs(y[:, 0] - ref[:, 0]).max() / np.abs(ref).max()
        assert err < 1e-5, (b, err)
        dt = time_apply(op, X, args.reps)
        print(json.dumps({
            "metric": f"bsr_blocky64k_b{b}",
            "ms": round(dt * 1e3, 3),
            "tile_gbps": round(tile_bytes / dt / 1e9, 1),
            "nnz_per_s_e9": round(G.nnz / dt / 1e9, 2),
        }), flush=True)

    # ---- 2. lane-concat panel at b=8 ----------------------------------
    import dataclasses

    opp = rt.BlockSparseOperator.from_scipy(
        G, dtype=jnp.float32, bm=op.bm, unroll=op.unroll, panel=True)
    for gather in ("concat", "swap"):
        pop = dataclasses.replace(opp, panel_gather=gather)
        y = np.asarray(pop.apply(jnp.asarray(Xc)))
        err = np.abs(y - ref).max() / np.abs(ref).max()
        assert err < 1e-5, (gather, err)
        dt = time_apply(pop, jnp.asarray(Xc), args.reps)
        print(json.dumps({
            "metric": f"bsr_blocky64k_panel_{gather}_b8",
            "ms": round(dt * 1e3, 3),
            "tile_gbps": round(tile_bytes / dt / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
