"""Packed-BSR (tile-height x unroll) calibration sweep on real TPU.

The fem42 end-to-end profile showed the packed kernel's wall time is
dominated by per-grid-step pipeline overhead (~0.6-1 us/step inferred
from the 0803 ELL-kernel epoch), not by HBM bytes — so the right
(bm, unroll) balances stored bytes (finer tiles store fewer zeros)
against step count (steps = tiles/unroll) and per-row alignment padding
(<= unroll-1 tiles/row).  This sweep measures the product space on the
two benchmark-class fixtures and prints one row per config; the results
calibrate ``pick_tile_height``'s cost model.

Usage: python benchmarks/bsr_tile_sweep.py [--reps 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--reps", type=int, default=30)
    args = p.parse_args()

    import jax.numpy as jnp
    import scipy.sparse as sp

    import rbl_tpu as rt
    from benchmarks.spmm_bench import time_apply
    from rbl_tpu.utils.fem import fem_elasticity_3d

    rng = np.random.default_rng(0)

    fixtures = []
    F = fem_elasticity_3d(30).astype(np.float32)
    fixtures.append(("fem3d-30", F))

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
    fixtures.append(("blocky-64k", G))

    # most-informative-first so a timebox kill still leaves a usable sweep
    configs = [(16, 16), (16, 8), (128, 8), (128, 16), (32, 8), (16, 4),
               (128, 4), (32, 16)]
    for fname, A in fixtures:
        X = jnp.asarray(
            rng.standard_normal((A.shape[0], 8)).astype(np.float32)
        )
        for bm, unroll in configs:
            t0 = time.perf_counter()
            try:
                op = rt.BlockSparseOperator.from_scipy(
                    A, dtype=jnp.float32, bm=bm, unroll=unroll
                )
            except Exception as e:
                print(f"[{fname}] bm={bm} U={unroll}: skipped ({e})",
                      flush=True)
                continue
            build = time.perf_counter() - t0
            dt = time_apply(op, X, args.reps)
            nb = op.rptr.shape[0]
            steps = nb * op.H
            mb = op.vals.size * 4 / 1e6
            print(
                f"[{fname}] bm={bm:3d} U={unroll:2d}: "
                f"{dt*1e3:8.3f} ms  {A.nnz/dt/1e9:6.2f} Gnnz/s  "
                f"tiles={op.nnz_blocks:6d} steps={steps:6d} "
                f"stored={mb:7.1f} MB  (build+xfer {build:.1f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
