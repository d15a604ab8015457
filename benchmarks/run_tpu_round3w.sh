#!/bin/bash
# Round-3 TPU batch W: taller-tile U=32 measurement (NEXT item 4).  The
# retuned plan space restricts U=32 to bm=16 (the only measured combo);
# this sweep measures (32..128)xU32 — either the restriction lifts or the
# per-height bandwidth term gets calibrated (batch-G fits ranged
# 0.26-0.5 us/step — not constant).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

timeout 3600 python - <<'PY' 2>&1 | log u32_tall_sweep
import json
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import rbl_tpu as rt
from benchmarks.spmm_bench import time_apply
from rbl_tpu.utils.probe import wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
rng = np.random.default_rng(0)
nbn = 65536 // 16
bpr = 7
rb = np.repeat(np.arange(nbn), bpr)
cb = rng.integers(0, nbn, rb.size)
key = np.unique(np.concatenate([rb, cb]).astype(np.int64) * nbn
                + np.concatenate([cb, rb]))
rb, cb = key // nbn, key % nbn
ii = (rb[:, None, None] * 16 + np.arange(16)[None, :, None]
      ).repeat(16, axis=2).ravel()
jj = (cb[:, None, None] * 16 + np.arange(16)[None, None, :]
      ).repeat(16, axis=1).ravel()
G = sp.coo_matrix((rng.standard_normal(ii.size).astype(np.float32),
                   (ii, jj)), shape=(nbn * 16, nbn * 16)).tocsr()
X = jnp.asarray(rng.standard_normal((G.shape[0], 8)).astype(np.float32))
nnz = G.nnz
ref = G @ np.asarray(X)

for bm, U in ((16, 32), (32, 32), (64, 32), (128, 32),
              (32, 16), (64, 16), (128, 16), (64, 64)):
    try:
        op = rt.BlockSparseOperator.from_scipy(
            G, dtype=jnp.float32, bm=bm, unroll=U)
        y = np.asarray(op.apply(X))
        rel = float(np.abs(y - ref).max() / np.abs(ref).max())
        dt = time_apply(op, X, 30)
        print(json.dumps({"metric": f"u32tall_blocky_bm{bm}_U{U}",
                          "value": round(dt * 1e3, 4), "unit": "ms/apply",
                          "gnnz_s": round(nnz / dt / 1e9, 2),
                          "tiles": int(op.tile_cols.shape[0]),
                          "H": op.H, "rel": rel}), flush=True)
    except Exception as e:
        print(json.dumps({"metric": f"u32tall_blocky_bm{bm}_U{U}",
                          "error": repr(e)[:200]}), flush=True)
PY
echo "done"
