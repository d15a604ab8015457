#!/bin/bash
# Round-3 TPU batch G: (bm, unroll) sweep of the RESIDENT-RHS packed
# kernel on the blocky fixture — the cost model's per-step term changed
# when the per-step X DMAs disappeared, so the r2-calibrated plan may no
# longer be optimal.  Also pins the per-step overhead constant.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== resident-kernel tile sweep (blocky-64k) =="
timeout 3600 python - <<'EOF' 2>&1 | log resident_sweep
import json, time
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import rbl_tpu as rt
from benchmarks.spmm_bench import time_apply

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

for bm, U in ((16, 8), (16, 16), (16, 32), (32, 8), (32, 16), (64, 8),
              (128, 8), (16, 4)):
    try:
        op = rt.BlockSparseOperator.from_scipy(
            G, dtype=jnp.float32, bm=bm, unroll=U)
    except Exception as e:
        print(f"bm={bm} U={U}: skipped ({e})", flush=True)
        continue
    y = np.asarray(op.apply(X))
    rel = float(np.abs(y - ref).max() / np.abs(ref).max())
    dt = time_apply(op, X, 30)
    print(json.dumps({"metric": f"resident_blocky_bm{bm}_U{U}",
                      "value": round(dt * 1e3, 4), "unit": "ms/apply",
                      "gnnz_s": round(nnz / dt / 1e9, 2),
                      "tiles": int(op.tile_cols.shape[0]),
                      "H": op.H, "rel": rel}), flush=True)
EOF

echo "done"
