#!/bin/bash
# Round-3 TPU batch K: validate the recalibrated auto plans (U=32 tier,
# 768 kB SMEM budget) against the batch-G measured bests.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
timeout 3000 python - <<'PY' 2>&1 | log auto_plan_check
import json
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import rbl_tpu as rt
from benchmarks.spmm_bench import time_apply
from rbl_tpu.utils.fem import fem_elasticity_3d

rng = np.random.default_rng(0)
nbn = 65536 // 16
rb = np.repeat(np.arange(nbn), 7)
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
for name, A in (("blocky-64k", G), ("fem3d-16", fem_elasticity_3d(16)),
                ("fem3d-30", fem_elasticity_3d(30))):
    op = rt.BlockSparseOperator.from_scipy(A, dtype=jnp.float32)
    X = jnp.asarray(rng.standard_normal((A.shape[0], 8)).astype(np.float32))
    y = np.asarray(op.apply(X))
    ref = sp.csr_matrix(A) @ np.asarray(X)
    rel = float(np.abs(y - ref).max() / np.abs(ref).max())
    dt = time_apply(op, X, 30)
    print(json.dumps({"metric": f"auto_plan_{name}",
                      "value": round(dt * 1e3, 4), "unit": "ms/apply",
                      "plan": [op.bm, op.unroll], "rel": rel}),
          flush=True)
PY
echo done
