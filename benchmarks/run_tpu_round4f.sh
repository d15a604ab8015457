#!/bin/bash
# Round-4 TPU batch F: panel-kernel A/B (BENCHMARKS.md "SpMM fine-tile
# ceiling" conclusion 3).  The packed kernel is MXU-issue bound at fine
# tiles; the panel layout replaces each chunk's U small dots with ONE
# (b, U*bk)@(U*bk, bm) contraction.  Measures packed vs panel on the
# blocky-64k fixture and fem3d-30 at several (bm, U) plans.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

timeout 5400 python - <<'PY' 2>&1 | log panel_ab
import json
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import rbl_tpu as rt
from benchmarks.spmm_bench import time_apply
from rbl_tpu.utils.fem import fem_elasticity_3d
from rbl_tpu.utils.probe import wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
rng = np.random.default_rng(0)

fixtures = []
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
fixtures = [("blocky-64k", G), ("fem3d-30", fem_elasticity_3d(30).astype(np.float32))]

for fname, A in fixtures:
    n = A.shape[0]
    X = jnp.asarray(rng.standard_normal((n, 8)).astype(np.float32))
    ref = None
    for bm, U in ((16, 32), (16, 16), (32, 16), (16, 8)):
        for panel in (False, True):
            try:
                op = rt.BlockSparseOperator.from_scipy(
                    A, dtype=jnp.float32, bm=bm, unroll=U, panel=panel)
                Y = np.asarray(op.apply(X))
                if ref is None:
                    ref = Y
                rel = float(np.linalg.norm(Y - ref) / max(np.linalg.norm(ref), 1e-30))
                dt = time_apply(op, X, reps=30)
                nbytes = op.vals.size * 4
                print(json.dumps({
                    "metric": f"{fname}_bm{bm}_U{U}_{'panel' if panel else 'packed'}",
                    "ms": round(dt * 1e3, 3),
                    "eff_GBps": round(nbytes / dt / 1e9, 1),
                    "rel_vs_first": rel}), flush=True)
            except Exception as e:
                print(json.dumps({"metric": f"{fname}_bm{bm}_U{U}_{'panel' if panel else 'packed'}",
                                  "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
PY
echo "done"
