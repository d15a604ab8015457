#!/bin/bash
# Round-3 TPU batch L: ldoor-scale end-to-end (fem3d-64: n=811k,
# 63.7 Mnnz) with the retuned packed kernel — r2 recorded 7.83 s warm.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
timeout 5400 python - <<'PY' 2>&1 | log fem64_r3
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.utils.fem import fem_elasticity_3d

t0 = time.time()
A = fem_elasticity_3d(64).astype(np.float32)
print(f"assembled n={A.shape[0]} nnz={A.nnz} in {time.time()-t0:.0f}s",
      flush=True)
op = rt.as_operator(A, dtype=jnp.float32)
print("router:", type(op).__name__,
      getattr(op, "bm", None), getattr(op, "unroll", None), flush=True)
k, b = 100, 8
cfg = RBLConfig(block_size=b, basis_dtype=jnp.bfloat16,
                compute_dtype=jnp.float32, qr_method="cholqr2",
                tol=1e-3, max_kryl_dim=1400, eig_poll_cadence=16)
times = []
for seed in (0, 1):
    t0 = time.perf_counter()
    res = rt.rbl(op, k, b, cfg=cfg.replace(seed=seed),
                 compute_eigenvectors=True)
    float(res.eigenvectors[0, 0])
    times.append(time.perf_counter() - t0)
print(json.dumps({"metric": "fem64_k100_b8_tol1e-3_warm",
                  "value": round(times[1], 3), "unit": "s",
                  "cold_s": round(times[0], 3),
                  "converged": bool(res.converged),
                  "kryl_dim": int(res.kryl_dim),
                  "r2_s": 7.83}), flush=True)
PY
echo done
