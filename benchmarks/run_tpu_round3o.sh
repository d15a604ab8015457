#!/bin/bash
# Round-3 TPU batch M: tol-honest retry — cap 896 + pipeline_depth 1
# (cap-1024 f64 OOMed by 260 MB: X64 pipeline copies; memory notes say
# the n=1M f64 gate needed pipeline_depth=1 for the same reason).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
timeout 5400 python - <<'PY' 2>&1 | log tol_honest4
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig

nx = 512
k, b = 50, 8
op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
cfg = RBLConfig(block_size=b, basis_dtype=jnp.float64,
                compute_dtype=jnp.float64, tol=1e-7,
                max_kryl_dim=832, pipeline_depth=1,
                eig_poll_cadence=16, seed=0)
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:k]

def run(seed):
    t0 = time.perf_counter()
    res = rt.rbl(op, k, b, cfg=cfg.replace(seed=seed),
                 compute_eigenvectors=True)
    float(res.eigenvectors[0, 0])
    return time.perf_counter() - t0, res

el0, _ = run(0)
el, res = run(1)
w = np.asarray(res.eigenvalues)
rel = float(np.abs((w - exact) / exact).max())
print(json.dumps({"metric": "lap2d_512_k50_b8_at_ref_tol",
                  "value": round(el, 3), "unit": "s", "tol": 1e-7,
                  "cold_s": round(el0, 3), "max_rel_err": rel,
                  "converged": bool(res.converged),
                  "kryl_dim": int(res.kryl_dim)}), flush=True)
PY
echo done
