#!/bin/bash
# Round-4 TPU batch D: 256^2 k=50 cheb-polish at tol 1e-7 (v2 refine).
# The ARPACK CPU control is 46.9 s; CPU-backend v2 reference: 50/50
# locked in 4 passes, 194 s (cpu_polish_256_v2).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

timeout 5400 python - <<'PY' 2>&1 | log polish_256_v2
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.solver.polish import rbl_polished
from rbl_tpu.utils.probe import solve_with_retry, wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
nx, k, b = 256, 50, 8
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:k]
for run, seed in (("cold", 0), ("warm", 1)):
    op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
    cfg = RBLConfig(block_size=b, tol=1e-7, qr_method="cholqr2",
                    eig_poll_cadence=16, seed=seed)
    t0 = time.perf_counter()
    res = solve_with_retry(rbl_polished, op, k, cfg=cfg, b=b,
                           bounds=(0.0, None),
                           retries=1, attempts=10, sleep_s=60)
    el = time.perf_counter() - t0
    w = np.sort(np.asarray(res.eigenvalues))[::-1]
    rel = float(np.abs((w - exact) / exact).max())
    print(json.dumps({"metric": f"lap2d_256_k50_chebpolish_v2_tol1e-7_{run}",
                      "value": round(el, 3), "unit": "s", "tol": 1e-7,
                      "locked": int(np.sum(res.residual_bounds < 1e-7)),
                      "passes": int(res.iterations),
                      "max_resid": float(np.max(res.residual_bounds)),
                      "converged": bool(res.converged), "max_rel_err": rel,
                      "arpack_cpu_s": 46.9}), flush=True)
PY
echo "done"
