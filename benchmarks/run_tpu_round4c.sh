#!/bin/bash
# Round-4 TPU batch C: fem42 + 512^2 cheb-polish reruns on the FIXED
# refine (cutoff at the k+half-buffer Ritz value; frozen-column locking;
# gain-ratio degree cap — see polish.py).  The first round-4 runs hit
# (a) the garbage-column cutoff collapse (fem42 40/100 locked) and
# (b) a non-finite filter output at 512^2 (worker state or X64 split).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== leg 1: fem3d-42 k=100 cheb-polish v2 =="
timeout 5400 python - <<'PY' 2>&1 | log polish_fem42_v2
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.solver.polish import rbl_polished
from rbl_tpu.utils.fem import fem_elasticity_3d
from rbl_tpu.utils.probe import solve_with_retry, wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
gt = np.load("benchmarks/groundtruth/fem42_lm_k100.npz")["eigenvalues"]
k, b = 100, 8
A = fem_elasticity_3d(42)
for run, seed in (("cold", 0), ("warm", 1)):
    cfg = RBLConfig(block_size=b, tol=1e-7, qr_method="cholqr2",
                    eig_poll_cadence=16, seed=seed)
    t0 = time.perf_counter()
    res = solve_with_retry(rbl_polished, A, k, cfg=cfg, b=b,
                           coarse_tol=1e-5, bounds=(0.0, None),
                           max_passes=16,
                           retries=1, attempts=10, sleep_s=60)
    el = time.perf_counter() - t0
    w = np.sort(np.asarray(res.eigenvalues, dtype=np.float64))[::-1]
    rel = float(np.abs((w - gt[:k]) / gt[:k]).max())
    print(json.dumps({"metric": f"fem42_k100_chebpolish_v2_tol1e-7_{run}",
                      "value": round(el, 3), "unit": "s", "tol": 1e-7,
                      "locked": int(np.sum(res.residual_bounds < 1e-7)),
                      "passes": int(res.iterations),
                      "max_resid": float(np.max(res.residual_bounds)),
                      "converged": bool(res.converged),
                      "max_rel_err_vs_arpack": rel,
                      "arpack_cpu_s": 390.0}), flush=True)
PY

echo "== leg 2: 512^2 k=50 cheb-polish v2 =="
timeout 5400 python - <<'PY' 2>&1 | log polish_512_v2
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.solver.polish import rbl_polished
from rbl_tpu.utils.probe import solve_with_retry, wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
nx, k, b = 512, 50, 8
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
    print(json.dumps({"metric": f"lap2d_512_k50_chebpolish_v2_tol1e-7_{run}",
                      "value": round(el, 3), "unit": "s", "tol": 1e-7,
                      "locked": int(np.sum(res.residual_bounds < 1e-7)),
                      "passes": int(res.iterations),
                      "max_resid": float(np.max(res.residual_bounds)),
                      "converged": bool(res.converged), "max_rel_err": rel}),
          flush=True)
PY
echo "done"
