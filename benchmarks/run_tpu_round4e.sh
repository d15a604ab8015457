#!/bin/bash
# Round-4 TPU batch E: warm-time tuning A/B for the polish (the recorded
# 256^2 warm is 61.6 s vs ARPACK CPU 46.9 s).  Levers: target_gain
# (bigger degree -> fewer passes -> fewer host round-trips + eighs) and
# the per-pass time breakdown (RBL_DEBUG dt= lines show where warm time
# goes: coarse, device chains, or tunnel traffic).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

RBL_DEBUG=1 timeout 4800 python - <<'PY' 2>&1 | log polish_gain_ab
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
op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
for gain in (1e4, 1e6, 1e8):
    for rep in (0, 1):  # rep 1 = warm (process-cached compiles)
        cfg = RBLConfig(block_size=b, tol=1e-7, qr_method="cholqr2",
                        eig_poll_cadence=16, seed=rep)
        t0 = time.perf_counter()
        res = solve_with_retry(rbl_polished, op, k, cfg=cfg, b=b,
                               bounds=(0.0, None), target_gain=gain,
                               retries=1, attempts=10, sleep_s=60)
        el = time.perf_counter() - t0
        if rep == 0:
            continue  # first run warms compiles for this gain's degrees
        w = np.sort(np.asarray(res.eigenvalues))[::-1]
        rel = float(np.abs((w - exact) / exact).max())
        print(json.dumps({"metric": f"lap2d_256_polish_gain{gain:.0e}_warm",
                          "value": round(el, 3), "unit": "s",
                          "locked": int(np.sum(res.residual_bounds < 1e-7)),
                          "passes": int(res.iterations),
                          "max_resid": float(np.max(res.residual_bounds)),
                          "converged": bool(res.converged),
                          "max_rel_err": rel}), flush=True)
PY
echo "done"
