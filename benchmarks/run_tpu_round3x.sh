#!/bin/bash
# Round-3 TPU batch X: SA-AMG warm A/B (NEXT item 6).  The only TPU
# reading of the smoothed-aggregation inner preconditioner is COLD
# (1053 s vs jacobi-cold 573 s — uninformative: both numbers are mostly
# XLA compiles).  One warm A/B decides whether `_auto_inner_psolve`
# stays on for TPU or gates by backend.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

timeout 7200 python - <<'PY' 2>&1 | log sa_amg_warm_ab
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.compat import _auto_inner_psolve
from rbl_tpu.ops.minres import jacobi_psolve
from rbl_tpu.utils.fem import fem_elasticity_3d
from rbl_tpu.utils.probe import wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
N = 16
A = fem_elasticity_3d(N)
m = np.asarray(A.sum(axis=1)).ravel()
m = np.abs(m) + 1e-3 * np.abs(m).mean()
M = rt.DiagonalOperator(jnp.asarray(m, jnp.float64))
dA = jnp.asarray(A.diagonal())

def run(label, psolve):
    times = []
    for seed in (0, 1):
        cfg = rt.RBLConfig(seed=seed)
        t0 = time.perf_counter()
        w, V = rt.eigsh(A.astype(np.float64), k=8, M=M, sigma=0.0,
                        which="LM", tol=1e-6, inner_psolve=psolve, cfg=cfg)
        times.append(time.perf_counter() - t0)
    R = A @ V - (m[:, None] * V) * w[None, :]
    rn = float(np.linalg.norm(R, axis=0).max())
    print(json.dumps({"metric": f"vib_fem3d16_{label}_warm",
                      "value": round(times[1], 3), "unit": "s",
                      "cold_s": round(times[0], 3), "max_resid": rn}),
          flush=True)

sa = _auto_inner_psolve(A.astype(np.float64), 0.0)
run("sa_amg", sa)
run("jacobi", jacobi_psolve(dA))
PY
echo "done"
