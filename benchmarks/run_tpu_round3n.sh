#!/bin/bash
# Round-3 TPU batch N: re-run the two legs poisoned by the post-OOM
# worker state (it silently returns garbage for a while after a crash —
# batches H/I hit FloatingPointError on problems that are clean on CPU).
# Each leg is gated on a VALUE-CHECKED probe with retry.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

probe() {
python - <<'PY'
import sys, time
import numpy as np
import jax, jax.numpy as jnp
for attempt in range(12):
    try:
        x = jnp.ones((128, 128), jnp.float32)
        v = float((x @ x)[7, 11])
        d = jnp.asarray(np.arange(1.0, 101.0))
        s = float(jnp.sum(d * d))
        if abs(v - 128.0) < 1e-3 and abs(s - 338350.0) < 1.0:
            print("probe ok", flush=True); sys.exit(0)
        print(f"probe BAD values ({v}, {s}) attempt {attempt}", flush=True)
    except Exception as e:
        print(f"probe error attempt {attempt}: {e}", flush=True)
    time.sleep(60)
sys.exit(1)
PY
}

echo "== restarted row, warm (retry) =="
probe 2>&1 | log probe_n1
timeout 3600 python - <<'PY' 2>&1 | log restarted_row3
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.solver.restarted import rbl_restarted

n, k = 100_000, 10
d = np.ones(n)
d[: 2 * k] = (np.arange(2 * k, 0, -1)) * float(n)
A = rt.DiagonalOperator(jnp.asarray(d, jnp.float64))
exact = np.sort(d)[::-1][:k]

def run_restarted(seed):
    t0 = time.perf_counter()
    res = rbl_restarted(A, k, b=2, cfg=rt.RBLConfig(seed=seed))
    return time.perf_counter() - t0, res

def run_plain(seed):
    t0 = time.perf_counter()
    res = rt.rbl(A, k, 2, cfg=rt.RBLConfig(seed=seed))
    return time.perf_counter() - t0, res

run_restarted(0); run_plain(0)
el_r, res = run_restarted(1)
w = np.sort(np.asarray(res.eigenvalues))[::-1]
rel_r = float(np.abs((w - exact) / exact).max())
el_p, res2 = run_plain(1)
w2 = np.sort(np.asarray(res2.eigenvalues))[::-1]
rel_p = float(np.abs((w2 - exact) / exact).max())
print(json.dumps({"metric": "restarted_stepdecay_n1e5_k10_b2_warm",
                  "value": round(el_r, 3), "unit": "s",
                  "max_rel_err": rel_r, "plain_s": round(el_p, 3),
                  "plain_max_rel_err": rel_p}), flush=True)
PY

echo "== fem42 restarted (retry) =="
probe 2>&1 | log probe_n2
timeout 5400 python - <<'PY' 2>&1 | log fem42_restarted2
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.solver.restarted import rbl_restarted
from rbl_tpu.utils.fem import fem_elasticity_3d

gt = np.load("benchmarks/groundtruth/fem42_lm_k100.npz")["eigenvalues"]
A = fem_elasticity_3d(42).astype(np.float32)
op = rt.as_operator(A, dtype=jnp.float32)
cfg = RBLConfig(block_size=8, basis_dtype=jnp.float32,
                compute_dtype=jnp.float32, qr_method="cholqr2",
                tol=1e-5, restart_kryl_dim=384, eig_poll_cadence=16)
t0 = time.perf_counter()
res = rbl_restarted(op, 100, b=8, cfg=cfg, max_restarts=60)
el = time.perf_counter() - t0
w = np.sort(np.asarray(res.eigenvalues, dtype=np.float64))[::-1]
kk = min(len(w), 100)
rel = float(np.abs((w[:kk] - gt[:kk]) / gt[:kk]).max())
print(json.dumps({"metric": "fem42_k100_restarted_ncv384_tol1e-5",
                  "value": round(el, 3), "unit": "s",
                  "max_rel_err_vs_arpack": rel, "locked": int(len(w)),
                  "converged": bool(res.converged),
                  "arpack_cpu_s": 390.0}), flush=True)
PY
echo done
