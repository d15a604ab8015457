#!/bin/bash
# Round-3 TPU batch H: redos with fixes learned from batches B/C —
# tol_honest at Krylov cap 1024 (cap-1400 f64 recovery OOMed 19.25G >
# 15.75G HBM) and the restarted row with a warm epoch (the cold reading
# was compile-dominated).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== time-to-k at reference tolerance (1e-7, f64, cap 1024) =="
timeout 5400 python - <<'EOF' 2>&1 | log tol_honest2
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
                max_kryl_dim=1024, eig_poll_cadence=16, seed=0)
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:k]

def run(seed):
    t0 = time.perf_counter()
    res = rt.rbl(op, k, b, cfg=cfg.replace(seed=seed),
                 compute_eigenvectors=True)
    float(res.eigenvectors[0, 0])
    return time.perf_counter() - t0, res

el0, _ = run(0)  # warm the compile caches
best = None
for s in (1, 2):
    el, res = run(s)
    if best is None or el < best[0]:
        best = (el, res)
el, res = best
w = np.asarray(res.eigenvalues)
rel = float(np.abs((w - exact) / exact).max())
print(json.dumps({"metric": "lap2d_512_k50_b8_at_ref_tol",
                  "value": round(el, 3), "unit": "s", "tol": 1e-7,
                  "cold_s": round(el0, 3),
                  "max_rel_err": rel, "converged": bool(res.converged),
                  "kryl_dim": int(res.kryl_dim)}), flush=True)
EOF

echo "== restarted row, warm =="
timeout 3600 python - <<'EOF' 2>&1 | log restarted_row2
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
    res = rbl_restarted(A, k, b=2,
                        cfg=rt.RBLConfig(seed=seed))
    return time.perf_counter() - t0, res

def run_plain(seed):
    t0 = time.perf_counter()
    res = rt.rbl(A, k, 2, cfg=rt.RBLConfig(seed=seed))
    return time.perf_counter() - t0, res

run_restarted(0); run_plain(0)  # warm
el_r, res = run_restarted(1)
w = np.sort(np.asarray(res.eigenvalues))[::-1]
rel_r = float(np.abs((w - exact) / exact).max())
el_p, res2 = run_plain(1)
w2 = np.sort(np.asarray(res2.eigenvalues))[::-1]
rel_p = float(np.abs((w2 - exact) / exact).max())
print(json.dumps({"metric": "restarted_stepdecay_n1e5_k10_b2_warm",
                  "value": round(el_r, 3), "unit": "s",
                  "max_rel_err": rel_r,
                  "plain_s": round(el_p, 3),
                  "plain_max_rel_err": rel_p}), flush=True)
EOF

echo "done"
