#!/bin/bash
# Round-3 TPU batch E: DIAGNOSE the grid-AMG slowdown on TPU (1243 s end
# to end vs 78 s on CPU).  Times each piece in isolation: the level-0
# operator apply, one V-cycle, one preconditioned inner MINRES solve —
# in f64 and with an f32 cycle — plus the router's format choice.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== grid-AMG piecewise timing =="
timeout 3000 python - <<'EOF' 2>&1 | log amg_diag
import json, time
import numpy as np
import jax, jax.numpy as jnp
import rbl_tpu as rt
from benchmarks.spmm_bench import time_apply
from rbl_tpu.ops.minres import block_minres, jacobi_psolve
from rbl_tpu.ops.spmm.operator import as_operator
from rbl_tpu.utils.fem import fem_elasticity_3d

N = 16
A = fem_elasticity_3d(N)
n = A.shape[0]
rng = np.random.default_rng(0)

for dt_label, dt in (("f64", jnp.float64), ("f32", jnp.float32)):
    op = as_operator(A, dtype=dt)
    print(f"[{dt_label}] router chose: {type(op).__name__}", flush=True)
    X = jnp.asarray(rng.standard_normal((n, 8)), dtype=dt)
    t = time_apply(op, X, 30)
    print(json.dumps({"metric": f"fem16_apply_{dt_label}",
                      "value": round(t * 1e3, 3), "unit": "ms"}),
          flush=True)
    amg = rt.AssembledMultigrid.from_grid(A, (N, N + 1, N + 1), dof=3,
                                          dtype=dt)
    # one jitted psolve, chained reps (same anti-caching discipline)
    ps = amg.psolve
    def run_ps(r):
        y = X
        t0 = time.perf_counter()
        for _ in range(r):
            y = ps(y)
        float(y[0, 0])
        return time.perf_counter() - t0
    run_ps(1)
    lo = min(run_ps(5) for _ in range(3))
    hi = min(run_ps(20) for _ in range(3))
    print(json.dumps({"metric": f"fem16_vcycle_{dt_label}",
                      "value": round((hi - lo) / 15 * 1e3, 3),
                      "unit": "ms"}), flush=True)
    # one inner MINRES solve at the production inner tol
    t0 = time.perf_counter()
    Y, (it, _) = block_minres(op.apply, X, shift=jnp.asarray(0.0, dt),
                              tol=1e-11 if dt_label == "f64" else 2e-6,
                              psolve=ps, maxiter=2000)
    float(Y[0, 0])
    el1 = time.perf_counter() - t0  # includes compile
    t0 = time.perf_counter()
    Y, (it, _) = block_minres(op.apply, X + jnp.asarray(1e-6, dt),
                              shift=jnp.asarray(0.0, dt),
                              tol=1e-11 if dt_label == "f64" else 2e-6,
                              psolve=ps, maxiter=2000)
    float(Y[0, 0])
    el2 = time.perf_counter() - t0  # warm
    print(json.dumps({"metric": f"fem16_inner_minres_amg_{dt_label}",
                      "cold_s": round(el1, 2), "warm_s": round(el2, 2),
                      "iters": int(it)}), flush=True)
    # jacobi control warm
    jp = jacobi_psolve(op.diagonal())
    block_minres(op.apply, X, shift=jnp.asarray(0.0, dt),
                 tol=1e-11 if dt_label == "f64" else 2e-6,
                 psolve=jp, maxiter=20000)
    t0 = time.perf_counter()
    Y, (itj, _) = block_minres(op.apply, X + jnp.asarray(1e-6, dt),
                               shift=jnp.asarray(0.0, dt),
                               tol=1e-11 if dt_label == "f64" else 2e-6,
                               psolve=jp, maxiter=20000)
    float(Y[0, 0])
    print(json.dumps({"metric": f"fem16_inner_minres_jacobi_{dt_label}",
                      "warm_s": round(time.perf_counter() - t0, 2),
                      "iters": int(itj)}), flush=True)
EOF

echo "done"
