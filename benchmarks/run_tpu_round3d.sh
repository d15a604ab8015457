#!/bin/bash
# Round-3 TPU batch D: does the AUTO-built SA-AMG (COO transfers) beat
# plain Jacobi on TPU for the assembled vibration solve?  The auto-build
# fires for any scipy-sparse eigsh(sigma=...) operand, so a TPU
# regression here would mean gating it by backend.  Control: the same
# solve with inner_psolve explicitly disabled (jacobi default).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== fem3d-16 vibration: auto SA-AMG vs jacobi control =="
timeout 4800 python - <<'EOF' 2>&1 | log vib_sa_vs_jacobi
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.compat import _auto_inner_psolve
from rbl_tpu.ops.minres import jacobi_psolve
from rbl_tpu.utils.fem import fem_elasticity_3d

N = 16
A = fem_elasticity_3d(N)
m = np.asarray(A.sum(axis=1)).ravel()
m = np.abs(m) + 1e-3 * np.abs(m).mean()
M = rt.DiagonalOperator(jnp.asarray(m, jnp.float64))

def run(label, psolve):
    t0 = time.perf_counter()
    w, V = rt.eigsh(A.astype(np.float64), k=8, M=M, sigma=0.0,
                    which="LM", tol=1e-6, inner_psolve=psolve)
    el = time.perf_counter() - t0
    R = A @ V - (m[:, None] * V) * w[None, :]
    rn = float(np.linalg.norm(R, axis=0).max())
    print(json.dumps({"metric": f"generalized_vib_fem3d16_{label}",
                      "value": round(el, 3), "unit": "s",
                      "max_resid": rn}), flush=True)

t0 = time.perf_counter()
sa = _auto_inner_psolve(A.astype(np.float64), 0.0)
print(f"SA-AMG setup {time.perf_counter()-t0:.1f}s", flush=True)
run("sa_amg", sa)
# jacobi control: pass a do-jacobi psolve explicitly so _auto doesn't fire
dA = jnp.asarray(A.diagonal(), jnp.float64)
run("jacobi_ctrl", jacobi_psolve(dA))
EOF

echo "done"
