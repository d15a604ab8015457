#!/bin/bash
# Round-3 TPU batch F: warm-epoch REDO of the SM-tier and fem16
# vibration rows (batches A/B/D ran each config cold — at f64 the XLA
# compiles are minutes and dominated the readings, e.g. auto converged at
# kryl_dim 40 yet read 464 s).  Every row here runs twice with distinct
# seeds and reports the SECOND (warm) time.  The mixed-precision inner
# tier (f32 MINRES + f64 defect correction) is active on all MINRES
# tiers — this is also its first TPU measurement.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== SM tiers, warm =="
timeout 5400 python - <<'EOF' 2>&1 | log sm_tiers3
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.ops.minres import ShiftInvertOperator

nx = 512
op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[:4]

def run(precond, inner_tol):
    si = ShiftInvertOperator.shift(op, 0.0, precond=precond,
                                   inner_tol=inner_tol)
    out = []
    for seed in (0, 1):
        cfg = RBLConfig(tol=1e-2, max_kryl_dim=512, block_size=4,
                        seed=seed)
        t0 = time.perf_counter()
        res = rt.rbl(si, 4, 4, cfg=cfg, which="LM",
                     compute_eigenvectors=True)
        w = 1.0 / np.asarray(res.eigenvalues)
        out.append((time.perf_counter() - t0, w, res))
    el, w, res = out[1]
    rel = float(np.abs((np.sort(w) - exact) / exact).max())
    print(json.dumps({"metric": f"sm_lap512_k4_{precond}_warm",
                      "value": round(el, 3), "unit": "s",
                      "cold_s": round(out[0][0], 3),
                      "max_rel_err": rel,
                      "kryl_dim": int(res.kryl_dim)}), flush=True)

run("auto", 1e-11)
run("mg", 1e-9)
run("jacobi", 1e-9)
run("none", 1e-9)
EOF

echo "== fem3d-16 vibration, warm, f32 grid-AMG + mixed inner =="
timeout 5400 python - <<'EOF' 2>&1 | log vib_amg3
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.utils.fem import fem_elasticity_3d

N = 16
A = fem_elasticity_3d(N)
m = np.asarray(A.sum(axis=1)).ravel()
m = np.abs(m) + 1e-3 * np.abs(m).mean()
M = rt.DiagonalOperator(jnp.asarray(m, jnp.float64))
t0 = time.perf_counter()
amg = rt.AssembledMultigrid.from_grid(A, (N, N + 1, N + 1), dof=3,
                                      dtype=jnp.float32)
setup = time.perf_counter() - t0
times = []
for seed in (0, 1):
    cfg = rt.RBLConfig(seed=seed)
    t0 = time.perf_counter()
    w, V = rt.eigsh(A.astype(np.float64), k=8, M=M, sigma=0.0,
                    which="LM", tol=1e-6, inner_psolve=amg.psolve,
                    cfg=cfg)
    times.append(time.perf_counter() - t0)
R = A @ V - (m[:, None] * V) * w[None, :]
rn = float(np.linalg.norm(R, axis=0).max())
print(json.dumps({"metric": "generalized_vib_fem3d16_gridamg_warm",
                  "value": round(times[1], 3), "unit": "s",
                  "cold_s": round(times[0], 3),
                  "setup_s": round(setup, 2), "max_resid": rn,
                  "r2_jacobi_s": 706.0}), flush=True)
EOF

echo "done"
