#!/bin/bash
# Round-3 TPU batch J: full-f32 pipelines for tol ≥ 1e-6 solves.  The
# f64 outer sweep is X64-emulated on TPU (no native f64) — at tol 1e-6
# the f32 outer + exact/refined inner reaches the same residuals
# (CPU-verified: 3.49e-6 vs 3.65e-6) with native-speed compute and far
# smaller XLA programs.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== fem3d-16 vibration, f32 outer + f32 grid-AMG, warm =="
timeout 4800 python - <<'EOF' 2>&1 | log vib_f32
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
amg = rt.AssembledMultigrid.from_grid(A, (N, N + 1, N + 1), dof=3,
                                      dtype=jnp.float32)
times = []
for seed in (0, 1):
    cfg = rt.RBLConfig(basis_dtype=jnp.float32,
                       compute_dtype=jnp.float32, seed=seed)
    t0 = time.perf_counter()
    w, V = rt.eigsh(A.astype(np.float64), k=8, M=M, sigma=0.0,
                    which="LM", tol=1e-6, inner_psolve=amg.psolve,
                    cfg=cfg)
    times.append(time.perf_counter() - t0)
R = A @ V - (m[:, None] * V) * w[None, :]
rn = float(np.linalg.norm(R, axis=0).max())
print(json.dumps({"metric": "generalized_vib_fem3d16_f32_gridamg_warm",
                  "value": round(times[1], 3), "unit": "s",
                  "cold_s": round(times[0], 3), "max_resid": rn,
                  "r2_jacobi_s": 706.0}), flush=True)
EOF

echo "== SM 512^2, f32 outer + FDM, warm =="
timeout 3600 python - <<'EOF' 2>&1 | log sm_f32
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.ops.minres import ShiftInvertOperator

nx = 512
op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float32)
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[:4]
si = ShiftInvertOperator.shift(op, 0.0)  # auto -> fdm (f32 exact-ish)
out = []
for seed in (0, 1):
    cfg = RBLConfig(tol=1e-2, max_kryl_dim=512, block_size=4,
                    basis_dtype=jnp.float32, compute_dtype=jnp.float32,
                    seed=seed)
    t0 = time.perf_counter()
    res = rt.rbl(si, 4, 4, cfg=cfg, which="LM", compute_eigenvectors=True)
    w = 1.0 / np.asarray(res.eigenvalues)
    out.append((time.perf_counter() - t0, w, res))
el, w, res = out[1]
rel = float(np.abs((np.sort(w) - exact) / exact).max())
print(json.dumps({"metric": "sm_lap512_k4_f32_fdm_warm",
                  "value": round(el, 3), "unit": "s",
                  "cold_s": round(out[0][0], 3), "max_rel_err": rel,
                  "kryl_dim": int(res.kryl_dim)}), flush=True)
EOF

echo "done"
