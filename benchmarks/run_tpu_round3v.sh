#!/bin/bash
# Round-3 TPU batch V: bisect the TPU-vs-CPU f32 residual divergence
# (NEXT item 3).  The f32 vibration pipeline reaches 3.5e-6 max resid on
# CPU but only 1.3e-4 on TPU at identical math (batch J).  Suspects: the
# MXU's 3-pass-bf16 "high" rounding inside CholeskyQR2 / the inner-MINRES
# recurrences.  Legs pin one variable each; all report the same residual.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

timeout 5400 python - <<'PY' 2>&1 | log f32_divergence_bisect
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.utils.fem import fem_elasticity_3d
from rbl_tpu.utils.probe import wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
N = 16
A = fem_elasticity_3d(N)
m = np.asarray(A.sum(axis=1)).ravel()
m = np.abs(m) + 1e-3 * np.abs(m).mean()
M = rt.DiagonalOperator(jnp.asarray(m, jnp.float64))
amg = rt.AssembledMultigrid.from_grid(A, (N, N + 1, N + 1), dof=3,
                                      dtype=jnp.float32)

legs = [
    ("control_high_cholqr2", dict()),
    ("highest_precision", dict(matmul_precision="highest")),
    ("householder_qr", dict(qr_method="householder")),
    ("highest_householder", dict(matmul_precision="highest",
                                 qr_method="householder")),
]
for name, over in legs:
    try:
        cfg = rt.RBLConfig(basis_dtype=jnp.float32,
                           compute_dtype=jnp.float32, seed=0, **over)
        t0 = time.perf_counter()
        w, V = rt.eigsh(A.astype(np.float64), k=8, M=M, sigma=0.0,
                        which="LM", tol=1e-6, inner_psolve=amg.psolve,
                        cfg=cfg)
        el = time.perf_counter() - t0
        R = A @ V - (m[:, None] * V) * w[None, :]
        rn = float(np.linalg.norm(R, axis=0).max())
        print(json.dumps({"metric": f"f32_divergence_{name}",
                          "value": round(el, 3), "unit": "s",
                          "max_resid": rn, "cpu_resid": 3.5e-6,
                          "tpu_control_resid": 1.3e-4}), flush=True)
    except Exception as e:
        print(json.dumps({"metric": f"f32_divergence_{name}",
                          "error": repr(e)[:200]}), flush=True)
PY
echo "done"
