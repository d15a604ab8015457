#!/bin/bash
# Round-3 TPU batch C: fem3d-42 end-to-end rows validated against the
# cached ARPACK 1e-7 ground truth (benchmarks/groundtruth/
# fem42_lm_k100.npz — VERDICT r2 item 4), at the round-2 tol (1e-3) and
# at the reference's own tolerance (1e-7).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

if [ -n "${WAIT_PID:-}" ]; then
  echo "waiting for pid $WAIT_PID"
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

echo "== fem3d-42 k=100 vs ARPACK ground truth =="
timeout 5400 python - <<'EOF' 2>&1 | log fem42_gt
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.utils.fem import fem_elasticity_3d

gt = np.load("benchmarks/groundtruth/fem42_lm_k100.npz")["eigenvalues"]
A = fem_elasticity_3d(42).astype(np.float32)
op = rt.as_operator(A, dtype=jnp.float32)
k, b = 100, 8

for tol in (1e-3, 1e-7):
    cfg = RBLConfig(block_size=b, basis_dtype=jnp.bfloat16,
                    compute_dtype=jnp.float32, qr_method="cholqr2",
                    tol=tol, max_kryl_dim=1400, eig_poll_cadence=16)
    if tol <= 1e-6:
        # 1e-7 ABSOLUTE residuals are beyond bf16-basis reach; use the
        # f32-basis/f32-compute pair (||A|| ~ 5.4, f32 eps*||A|| ~ 6e-7:
        # record what it honestly reaches)
        cfg = cfg.replace(basis_dtype=jnp.float32)
    best = None
    for seed in (0, 1):
        t0 = time.perf_counter()
        res = rt.rbl(op, k, b, cfg=cfg.replace(seed=seed),
                     compute_eigenvectors=True)
        float(res.eigenvectors[0, 0])
        el = time.perf_counter() - t0
        if best is None or el < best[0]:
            best = (el, res)
        if seed == 0:
            best = None  # first epoch warms compiles; keep the second
    el, res = best if best else (el, res)
    w = np.sort(np.asarray(res.eigenvalues, dtype=np.float64))[::-1]
    rel = float(np.abs((w - gt) / gt).max())
    print(json.dumps({"metric": f"fem42_k100_b8_tol{tol:g}",
                      "value": round(el, 3), "unit": "s", "tol": tol,
                      "max_rel_err_vs_arpack": rel,
                      "converged": bool(res.converged),
                      "kryl_dim": int(res.kryl_dim),
                      "arpack_cpu_s": 390.0}), flush=True)
EOF

echo "done"
