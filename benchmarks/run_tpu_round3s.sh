#!/bin/bash
# Round-3 TPU batch S: at-reference-tolerance row that FITS f64 HBM —
# 256² k=50 tol 1e-7 cap 1400 (the 512² variant needs kryl > 832, which
# OOMs under X64; honest gap documented).  ARPACK CPU control cached at
# benchmarks/groundtruth/lap256_lm_k50_arpack.npz.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
timeout 5400 python - <<'PY' 2>&1 | log tol_honest_256
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.config import RBLConfig

nx = 256
k, b = 50, 8
op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
cfg = RBLConfig(block_size=b, basis_dtype=jnp.float64,
                compute_dtype=jnp.float64, tol=1e-7,
                max_kryl_dim=1400, eig_poll_cadence=16, seed=0)
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:k]

def run(seed):
    t0 = time.perf_counter()
    res = rt.rbl(op, k, b, cfg=cfg.replace(seed=seed),
                 compute_eigenvectors=True)
    float(res.eigenvectors[0, 0])
    return time.perf_counter() - t0, res

el0, _ = run(0)
el, res = run(1)
w = np.asarray(res.eigenvalues)
rel = float(np.abs((w - exact) / exact).max())
out = {"metric": "lap2d_256_k50_b8_at_ref_tol", "value": round(el, 3),
       "unit": "s", "tol": 1e-7, "cold_s": round(el0, 3),
       "max_rel_err": rel, "converged": bool(res.converged),
       "kryl_dim": int(res.kryl_dim)}
try:
    z = np.load("benchmarks/groundtruth/lap256_lm_k50_arpack.npz")
    out["arpack_cpu_s"] = round(float(z["wall_seconds"]), 1)
    out["max_rel_err_vs_arpack"] = float(
        np.abs((w - z["eigenvalues"]) / z["eigenvalues"]).max())
except Exception:
    pass
print(json.dumps(out), flush=True)
PY
echo done
