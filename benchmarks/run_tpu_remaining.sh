#!/bin/bash
# Round-2: the measurements queue 1 never reached (it died inside the n=1M
# run when the tunnel dropped on 2026-08-19) plus all of queue 2.
# Run from the repo root when the tunnel is up.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== matmul-precision triplet (same epoch, back to back; VERDICT r1 weak#1) =="
for prec in highest high default; do
  echo "-- precision=$prec --" 2>&1 | log precision
  timeout 1200 env RBL_BENCH_PRECISION=$prec python bench.py 2>&1 | log precision
done

echo "== n=1M headline variant =="
timeout 1800 python - <<'EOF' 2>&1 | log n1m
import json, time
import jax.numpy as jnp
import rbl_tpu as rt

op = rt.Laplacian2D(nx=1024, ny=1024, _dtype=jnp.float32)
cfg = rt.RBLConfig(block_size=8, basis_dtype=jnp.float32,
                   compute_dtype=jnp.float32, qr_method="cholqr2",
                   tol=1e-3, max_kryl_dim=768, eig_poll_cadence=16)
rt.rbl(op, 50, cfg=cfg)  # warm epoch (compiles)
t0 = time.perf_counter()
res = rt.rbl(op, 50, cfg=cfg.replace(seed=1))
float(res.eigenvectors[0, 0])
print(json.dumps({"metric": "lap2d_1024_k50_b8_f32", "value":
                  round(time.perf_counter() - t0, 3), "unit": "s"}))
EOF

echo "== host-offload tier crossover at n=1M (basis_device_cap_cols; VERDICT r1 item 9) =="
timeout 3600 python - <<'EOF' 2>&1 | log offload
import json, time
import jax.numpy as jnp
import rbl_tpu as rt

op = rt.Laplacian2D(nx=1024, ny=1024, _dtype=jnp.float32)
base = rt.RBLConfig(block_size=8, basis_dtype=jnp.float32,
                    compute_dtype=jnp.float32, qr_method="cholqr2",
                    tol=1e-3, max_kryl_dim=768, eig_poll_cadence=16)
for cap, name in ((None, "fused_all_device"), (384, "offload_cap384"),
                  (192, "offload_cap192")):
    cfg = base.replace(basis_device_cap_cols=cap)
    rt.rbl(op, 50, cfg=cfg)  # warm epoch
    t0 = time.perf_counter()
    res = rt.rbl(op, 50, cfg=cfg.replace(seed=1))
    float(res.eigenvectors[0, 0])
    print(json.dumps({"metric": f"lap2d_1024_k50_b8_{name}",
                      "value": round(time.perf_counter() - t0, 3),
                      "unit": "s", "kryl": int(res.kryl_dim)}))
EOF

echo "== f64 on TPU: headline problem, f64 vs f32 (VERDICT r1 item 8) =="
timeout 3600 python - <<'EOF' 2>&1 | log f64
import json, time
import jax.numpy as jnp
import rbl_tpu as rt

for dt, name, qr in ((jnp.float32, "f32", "cholqr2"),
                     (jnp.float64, "f64", "householder")):
    op = rt.Laplacian2D(nx=512, ny=512, _dtype=dt)
    cfg = rt.RBLConfig(block_size=8, basis_dtype=dt, compute_dtype=dt,
                       qr_method=qr, tol=1e-3, max_kryl_dim=768,
                       eig_poll_cadence=16)
    rt.rbl(op, 50, cfg=cfg)  # warm epoch (compiles)
    t0 = time.perf_counter()
    res = rt.rbl(op, 50, cfg=cfg.replace(seed=1))
    float(res.eigenvectors[0, 0])
    print(json.dumps({"metric": f"lap2d_512_k50_b8_{name}",
                      "value": round(time.perf_counter() - t0, 3),
                      "unit": "s"}))
EOF

echo "== f64 1e-13 CI-gate configuration on TPU (reference step_decay size) =="
timeout 3600 python - <<'EOF' 2>&1 | log f64gate
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt

n, k, b = 1_000_000, 5, 5
d = np.ones(n)
d[: 2 * k] = np.arange(1, 2 * k + 1, dtype=np.float64) * n
op = rt.DiagonalOperator(jnp.asarray(d, jnp.float64))
cfg = rt.RBLConfig(block_size=b, basis_dtype=jnp.float64,
                   compute_dtype=jnp.float64, tol=1e-8)
rt.rbl(op, k, cfg=cfg)  # warm epoch
t0 = time.perf_counter()
res = rt.rbl(op, k, cfg=cfg.replace(seed=1))
float(res.eigenvectors[0, 0])
el = time.perf_counter() - t0
rel = float(np.max(np.abs((res.eigenvalues - np.sort(d)[::-1][:k])
                          / np.sort(d)[::-1][:k])))
print(json.dumps({"metric": "f64_gate_step_1M_k5_b5", "value": round(el, 3),
                  "unit": "s", "max_rel_err": rel,
                  "gate_1e13": bool(rel < 1e-13)}))
EOF

echo "== interior shift-invert wall clock (Jacobi-PMINRES vs none) =="
timeout 1800 python - <<'EOF' 2>&1 | log shift_invert
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.ops.minres import ShiftInvertOperator

n = 1 << 20
d = np.logspace(0, 6, n).astype(np.float32)
op = rt.DiagonalOperator(jnp.asarray(d))
rng = np.random.default_rng(0)
B = jnp.asarray(rng.standard_normal((n, 8)), jnp.float32)
for pc in ("jacobi", "none"):
    si = ShiftInvertOperator.shift(op, 513.7, inner_tol=1e-6, precond=pc)
    float(si.apply(B)[0, 0])  # warm/compile
    t0 = time.perf_counter()
    float(si.apply(B * 1.000001)[0, 0])
    print(json.dumps({"metric": f"shift_invert_1M_b8_{pc}",
                      "value": round(time.perf_counter() - t0, 3),
                      "unit": "s"}))
EOF

echo "== generalized pencil (mode 3) on TPU: FEM-shaped tridiag mass =="
timeout 1800 python - <<'EOF' 2>&1 | log generalized
import json, time
import numpy as np
import scipy.sparse as sp
import jax.numpy as jnp
import rbl_tpu as rt

n = 1 << 18
h = 1.0 / (n + 1)
A = sp.diags([-1.0, 2.0, -1.0], [-1, 0, 1], shape=(n, n)).tocsr() / h
M = sp.diags([1.0, 4.0, 1.0], [-1, 0, 1], shape=(n, n)).tocsr() * (h / 6)
cfg = rt.RBLConfig(block_size=8, basis_dtype=jnp.float32,
                   compute_dtype=jnp.float32, tol=1e-3, max_kryl_dim=512)
t0 = time.perf_counter()
res = rt.rbl_generalized(A, M, 16, cfg=cfg, which="LA")
el = time.perf_counter() - t0
print(json.dumps({"metric": "generalized_fem1d_262k_k16", "value":
                  round(el, 3), "unit": "s",
                  "converged": bool(res.converged)}))
EOF

echo "done — logs in benchmarks/results/tpu_${stamp}_*.log"
