#!/bin/bash
# Round-2 follow-up TPU measurements (VERDICT r1 items 1/8/9): the
# matmul-precision triplet that separates the "highest" strictness cost
# from tunnel drift, the f64-on-TPU story, and the host-offload tier
# crossover.  Run AFTER run_tpu_queue.sh (one TPU, serialized access).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== matmul-precision triplet (same epoch, back to back) =="
for prec in highest high default; do
  echo "-- precision=$prec --"
  timeout 1800 env RBL_BENCH_PRECISION=$prec python bench.py 2>&1 | log precision
done

echo "== f64 on TPU: headline problem, f64 vs f32 (substantiates or corrects the '~10x' claim in examples/benchmark.py) =="
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

# the reference CI gate: step-decay spectrum, k=5, b=5, full f64,
# rel-err < 1e-13 (Unit Testing/step_dec.jl:4-5), n = 10^6
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

echo "== host-offload tier crossover at n=1M (basis_device_cap_cols) =="
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

echo "done — logs in benchmarks/results/tpu_${stamp}_*.log"
