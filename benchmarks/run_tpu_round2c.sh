#!/bin/bash
# Round-2 third TPU batch: bf16-basis headline A/B (the next traffic-cut
# candidate after adaptive/filtered measured no-win) and the f64 1e-13
# gate retry with a footprint that fits (the first attempt exceeded HBM
# by 441 MB at the default Krylov cap — tpu_20260820_0803_f64gate.log).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== headline A/B: bf16 basis storage (halves full-scrub reads) =="
timeout 1800 env RBL_BENCH_BASIS=bf16 python bench.py 2>&1 | log basis_bf16

echo "== headline control (same epoch, f32 basis) =="
timeout 1800 python bench.py 2>&1 | log basis_f32_control

echo "== f64 1e-13 CI gate on TPU, HBM-sized (step decay n=1M k=5 b=5) =="
timeout 3600 python - <<'EOF' 2>&1 | log f64gate2
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt

n, k, b = 1_000_000, 5, 5
d = np.ones(n)
d[: 2 * k] = np.arange(1, 2 * k + 1, dtype=np.float64) * n
op = rt.DiagonalOperator(jnp.asarray(d, jnp.float64))
cfg = rt.RBLConfig(block_size=b, basis_dtype=jnp.float64,
                   compute_dtype=jnp.float64, tol=1e-8,
                   max_kryl_dim=240, pipeline_depth=1)
rt.rbl(op, k, cfg=cfg)  # warm epoch
t0 = time.perf_counter()
res = rt.rbl(op, k, cfg=cfg.replace(seed=1))
float(res.eigenvectors[0, 0])
el = time.perf_counter() - t0
exact = np.sort(d)[::-1][:k]
rel = float(np.max(np.abs((res.eigenvalues - exact) / exact)))
print(json.dumps({"metric": "f64_gate_step_1M_k5_b5", "value": round(el, 3),
                  "unit": "s", "max_rel_err": rel,
                  "gate_1e13": bool(rel < 1e-13)}))
EOF

echo "== interior shift-invert wall clock (retry: worker crash ate the first run) =="
timeout 1800 python - <<'EOF2' 2>&1 | log shift_invert2
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
EOF2

echo "== generalized pencil (mode 3) on TPU (retry) =="
timeout 1800 python - <<'EOF2' 2>&1 | log generalized2
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
EOF2

echo "== SpMM formats rerun (incremental row printing; first attempt lost its timings to the timebox during the 3.4 GB bsr128-blocky transfer) =="
timeout 3600 python benchmarks/spmm_bench.py 2>&1 | log spmm3

echo "done — logs in benchmarks/results/tpu_${stamp}_*.log"
