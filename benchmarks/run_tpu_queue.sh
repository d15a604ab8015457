#!/bin/bash
# One-shot queue of every real-TPU measurement, for when the axon tunnel is
# reachable (it drops for hours at a time — CLAUDE.md gotchas).  Each step
# is timeboxed; output tees to benchmarks/results/.  Run from the repo root.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== headline (bench.py) =="
timeout 1800 python bench.py 2>&1 | log headline

echo "== headline A/B: adaptive full-scrub cadence (stretch 4) =="
timeout 1800 env RBL_BENCH_ADAPTIVE=4 python bench.py 2>&1 | log headline_adaptive

echo "== headline A/B: Chebyshev-filtered solver =="
timeout 1800 env RBL_BENCH_FILTERED=1 python bench.py 2>&1 | log headline_filtered

echo "== SpMM formats incl. HYB/COO skew case =="
timeout 1800 python benchmarks/spmm_bench.py 2>&1 | log spmm

echo "== solver block-size sweep (reference benchmark.jl:29-36 config) =="
timeout 3600 python benchmarks/solver_bench.py --blocks 1,2,4,8 2>&1 | log solver

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
# fresh seed: byte-identical re-runs can be served from a backend cache
t0 = time.perf_counter()
res = rt.rbl(op, 50, cfg=cfg.replace(seed=1))
float(res.eigenvectors[0, 0])
print(json.dumps({"metric": "lap2d_1024_k50_b8_f32", "value":
                  round(time.perf_counter() - t0, 3), "unit": "s"}))
EOF

echo "== interior shift-invert: Jacobi-PMINRES vs none (iteration counts are platform-independent; this times the TPU wall clock) =="
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
