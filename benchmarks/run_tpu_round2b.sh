#!/bin/bash
# Round-2 second TPU batch: packed-BSR kernel validation + measurement,
# the precision triplet's missing "highest" leg, the f64 A/B resized to
# fit HBM under X64 emulation (the 512x512 attempt compiled to 29 GB and
# OOMed — tpu_20260820_0803_f64.log), and the FEM end-to-end solve.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== packed-BSR Mosaic smoke (small, fail fast if lowering breaks) =="
timeout 900 python - <<'EOF' 2>&1 | log bsr_smoke
import numpy as np
import jax.numpy as jnp
from rbl_tpu.ops.spmm.pallas_bsr import BlockSparseOperator
from rbl_tpu.utils.fem import fem_elasticity_3d

A = fem_elasticity_3d(8).astype(np.float32)
rng = np.random.default_rng(0)
X = rng.standard_normal((A.shape[0], 8)).astype(np.float32)
for bm in (16, 32, 128):
    op = BlockSparseOperator.from_scipy(A, dtype=jnp.float32, bm=bm,
                                        interpret=False)
    Y = np.asarray(op.apply(jnp.asarray(X)))
    ref = (A @ X.astype(np.float64)).astype(np.float32)
    err = float(np.abs(Y - ref).max() / np.abs(ref).max())
    print(f"bm={bm}: rel_err={err:.2e} {op.density_report()}")
    assert err < 5e-6, (bm, err)
print("PACKED_BSR_TPU_OK")
EOF

echo "== SpMM formats incl. the FEM/blocky packed-BSR cases =="
timeout 2400 python benchmarks/spmm_bench.py 2>&1 | log spmm2

echo "== precision=highest headline (completes the triplet) =="
timeout 1800 env RBL_BENCH_PRECISION=highest python bench.py 2>&1 | log precision_highest

echo "== f64 vs f32 A/B at 256x256 (fits HBM under X64Split) =="
timeout 3600 python - <<'EOF' 2>&1 | log f64_256
import json, time
import jax.numpy as jnp
import rbl_tpu as rt

for dt, name, qr in ((jnp.float32, "f32", "cholqr2"),
                     (jnp.float64, "f64", "householder")):
    op = rt.Laplacian2D(nx=256, ny=256, _dtype=dt)
    cfg = rt.RBLConfig(block_size=8, basis_dtype=dt, compute_dtype=dt,
                       qr_method=qr, tol=1e-3, max_kryl_dim=512,
                       eig_poll_cadence=16)
    rt.rbl(op, 50, cfg=cfg)  # warm epoch (compiles)
    t0 = time.perf_counter()
    res = rt.rbl(op, 50, cfg=cfg.replace(seed=1))
    float(res.eigenvectors[0, 0])
    print(json.dumps({"metric": f"lap2d_256_k50_b8_{name}",
                      "value": round(time.perf_counter() - t0, 3),
                      "unit": "s", "kryl": int(res.kryl_dim)}))
EOF

echo "== FEM elasticity end-to-end on TPU (the SuiteSparse-class row) =="
timeout 3600 python examples/benchmark.py --fem3d 42 --k 100 \
    --blocks 4,8 --tol 1e-3 --repeat 2 2>&1 | log fem42

echo "done — logs in benchmarks/results/tpu_${stamp}_*.log"
