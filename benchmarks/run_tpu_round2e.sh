#!/bin/bash
# Round-2 batch e: f64 retries after the contract.py X64Split fix (the
# sequential-scan gram removes the 8x split-component temps that OOMed
# both earlier attempts).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== f64 1e-13 CI gate on TPU (step decay n=1M k=5 b=5, post-fix) =="
timeout 3600 python - <<'EOF' 2>&1 | log f64gate3
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt

n, k, b = 1_000_000, 5, 5
d = np.ones(n)
d[: 2 * k] = np.arange(1, 2 * k + 1, dtype=np.float64) * n
op = rt.DiagonalOperator(jnp.asarray(d, jnp.float64))
cfg = rt.RBLConfig(block_size=b, basis_dtype=jnp.float64,
                   compute_dtype=jnp.float64, tol=1e-8, max_kryl_dim=240)
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

echo "== f64 headline size retry (512x512, post-fix) =="
timeout 3600 python - <<'EOF' 2>&1 | log f64_512
import json, time
import jax.numpy as jnp
import rbl_tpu as rt

op = rt.Laplacian2D(nx=512, ny=512, _dtype=jnp.float64)
cfg = rt.RBLConfig(block_size=8, basis_dtype=jnp.float64,
                   compute_dtype=jnp.float64, qr_method="householder",
                   tol=1e-3, max_kryl_dim=768, eig_poll_cadence=16)
rt.rbl(op, 50, cfg=cfg)  # warm epoch
t0 = time.perf_counter()
res = rt.rbl(op, 50, cfg=cfg.replace(seed=1))
float(res.eigenvectors[0, 0])
print(json.dumps({"metric": "lap2d_512_k50_b8_f64", "value":
                  round(time.perf_counter() - t0, 3), "unit": "s",
                  "kryl": int(res.kryl_dim)}))
EOF

echo "== generalized pencil bench re-spec: SA end (the LA end of a 1D FEM pencil clusters at rel gaps ~1/n^2 and cannot converge at any reasonable cap — measured 540 s unconverged; SA is the physically meaningful end: lowest vibration modes) =="
timeout 1800 python - <<'EOF2' 2>&1 | log generalized_sa
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
res = rt.rbl_generalized(A, M, 16, cfg=cfg, which="SA")
el = time.perf_counter() - t0
exact = (np.pi * np.arange(1, 17)) ** 2  # lowest modes of -u'' = l u
rel = float(np.max(np.abs(np.sort(res.eigenvalues) - exact) / exact))
print(json.dumps({"metric": "generalized_fem1d_262k_k16_sa", "value":
                  round(el, 3), "unit": "s",
                  "converged": bool(res.converged), "max_rel_err": rel}))
EOF2

echo "done"
