#!/bin/bash
# Round-2 final TPU batch: a defensible generalized-pencil wall-clock
# (lowest vibration modes, lumped mass, sigma=0 shift-invert — the
# physically standard formulation; the 1D-FEM SA attempt was
# informationless: spread ~1e10 makes SA unreachable without a
# factorization) and the final bf16-default headline pin.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== generalized: lowest vibration modes of 3D elasticity, lumped mass =="
timeout 2400 python - <<'EOF' 2>&1 | log generalized_vib
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.utils.fem import fem_elasticity_3d

A = fem_elasticity_3d(16)            # n = 13 872, clamped -> SPD
m = np.asarray(A.sum(axis=1)).ravel()
m = np.abs(m) + 1e-3 * np.abs(m).mean()   # lumped mass, strictly positive
t0 = time.perf_counter()
w, V = rt.eigsh(A.astype(np.float64), k=8, M=rt.DiagonalOperator(
    jnp.asarray(m, jnp.float64)), sigma=0.0, which="LM", tol=1e-6)
el = time.perf_counter() - t0
# residual check against the true pencil
R = A @ V - (m[:, None] * V) * w[None, :]
rn = float(np.linalg.norm(R, axis=0).max())
print(json.dumps({"metric": "generalized_vib_fem3d16_k8_sigma0",
                  "value": round(el, 3), "unit": "s",
                  "max_resid": rn}))
EOF

echo "== final headline pin (bf16 default) =="
timeout 1800 python bench.py 2>&1 | log headline_final

echo "done"
