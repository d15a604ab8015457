#!/bin/bash
# Round-3 TPU batch A: the two preconditioner-tier verdicts.
# 1) 512² SM solve — precond auto (now exact FDM) vs mg (new separable
#    V-cycle) vs jacobi vs none: VERDICT r2 item 1's "done" row.
# 2) fem3d-16 vibration solve with the grid-AMG inner preconditioner
#    (round-2 number: 706 s under scalar Jacobi): VERDICT item 2.
# 3) headline sanity pin (bench.py unchanged).
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }

echo "== probe: worker alive =="
timeout 240 python - <<'EOF' 2>&1 | log probe
import jax, jax.numpy as jnp
x = jnp.ones((128, 128), jnp.float32)
y = (x @ x)
print("probe ok", float(y[0, 0]), jax.devices())
EOF

echo "== SM 512^2: auto(FDM) / mg / jacobi / none =="
timeout 3000 python - <<'EOF' 2>&1 | log sm_tiers
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt

nx = 512
op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
exact = np.sort(np.add.outer(ev1, ev1).ravel())[:4]

from rbl_tpu.ops.minres import ShiftInvertOperator, default_inner_tol

def run(precond):
    t0 = time.perf_counter()
    si = ShiftInvertOperator.shift(
        op, 0.0, precond=precond,
        inner_tol=default_inner_tol(op.dtype, 1e-6),
    )
    res = rt.rbl(si, 4, 4, which="LM", compute_eigenvectors=True)
    w = 1.0 / np.asarray(res.eigenvalues)
    # value fetch = the only honest sync on this backend
    el = time.perf_counter() - t0
    rel = float(np.abs((np.sort(w) - exact) / exact).max())
    print(json.dumps({"metric": f"sm_lap512_k4_{precond}",
                      "value": round(el, 3), "unit": "s",
                      "max_rel_err": rel}), flush=True)

for precond in ("auto", "mg", "jacobi", "none"):
    run(precond)
EOF

echo "== fem3d-16 vibration with grid-AMG inner preconditioner =="
timeout 3000 python - <<'EOF' 2>&1 | log generalized_vib_amg
import json, time
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.utils.fem import fem_elasticity_3d

N = 16
A = fem_elasticity_3d(N)
m = np.asarray(A.sum(axis=1)).ravel()
m = np.abs(m) + 1e-3 * np.abs(m).mean()
M = rt.DiagonalOperator(jnp.asarray(m, jnp.float64))
t0 = time.perf_counter()
amg = rt.AssembledMultigrid.from_grid(A, (N, N + 1, N + 1), dof=3)
setup = time.perf_counter() - t0
t0 = time.perf_counter()
w, V = rt.eigsh(A.astype(np.float64), k=8, M=M, sigma=0.0, which="LM",
                tol=1e-6, inner_psolve=amg.psolve)
el = time.perf_counter() - t0
R = A @ V - (m[:, None] * V) * w[None, :]
rn = float(np.linalg.norm(R, axis=0).max())
print(json.dumps({"metric": "generalized_vib_fem3d16_k8_sigma0_gridamg",
                  "value": round(el, 3), "unit": "s",
                  "setup_s": round(setup, 2), "max_resid": rn,
                  "r2_jacobi_s": 706.0}), flush=True)
EOF

echo "== headline sanity =="
timeout 1800 python bench.py 2>&1 | log headline_r3a

echo "done"
