#!/bin/bash
# Round-3 TPU batch R: pinpoint the TPU-only restarted-sweep NaN — the
# failing program is the sweep chunk WITH the lock-deflation branch
# (lock_basis != None); the plain chunk is clean on the same operator.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
timeout 3600 python - <<'PY' 2>&1 | log lock_chunk_bisect
import json
import numpy as np
import jax, jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.solver.lanczos import _sweep_chunk
from rbl_tpu.utils.fem import fem_elasticity_3d

A = fem_elasticity_3d(16).astype(np.float32)
op = rt.as_operator(A, dtype=jnp.float32)
n, b = A.shape[0], 8
rng = np.random.default_rng(0)
Qi = jnp.asarray(np.linalg.qr(rng.standard_normal((n, b)))[0], jnp.float32)
Qp = jnp.asarray(np.linalg.qr(rng.standard_normal((n, b)))[0], jnp.float32)
Bi = jnp.asarray(rng.standard_normal((b, b)), jnp.float32)
basis = jnp.zeros((n, 128), jnp.float32)

def chunk(lock, qr):
    fn = jax.jit(lambda *a: _sweep_chunk(
        op, *a, cdt=jnp.dtype(jnp.float32), qr_method=qr, nsteps=4,
        reorth_pattern=(True, False, True, False), loc_passes=2,
    ), static_argnames=())
    out = fn(basis, Qi, Qp, Bi, jnp.int32(0), lock)
    TB = np.asarray(out[4])
    return bool(np.isfinite(TB).all()), bool(
        np.isfinite(np.asarray(out[1])).all())

for label, lock, qr in (
    ("no_lock_cholqr2", None, "cholqr2"),
    ("lock100_cholqr2", jnp.zeros((n, 100), jnp.float32), "cholqr2"),
    ("lock8_cholqr2", jnp.zeros((n, 8), jnp.float32), "cholqr2"),
    ("lock100_householder", jnp.zeros((n, 100), jnp.float32),
     "householder"),
):
    try:
        tb_ok, q_ok = chunk(lock, qr)
        print(json.dumps({"metric": f"lockchunk_{label}",
                          "TB_finite": tb_ok, "Q_finite": q_ok}),
              flush=True)
    except Exception as e:
        print(json.dumps({"metric": f"lockchunk_{label}",
                          "error": str(e)[:160]}), flush=True)

# the restarted entry's start path: deflate + block_qr
from rbl_tpu.ops.qr import block_qr
from rbl_tpu.ops.reorth import deflate

lock = jnp.zeros((n, 100), jnp.float32)
Qd = deflate(lock, Qi.astype(jnp.float32))
Qq, _ = block_qr(Qd, method="cholqr2")
print(json.dumps({"metric": "start_deflate_qr",
                  "finite": bool(np.isfinite(np.asarray(Qq)).all())}),
      flush=True)
PY
echo done
