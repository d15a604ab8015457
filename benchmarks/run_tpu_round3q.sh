#!/bin/bash
# Round-3 TPU batch Q: bisect the REPRODUCIBLE f64 restarted-sweep NaN
# (non-finite T at iters 12..15 on the step-decay diagonal; CPU-clean).
# Hypotheses: (a) XLA:TPU emulated-f64 Householder QR (the f64 default)
# vs CholeskyQR; (b) the degenerate all-ones sea after the dominant
# pairs lock.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
timeout 3600 python - <<'PY' 2>&1 | log restarted_nan_bisect
import json, time, traceback
import numpy as np
import jax.numpy as jnp
import rbl_tpu as rt
from rbl_tpu.solver.restarted import rbl_restarted

n, k = 100_000, 10
d = np.ones(n)
d[: 2 * k] = (np.arange(2 * k, 0, -1)) * float(n)
A = rt.DiagonalOperator(jnp.asarray(d, jnp.float64))
exact = np.sort(d)[::-1][:k]

for label, kw in (
    ("default_householder", {}),
    ("cholqr3", dict(qr_method="cholqr3")),
    ("cholqr2", dict(qr_method="cholqr2")),
    ("f32", dict(basis_dtype=jnp.float32, compute_dtype=jnp.float32)),
):
    try:
        t0 = time.perf_counter()
        res = rbl_restarted(A, k, b=2, cfg=rt.RBLConfig(seed=0, **kw))
        el = time.perf_counter() - t0
        w = np.sort(np.asarray(res.eigenvalues))[::-1]
        rel = float(np.abs((w - exact) / exact).max())
        print(json.dumps({"metric": f"restarted_bisect_{label}",
                          "value": round(el, 3), "unit": "s",
                          "max_rel_err": rel,
                          "converged": bool(res.converged)}), flush=True)
    except Exception as e:
        print(json.dumps({"metric": f"restarted_bisect_{label}",
                          "error": str(e)[:200]}), flush=True)
PY
echo done
