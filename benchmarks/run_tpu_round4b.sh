#!/bin/bash
# Round-4 TPU batch B: AOT executable serialization probe (NEXT item 1 /
# VERDICT r3 item 3).  The jax persistent compilation cache is bypassed by
# the axon remote-AOT compile path (batch P, round 3); this probes the
# EXPLICIT route — jax.jit(f).lower(x).compile() + serialize_executable —
# which hands the backend a finished executable.  Process A compiles,
# serializes, runs; process B (fresh interpreter) deserializes and runs.
# If B's time-to-first-result << A's compile time, utils/aot.py earns a
# real disk cache; if the axon backend refuses deserialization, that is
# the recorded ceiling for the one-shot story.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi

BLOB=/tmp/rbl_aot_probe.pkl
rm -f "$BLOB"

echo "== process A: compile + serialize =="
timeout 3600 python - "$BLOB" <<'PY' 2>&1 | log aot_probe_a
import json, pickle, sys, time
import numpy as np
import jax
import jax.numpy as jnp
import rbl_tpu as rt
from jax.experimental import serialize_executable as se
from rbl_tpu.utils.probe import wait_until_healthy

assert wait_until_healthy(attempts=20, sleep_s=60), "worker never recovered"
blob_path = sys.argv[1]

# an emulated-f64 program of solver shape: filter-like SpMM chain on the
# 256^2 Laplacian — the X64-split makes the compile expensive, which is
# exactly the cost the cache must erase
op = rt.Laplacian2D(nx=256, ny=256, _dtype=jnp.float64)

def body(X):
    def step(i, Y):
        Z = op.apply(Y)
        return Z / jnp.linalg.norm(Z[:1024])
    return jax.lax.fori_loop(0, 50, step, X)

X = jnp.ones((256 * 256, 82), jnp.float64)
t0 = time.perf_counter()
lowered = jax.jit(body).lower(X)
compiled = lowered.compile()
t_compile = time.perf_counter() - t0
t0 = time.perf_counter()
y = compiled(X)
float(y[0, 0])
t_run = time.perf_counter() - t0
t0 = time.perf_counter()
try:
    blob = se.serialize(compiled)
    with open(blob_path, "wb") as f:
        pickle.dump(blob, f)
    t_ser = time.perf_counter() - t0
    err = None
except Exception as e:
    t_ser = -1.0
    err = f"{type(e).__name__}: {e}"[:300]
print(json.dumps({"metric": "aot_probe_compile", "compile_s": round(t_compile, 2),
                  "run_s": round(t_run, 3), "serialize_s": round(t_ser, 3),
                  "serialize_error": err}), flush=True)
PY

echo "== process B: deserialize + run (fresh interpreter) =="
timeout 1800 python - "$BLOB" <<'PY' 2>&1 | log aot_probe_b
import json, pickle, sys, time
import numpy as np
import rbl_tpu  # noqa: F401 — enables x64 (the executable was compiled f64)
import jax
import jax.numpy as jnp
from jax.experimental import serialize_executable as se

blob_path = sys.argv[1]
t_all = time.perf_counter()
try:
    with open(blob_path, "rb") as f:
        blob = pickle.load(f)
    t0 = time.perf_counter()
    g = se.deserialize_and_load(*blob)
    t_load = time.perf_counter() - t0
    X = jnp.ones((256 * 256, 82), jnp.float64)
    t0 = time.perf_counter()
    y = g(X)
    v = float(np.asarray(y)[0, 0])
    t_run = time.perf_counter() - t0
    print(json.dumps({"metric": "aot_probe_reload", "load_s": round(t_load, 3),
                      "first_run_s": round(t_run, 3),
                      "total_s": round(time.perf_counter() - t_all, 3),
                      "value_finite": bool(np.isfinite(v)), "error": None}),
          flush=True)
except Exception as e:
    print(json.dumps({"metric": "aot_probe_reload",
                      "total_s": round(time.perf_counter() - t_all, 3),
                      "error": f"{type(e).__name__}: {e}"[:300]}), flush=True)
PY
echo "done"
