#!/bin/bash
# Round-3 TPU batch P: does jax's persistent compilation cache work
# against the axon remote-compile backend?  (NEXT r4 item 1a: cold
# solves cost 300-2700 s of compiles.)  Two fresh processes run the
# same jit; if the second's compile time collapses, the cache holds.
set -u
mkdir -p benchmarks/results
stamp=$(date +%Y%m%d_%H%M)
log() { tee -a "benchmarks/results/tpu_${stamp}_$1.log"; }
if [ -n "${WAIT_PID:-}" ]; then
  while ps -p "$WAIT_PID" > /dev/null 2>&1; do sleep 60; done
fi
rm -rf /tmp/rbl_tpu_cache_probe
for run in 1 2; do
JAX_COMPILATION_CACHE_DIR=/tmp/rbl_tpu_cache_probe \
JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=0.5 \
timeout 1200 python - <<'PY' 2>&1 | log compile_cache_probe
import time
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  "/tmp/rbl_tpu_cache_probe")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import rbl_tpu as rt

op = rt.Laplacian2D(nx=256, ny=256, _dtype=jnp.float32)
t0 = time.perf_counter()
res = rt.rbl(op, 8, 4)
float(np.asarray(res.eigenvalues)[0])
print(f"solve (incl compiles): {time.perf_counter()-t0:.1f}s",
      flush=True)
import os
nfiles = len(os.listdir("/tmp/rbl_tpu_cache_probe")) \
    if os.path.isdir("/tmp/rbl_tpu_cache_probe") else 0
print(f"cache entries: {nfiles}", flush=True)
PY
done
echo done
