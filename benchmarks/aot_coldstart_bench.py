"""One at-reference-tolerance solve, timed — the AOT cold-start probe.

Run twice on the TPU (fresh process each time) with the same
RBL_AOT_CACHE dir:

  rm -rf .aot_cache
  python benchmarks/aot_coldstart_bench.py     # disk-cold: compiles + serializes
  python benchmarks/aot_coldstart_bench.py     # disk-warm: deserializes

VERDICT r4 item 1's "done" bar: the disk-warm fresh-process time lands
within ~1.3x of the in-process warm time (137.5 s in BENCH_r04.json),
erasing the 302 s cold number.  Prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault(
    "RBL_AOT_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".aot_cache"),
)


def main():
    import numpy as np

    import jax.numpy as jnp

    import rbl_tpu as rt
    from rbl_tpu.config import RBLConfig
    from rbl_tpu.solver.polish import rbl_polished

    cdir = os.environ["RBL_AOT_CACHE"]
    try:
        nblobs = len([p for p in os.listdir(cdir) if p.endswith(".aotx")])
    except OSError:
        nblobs = 0

    seed = int(os.environ.get("RBL_SEED", "0"))
    op = rt.Laplacian2D(nx=512, ny=512, _dtype=jnp.float64)
    cfg = RBLConfig(block_size=8, tol=1e-7, qr_method="cholqr2",
                    eig_poll_cadence=16, seed=seed)
    t0 = time.perf_counter()
    r = rbl_polished(op, 50, cfg=cfg, b=8, bounds=(0.0, None))
    float(r.eigenvectors[0, 0])
    dt = time.perf_counter() - t0

    nx = 512
    ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
    lam = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:50]
    w = np.sort(np.asarray(r.eigenvalues))[::-1]
    print(json.dumps({
        "metric": "at_ref_tol_oneshot_s",
        "value": round(dt, 3),
        "aot_cache_state": "warm" if nblobs else "cold",
        "blobs_before": nblobs,
        "locked": int(np.sum(np.asarray(r.residual_bounds) < 1e-7)),
        "max_rel_err": float(np.max(np.abs(w - lam) / lam)),
        "converged": bool(r.converged),
    }), flush=True)


if __name__ == "__main__":
    main()
