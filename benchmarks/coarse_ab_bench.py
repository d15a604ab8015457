"""Coarse-stage cost A/B (VERDICT r4 weak #5 / item 5).

The 512-squared at-1e-7 polish pays most of its time in the coarse f32
sweep, yet the round-4 run showed the coarse stage cap-hits and delivers
~2.7e-2 residuals against an asked 1e-4 — the polish absorbs that in 1-2
extra passes either way, so the coarse stage may be over-paying for
output quality the refine redoes.  A/B (warm, same process):

  A: coarse_tol=1e-4 (round-4 default)
  B: coarse_tol=1e-2 (sweep exits at the refine's self-start bar)
  C: coarse_tol=1e-2, buffer=16 (half the buffer columns)

Prints one JSON line per leg.
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

    nx = 512
    op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
    ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
    lam = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:50]

    legs = [
        ("A_tol1e-4", dict(coarse_tol=1e-4)),
        ("B_tol1e-2", dict(coarse_tol=1e-2)),
        ("C_tol1e-2_buf16", dict(coarse_tol=1e-2, buffer=16)),
    ]
    for seed_warmup in (True, False):
        for label, kw in legs:
            cfg = RBLConfig(block_size=8, tol=1e-7, qr_method="cholqr2",
                            eig_poll_cadence=16,
                            seed=(0 if seed_warmup else 3))
            t0 = time.perf_counter()
            r = rbl_polished(op, 50, cfg=cfg, b=8, bounds=(0.0, None), **kw)
            float(r.eigenvectors[0, 0])
            dt = time.perf_counter() - t0
            if seed_warmup:
                continue  # first sweep warms compiles/AOT for this leg
            w = np.sort(np.asarray(r.eigenvalues))[::-1]
            print(json.dumps({
                "metric": f"coarse_ab_{label}",
                "warm_s": round(dt, 3),
                "locked": int(np.sum(np.asarray(r.residual_bounds) < 1e-7)),
                "passes": int(r.iterations),
                "max_rel_err": float(np.max(np.abs(w - lam) / lam)),
                "converged": bool(r.converged),
            }), flush=True)


if __name__ == "__main__":
    main()
