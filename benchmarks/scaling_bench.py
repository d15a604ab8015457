"""Scaling benchmark — sharded-step efficiency across mesh sizes.

BASELINE.md north-star: "≥80% efficiency from 1 host to N ≥ 2 hosts
(row-partitioned SpMM, sharded Krylov buffer)".  Real multi-chip hardware
is not attached in this environment, so by default this runs the full
sharded Lanczos step (halo-exchange SpMM + fused reorth + CholeskyQR2 with
psum Grams) over 1/2/4/8 virtual CPU devices.  Virtual devices share the
same physical cores, so raw weak-scaling numbers measure serialization,
not interconnect efficiency; the honest virtual-mesh metric reported here
is SERIALIZATION-NORMALIZED efficiency, ndev·T(1)/T(ndev) — the fraction
of perfect serialization achieved, i.e. how little overhead the sharding
machinery (halo ppermutes, psum Grams, GSPMD partitioning) adds beyond
the unavoidable k-fold compute.  On a real pod slice the same script
measures true weak scaling — no code changes.

Usage:  python benchmarks/scaling_bench.py [--rows-per-dev 32768] [--b 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must be set before jax initializes
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rows-per-dev", type=int, default=32768)
    p.add_argument("--b", type=int, default=8)
    p.add_argument("--basis-cols", type=int, default=128)
    p.add_argument("--reps", type=int, default=20)
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from rbl_tpu.parallel.dist_spmm import ShardedLaplacian2D
    from rbl_tpu.parallel.mesh import make_row_mesh, row_sharding
    from rbl_tpu.solver.lanczos import _sweep_chunk

    ndev_avail = len(jax.devices())
    b = args.b
    ny = 256
    rows_per_dev = args.rows_per_dev

    results = []
    for ndev in [1, 2, 4, 8]:
        if ndev > ndev_avail:
            break
        mesh = make_row_mesh(ndev)
        nx = (rows_per_dev // ny) * ndev
        n = nx * ny
        op = ShardedLaplacian2D(nx=nx, ny=ny, mesh=mesh, _dtype=jnp.float32)
        sh = row_sharding(mesh)
        rng = np.random.default_rng(0)

        @jax.jit
        def step(basis, Qi, Qprev, Bi):
            # the solver's actual fused hot path: one 2-iteration sweep
            # chunk (birth-scrub reorth + halo-exchange SpMM + CholeskyQR2)
            return _sweep_chunk(
                op, basis, Qi, Qprev, Bi, jnp.int32(0), None,
                cdt=jnp.dtype(jnp.float32), qr_method="cholqr2", nsteps=2,
                reorth_pattern=(True, False), loc_passes=2,
            )

        basis = jax.device_put(
            jnp.zeros((n, args.basis_cols), jnp.float32), sh
        )
        Qi = jax.device_put(
            jnp.asarray(np.linalg.qr(rng.standard_normal((n, b)))[0],
                        jnp.float32), sh)
        Qprev = jax.device_put(
            jnp.asarray(np.linalg.qr(rng.standard_normal((n, b)))[0],
                        jnp.float32), sh)
        Bi = jnp.asarray(rng.standard_normal((b, b)), jnp.float32)

        out = step(basis, Qi, Qprev, Bi)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = step(basis, Qi, Qprev, Bi)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        results.append((ndev, n, dt))
        eff_ser = results[0][2] * ndev / dt * 100
        print(f"devices={ndev}: n={n:>9}  step={dt*1e3:8.2f} ms  "
              f"serialization-normalized eff={eff_ser:6.1f}%")

    last = results[-1]
    eff = results[0][2] * last[0] / last[2] if results else 0.0
    print(json.dumps({
        "metric": f"sharding_eff_virtual_{last[0]}dev",
        "value": round(eff, 3), "unit": "x",
        "note": "ndev*T(1)/T(ndev) on shared-core virtual devices",
    }))

    # ---- general-sparse exchange A/B: boundary-only ghosts vs all-gather
    # (VERDICT r1 item 3: comm volume must scale with boundary rows, and
    # the sharded step must be faster for it on bandwidth-dominated
    # operators).  Banded matrix, bandwidth << rows/device.
    import scipy.sparse as sp

    from rbl_tpu.parallel.dist_spmm import ShardedCooSpMM

    ndev = min(8, ndev_avail)
    mesh = make_row_mesh(ndev)
    n = args.rows_per_dev * ndev
    bw = 64
    diags = [rng.standard_normal(n) for _ in range(5)]
    offs = [0, 1, -1, bw, -bw]
    A = sp.diags(diags, offs, (n, n)).tocsr().astype(np.float32)
    A = ((A + A.T) * 0.5).tocsr()
    sh = row_sharding(mesh)
    Xs = jax.device_put(
        jnp.asarray(rng.standard_normal((n, b)), jnp.float32), sh
    )
    # salted, device-chained timing (CLAUDE.md gotchas 3/4: repeated
    # byte-identical applies can be served from a result cache on the
    # remote backend, and block_until_ready can return early — the
    # marginal-cost pattern from spmm_bench measures the real kernel)
    from benchmarks.spmm_bench import time_apply

    for exch in ("ghost", "allgather"):
        op = ShardedCooSpMM.from_scipy(A, mesh, dtype=jnp.float32,
                                       exchange=exch)
        comm = op.comm_rows_per_apply()
        dt = time_apply(op, Xs, args.reps)
        print(f"coo-{exch:>9}: {dt*1e3:8.2f} ms/apply  "
              f"comm_rows={comm} ({comm/n:.1%} of n)")
        print(json.dumps({
            "metric": f"sharded_coo_{exch}_{ndev}dev",
            "value": round(dt * 1e3, 3), "unit": "ms",
            "comm_rows": int(comm),
        }))

    # ---- comm-growth table (VERDICT r4 item 8): 2→4→8 devices on a
    # FIXED global banded-BSR fixture — sharded step time (XLA path) +
    # the exact ghost-exchange volume per apply for the packed-BSR plan
    # (ghost blocks from the static ppermute caps) and the COO plan
    # (ghost rows).  Bounds how comm grows with the mesh until real
    # multi-host hardware exists: a banded operator's boundary is
    # per-device-constant, so total ghost volume should grow ~linearly
    # with ndev while per-device volume stays flat.
    from rbl_tpu.parallel.dist_spmm import ShardedBlockSparseOperator

    n_fix = args.rows_per_dev * min(8, ndev_avail)
    diags = [rng.standard_normal(n_fix) for _ in range(5)]
    bw_fix = 256  # two 128-col block neighbors
    A_fix = sp.diags(diags, [0, 1, -1, bw_fix, -bw_fix],
                     (n_fix, n_fix)).tocsr().astype(np.float32)
    A_fix = ((A_fix + A_fix.T) * 0.5).tocsr()
    print("\ncomm-growth table (fixed n=%d, band=%d):" % (n_fix, bw_fix))
    for ndev in (2, 4, 8):
        if ndev > ndev_avail:
            break
        mesh = make_row_mesh(ndev)
        sh = row_sharding(mesh)
        Xs = jax.device_put(
            jnp.asarray(rng.standard_normal((n_fix, b)), jnp.float32), sh)
        coo = ShardedCooSpMM.from_scipy(A_fix, mesh, dtype=jnp.float32,
                                        exchange="ghost")
        dt = time_apply(coo, Xs, args.reps)
        row = {
            "metric": f"comm_growth_{ndev}dev",
            "coo_ms_per_apply": round(dt * 1e3, 3),
            "coo_ghost_rows": int(coo.comm_rows_per_apply()),
        }
        try:
            bsr = ShardedBlockSparseOperator.from_scipy(
                A_fix, mesh, dtype=jnp.float32)
            gblocks = int(sum(bsr.caps)) * ndev  # per-shift caps × devices
            row["bsr_ghost_blocks"] = gblocks
            row["bsr_ghost_kb"] = round(
                gblocks * bsr.bk * b * 4 / 1024, 1)
        except ValueError as e:
            row["bsr_error"] = str(e)[:80]
        print(json.dumps(row))


if __name__ == "__main__":
    main()
