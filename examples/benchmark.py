"""Benchmark harness — the reference benchmark.jl re-imagined.

Loads a SuiteSparse matrix (or builds a synthetic Laplacian), runs the TPU
RBL solver across a block-size sweep, cross-checks against scipy's ARPACK
(`eigsh`, the reference's Arpack.eigs comparison — benchmark.jl:42), and
prints the per-phase timing report (TimerOutputs analogue).

Usage:
  python examples/benchmark.py [--matrix path.mtx] [--k 100] [--blocks 1,2,4,8]
  python examples/benchmark.py --laplacian 512   # 512x512 grid, n=262144
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--matrix", help=".mtx or .mat file (SuiteSparse)")
    p.add_argument("--laplacian", type=int, default=0, help="2D grid side")
    p.add_argument("--k", type=int, default=100)
    p.add_argument("--blocks", default="4")
    p.add_argument("--tol", type=float, default=1e-7)
    p.add_argument("--arpack", action="store_true", help="cross-check with scipy eigsh")
    p.add_argument("--f32", action="store_true", help="fp32 basis+compute")
    args = p.parse_args()

    import jax.numpy as jnp

    import rbl_tpu as rt
    from rbl_tpu.config import RBLConfig
    from rbl_tpu.utils.profiling import Timer

    if args.matrix:
        from rbl_tpu.utils.suitesparse import load_matrix

        A = load_matrix(args.matrix)
        op = rt.as_operator(A)
        label = args.matrix
    elif args.laplacian:
        s = args.laplacian
        dt = jnp.float32 if args.f32 else jnp.float64
        op = rt.Laplacian2D(nx=s, ny=s, _dtype=dt)
        A = None
        label = f"laplacian2d-{s}x{s}"
    else:
        p.error("need --matrix or --laplacian")

    dtype = jnp.float32 if args.f32 else jnp.float64
    blocks = [int(x) for x in args.blocks.split(",")]

    # warm-up on a small random problem (benchmark.jl:57-58's JIT warm-up)
    rt.rbl(np.abs(np.random.default_rng(0).standard_normal(64)) + 1.0, 2, 2)

    for b in blocks:
        cfg = RBLConfig(
            block_size=b, tol=args.tol,
            basis_dtype=dtype, compute_dtype=dtype,
            qr_method="cholqr2" if args.f32 else "auto",
        )
        timer = Timer(sync=True)
        t0 = time.perf_counter()
        res = rt.rbl(op, args.k, b, cfg=cfg, timer=timer)
        dt_solve = time.perf_counter() - t0
        print(
            f"[RBL b={b}] {label}: {dt_solve:.3f}s, converged={res.converged}, "
            f"kryl={res.kryl_dim}, largest={res.eigenvalues[0]:.6e}, "
            f"smallest={res.eigenvalues[-1]:.6e}"
        )
        print(timer.report())

    if args.arpack:
        import scipy.sparse.linalg as spla

        if A is None:
            from rbl_tpu.utils.suitesparse import laplacian_2d

            A = laplacian_2d(args.laplacian, args.laplacian)
        t0 = time.perf_counter()
        d = spla.eigsh(A, k=args.k, which="LM", tol=args.tol,
                       return_eigenvectors=False)[::-1]
        print(f"[ARPACK eigsh] {time.perf_counter() - t0:.3f}s, "
              f"largest={d[0]:.6e}, smallest={d[-1]:.6e}")
        rel = np.abs((res.eigenvalues - d) / d)
        print(f"max |rel diff| RBL vs ARPACK: {rel.max():.3e}")


if __name__ == "__main__":
    main()
