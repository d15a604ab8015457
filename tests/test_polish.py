"""Warm-started f32→f64 polish pipeline (solver/polish.py).

The reference's mixed-precision story is a FLOAT reorth tier inside one
DOUBLE sweep (common.jl:5-6, README.md:69); on TPU the winning split is
f32 for the whole subspace discovery and f64 only for a short restarted
polish (BENCHMARKS.md "At the reference's own tolerance").  No reference
test coverage exists for any of this (SURVEY §4)."""

import numpy as np

import jax.numpy as jnp

import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.solver.polish import rbl_polished


def _lap2d_exact(nx, k):
    ev1 = 2 - 2 * np.cos(np.pi * np.arange(1, nx + 1) / (nx + 1))
    return np.sort(np.add.outer(ev1, ev1).ravel())[::-1][:k]


def test_polished_clustered_laplacian_at_ref_tol():
    """The target workload: clustered Laplacian top-k at the reference's
    absolute 1e-7 residual bound (RBL.jl:109) — unreachable by one sweep
    (cap-hits, BENCHMARKS.md), reachable by the warm-started polish."""
    nx, k, b = 48, 10, 4
    op = rt.Laplacian2D(nx=nx, ny=nx, _dtype=jnp.float64)
    cfg = RBLConfig(block_size=b, tol=1e-7, seed=0)
    res = rbl_polished(op, k, cfg=cfg, b=b)
    assert res.converged
    w = np.sort(np.asarray(res.eigenvalues))[::-1]
    np.testing.assert_allclose(w, _lap2d_exact(nx, k), rtol=1e-8)
    # locked vectors are true eigenvectors at the polish tolerance
    V = np.asarray(res.eigenvectors)
    AV = np.asarray(op.apply(jnp.asarray(V)))
    r = AV - V * np.asarray(res.eigenvalues)[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-6


def test_warm_seeding_converges_with_short_sweeps():
    """warm_V columns aligned with the unlocked pairs let the restarted
    solver lock k pairs with sweeps far shorter than the cold solve needs;
    eigenvalues reach the f64 class."""
    n, k, b = 400, 6, 3
    rng = np.random.default_rng(0)
    d = np.cumsum(np.arange(1.0, n + 1.0))  # moderate decay (test.jl:17)
    op = rt.DiagonalOperator(jnp.asarray(d))
    idx = np.argsort(-np.abs(d))[:k]
    warm = np.zeros((n, k))
    warm[idx, np.arange(k)] = 1.0
    warm += 1e-4 * rng.standard_normal((n, k))
    res = rt.rbl_restarted(
        op, k, b=b,
        cfg=RBLConfig(tol=1e-5, restart_kryl_dim=24, seed=0),
        warm_V=warm, max_restarts=12,
    )
    assert res.converged
    w = np.sort(np.asarray(res.eigenvalues))[::-1]
    np.testing.assert_allclose(w, np.sort(d)[::-1][:k], rtol=1e-9)
    # a cold solve at this sweep length needs many more restarts; warm
    # locks in a handful
    assert res.iterations <= 10


def test_polished_cold_fallback_on_nonfinite_warm(monkeypatch):
    """Post-crash-worker garbage in the coarse stage (BENCHMARKS.md
    environment finding) must not poison the polish: non-finite warm_V
    is dropped and the restarted solve runs cold."""
    import rbl_tpu.solver.polish as pol

    n, k = 300, 4
    a = np.cumsum(np.arange(1.0, n + 1.0))
    op = rt.DiagonalOperator(jnp.asarray(a))

    real_rbl = pol.rbl

    def bad_rbl(*args, **kw):
        res = real_rbl(*args, **kw)
        res.eigenvectors = jnp.full_like(res.eigenvectors, jnp.nan)
        return res

    monkeypatch.setattr(pol, "rbl", bad_rbl)
    res = rbl_polished(op, k, cfg=RBLConfig(tol=1e-8, seed=0), b=2)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, a[::-1][:k], rtol=1e-9)


def test_polished_sharded_mesh(eight_devices):
    """Both polish stages must run under a row mesh: the f32 coarse sweep,
    the warm-block placement, and the f64 restarted polish all inherit
    cfg.mesh (SURVEY §2c sharded-basis strategy)."""
    import jax.numpy as jnp

    from rbl_tpu.parallel.dist_spmm import ShardedLaplacian2D
    from rbl_tpu.parallel.mesh import make_row_mesh

    mesh = make_row_mesh(8)
    nx, k, b = 24, 4, 2
    op = ShardedLaplacian2D(nx=nx, ny=nx, mesh=mesh, _dtype=jnp.float64)
    cfg = RBLConfig(block_size=b, tol=1e-7, mesh=mesh, seed=0)
    res = rbl_polished(op, k, cfg=cfg, b=b)
    assert res.converged
    w = np.sort(np.asarray(res.eigenvalues))[::-1]
    np.testing.assert_allclose(w, _lap2d_exact(nx, k), rtol=1e-8)


def test_warm_block_pads_missing_columns():
    from rbl_tpu.config import RBLConfig as C
    from rbl_tpu.solver.restarted import _warm_block

    n, b = 50, 3
    warm = np.zeros((n, 4))
    warm[7, 3] = 1.0  # only column index 3 exists past start=3
    blk = np.asarray(_warm_block(warm, 3, b, n, C(), None))
    assert blk.shape == (n, b)
    np.testing.assert_allclose(blk[:, 0], warm[:, 3])
    # padded columns are fresh randomness, not zeros (a zero start column
    # would make the sweep's first QR rank-deficient by construction)
    assert np.linalg.norm(blk[:, 1]) > 0 and np.linalg.norm(blk[:, 2]) > 0
