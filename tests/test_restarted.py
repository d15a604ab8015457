"""Restarted/deflating variant + checkpoint/resume tests
(reference restarted.jl has no test coverage at all — SURVEY §4)."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

import rbl_tpu as rt
from rbl_tpu.config import RBLConfig
from rbl_tpu.solver.restarted import RBL_restarted, rbl_restarted
from rbl_tpu.utils.checkpoint import load_restart_state


def _moderate(n):
    return np.cumsum(np.arange(1.0, n + 1.0))


def test_restarted_matches_spectrum():
    n, k = 400, 6
    a = _moderate(n)
    res = rbl_restarted(rt.DiagonalOperator(jnp.asarray(a)), k)
    assert res.converged
    expect = a[::-1][:k]
    np.testing.assert_allclose(res.eigenvalues, expect, rtol=1e-10)
    # locked Ritz vectors must be true eigenvectors (the reference discards
    # them and returns zeros — restarted.jl:145; we return the lock set)
    V = np.asarray(res.eigenvectors)
    r = a[:, None] * V - V * res.eigenvalues[None, :]
    assert np.linalg.norm(r, axis=0).max() < 1e-5 * a.max()


def test_restarted_block_size_gt_one():
    n, k = 300, 5
    a = np.arange(1.0, n + 1.0)
    res = rbl_restarted(rt.DiagonalOperator(jnp.asarray(a)), k, b=3)
    assert res.converged
    np.testing.assert_allclose(res.eigenvalues, a[::-1][:k], rtol=1e-9)


def test_restarted_reference_alias():
    a = _moderate(300)
    D, V = RBL_restarted(rt.DiagonalOperator(jnp.asarray(a)), 4)
    np.testing.assert_allclose(D, a[::-1][:4], rtol=1e-10)


def test_checkpoint_resume(tmp_path):
    n, k = 400, 6
    a = _moderate(n)
    op = rt.DiagonalOperator(jnp.asarray(a))
    ckpt = os.fspath(tmp_path / "state.npz")
    partial = rbl_restarted(op, k, max_restarts=1, checkpoint_path=ckpt)
    assert not partial.converged  # one restart can't lock all 6
    state = load_restart_state(ckpt)
    resumed = rbl_restarted(op, k, state=state)
    assert resumed.converged
    np.testing.assert_allclose(resumed.eigenvalues, a[::-1][:k], rtol=1e-10)
    # resume must genuinely continue: combined restarts > the single one
    assert resumed.iterations > 1


def test_sa_la_respect_descending_abs_contract():
    """Review regression: after un-shifting, SA/LA results must honor
    LanczosResult's documented descending-|λ| order even with mixed-sign
    spectra (eigenvalues[0] is the dominant pair)."""
    import rbl_tpu as rt

    d = np.concatenate([np.linspace(-50.0, -45.0, 5),
                        np.linspace(1.0, 40.0, 95)])
    op = rt.DiagonalOperator(jnp.asarray(d))
    for which in ("SA", "LA"):
        res = rbl_restarted(op, 3, cfg=rt.RBLConfig(block_size=3, tol=1e-9),
                            which=which)
        mags = np.abs(res.eigenvalues)
        assert np.all(np.diff(mags) <= 1e-12), (which, res.eigenvalues)


def test_restarted_f32_extreme_dominance_no_ghost_lock():
    """Ghost gate (round 3): on the step-decay spectrum at f32, deflation
    leaks re-amplify by |λ|max/sea ≈ 2e6 per iteration and the sweep
    re-converges already-locked directions with lying residual bounds —
    without the overlap gate a duplicate got locked (values off 54%,
    measured on TPU batch Q).  Locked values must match the true top-k
    to the f32 floor."""
    import jax.numpy as jnp

    n, k = 100_000, 6
    d = np.ones(n)
    d[: 2 * k] = (np.arange(2 * k, 0, -1)) * float(n)
    A = rt.DiagonalOperator(jnp.asarray(d, jnp.float32))
    exact = np.sort(d)[::-1][:k]
    res = rbl_restarted(
        A, k, b=2,
        cfg=rt.RBLConfig(seed=0, basis_dtype=jnp.float32,
                         compute_dtype=jnp.float32),
    )
    w = np.sort(np.asarray(res.eigenvalues))[::-1]
    assert len(w) == k
    assert np.abs((w - exact) / exact).max() < 1e-4


def test_restart_growth_policy_stall_pins_sweep_length():
    """Productive restarts must not grow the sweep (each new length is a
    fresh compile family — VERDICT r3 item 7); only a zero-lock stall
    grows.  'always' restores the reference's unconditional +10."""
    import numpy as np

    import jax.numpy as jnp

    import rbl_tpu as rt
    from rbl_tpu.config import RBLConfig

    n, k, b = 400, 6, 2
    d = np.cumsum(np.arange(1.0, n + 1.0))
    op = rt.DiagonalOperator(jnp.asarray(d))
    cfg = RBLConfig(tol=1e-6, restart_kryl_dim=24, seed=0)
    res = rt.rbl_restarted(op, k, b=b, cfg=cfg, max_restarts=30)
    assert res.converged
    res2 = rt.rbl_restarted(
        op, k, b=b, cfg=cfg.replace(restart_growth_policy="always"),
        max_restarts=30,
    )
    assert res2.converged
    # "always" pays +10 per restart (reference semantics); "stall" only
    # grows on zero-lock restarts, so it ends strictly shorter whenever
    # any restart was productive
    assert res2.kryl_dim == 24 + 10 * res2.iterations
    assert res.kryl_dim < 24 + 10 * res.iterations
    np.testing.assert_allclose(
        np.sort(res.eigenvalues), np.sort(res2.eigenvalues), rtol=1e-9
    )
