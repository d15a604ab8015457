"""RBLConfig resolution logic (no reference counterpart — the reference
hardcodes every knob, SURVEY §5 config bullet)."""

import jax.numpy as jnp
import pytest

from rbl_tpu.config import RBLConfig


def test_chunk_growth_cap_f64_clamps_only_on_tpu(monkeypatch):
    import jax

    cfg64 = RBLConfig(compute_dtype=jnp.float64)
    cfg32 = RBLConfig(compute_dtype=jnp.float32)
    # CPU backend (tests force it): no clamp anywhere
    assert cfg64.resolved_chunk_growth_cap() == cfg64.chunk_growth_cap
    assert cfg32.resolved_chunk_growth_cap() == cfg32.chunk_growth_cap
    # TPU backend: f64 clamps to chunk_growth_cap_f64, f32 untouched
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert cfg64.resolved_chunk_growth_cap() == 1
    assert cfg32.resolved_chunk_growth_cap() == cfg32.chunk_growth_cap
    # opt back into growth on TPU f64
    assert (cfg64.replace(chunk_growth_cap_f64=None)
            .resolved_chunk_growth_cap() == cfg64.chunk_growth_cap)
    assert (cfg64.replace(chunk_growth_cap_f64=2)
            .resolved_chunk_growth_cap() == 2)


def test_qr_method_resolution():
    assert RBLConfig(compute_dtype=jnp.float64).resolved_qr_method() == \
        "householder"
    assert RBLConfig(compute_dtype=jnp.float32).resolved_qr_method() == \
        "cholqr2"
    assert RBLConfig(qr_method="cholqr3").resolved_qr_method() == "cholqr3"


def test_invalid_knobs_raise():
    with pytest.raises(ValueError):
        RBLConfig(tol=0.0)
    with pytest.raises(ValueError):
        RBLConfig(qr_method="nope")


def test_accelerator_f64_sweep_warns_once(monkeypatch):
    """VERDICT r4 weak #2: rbl()/rbl_restarted() at compute_dtype=f64 on
    an accelerator backend must warn LOUDLY (device Grams are f32-grade
    there — BENCHMARKS.md census); f32 sweeps and CPU runs stay silent."""
    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    import rbl_tpu as rt
    from rbl_tpu.config import RBLConfig
    from rbl_tpu.solver import rbl as rbl_mod

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(rbl_mod, "_accel_f64_warned", False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rbl_mod._warn_accelerator_f64(RBLConfig())  # f64 default
        assert len(rec) == 1 and "f32-grade" in str(rec[0].message)
        rbl_mod._warn_accelerator_f64(RBLConfig())  # once per process
        assert len(rec) == 1
    monkeypatch.setattr(rbl_mod, "_accel_f64_warned", False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rbl_mod._warn_accelerator_f64(
            RBLConfig(compute_dtype=jnp.float32, basis_dtype=jnp.float32)
        )
        assert len(rec) == 0  # f32 sweep: silent
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    monkeypatch.setattr(rbl_mod, "_accel_f64_warned", False)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        rbl_mod._warn_accelerator_f64(RBLConfig())
        assert len(rec) == 0  # CPU: exact f64, silent
