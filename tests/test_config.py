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
