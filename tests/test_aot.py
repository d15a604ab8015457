"""AOT executable cache (utils/aot.py) — the one-shot cold-start story
(VERDICT r3 item 3; the reference's equivalent cost is Julia JIT
seconds, packages.jl env)."""

import os
import pickle

import numpy as np

import jax
import jax.numpy as jnp

import rbl_tpu  # noqa: F401 — x64
from rbl_tpu.utils.aot import aot_jit


def _f(x, scale=2.0):
    return (x @ x.T).sum() * scale


def test_aot_disabled_without_cache_dir(monkeypatch):
    monkeypatch.delenv("RBL_AOT_CACHE", raising=False)
    f = aot_jit(_f, name="t0")
    x = jnp.ones((8, 8))
    np.testing.assert_allclose(float(f(x)), 1024.0)


def test_aot_write_and_graceful_reload(tmp_path):
    """In THIS test env (8 forced host devices) jax cannot execute a
    deserialized single-device executable ("expected 8 shards") — the
    cache must degrade to recompilation with a marker, never crash.  The
    true cross-process roundtrip is covered by the single-device
    subprocess test below and the TPU batch-B probe."""
    cache = str(tmp_path / "aot")
    x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
    f1 = aot_jit(_f, name="t1", cache_dir=cache)
    v1 = float(f1(x))
    files = [p for p in os.listdir(cache) if p.endswith(".aotx")]
    assert len(files) == 1
    f2 = aot_jit(_f, name="t1", cache_dir=cache)
    v2 = float(f2(x))
    np.testing.assert_allclose(v1, v2)


def test_aot_roundtrip_single_device_subprocess(tmp_path):
    """True cold-start roundtrip: process A compiles + serializes,
    process B (fresh interpreter, same cache) loads WITHOUT compiling.
    (B still LOWERS — local, cheap — because disk entries are keyed on
    the StableHLO hash so stale code can never be served; only the
    remote .compile() is the cost the cache erases.)"""
    import subprocess
    import sys

    cache = str(tmp_path / "aot")
    prog = """
import os, sys
sys.path.insert(0, {repo!r})
import jax, jax.numpy as jnp
import rbl_tpu
from rbl_tpu.utils.aot import aot_jit

def _f(x, scale=2.0):
    return (x @ x.T).sum() * scale

f = aot_jit(_f, name="sub", cache_dir={cache!r})
mode = sys.argv[1]
if mode == "read":
    # loading must NOT compile: poison Lowered.compile (and the plain-jit
    # fallback) so any compile attempt fails loudly
    real = f._jit
    class L:
        def __init__(self, lowered): self._l = lowered
        def as_text(self): return self._l.as_text()
        def compile(self): raise RuntimeError("compiled!")
    class J:
        def lower(self, *a, **k): return L(real.lower(*a, **k))
        def __call__(self, *a, **k): raise RuntimeError("fell back to jit!")
    f._jit = J()
x = jnp.arange(64.0, dtype=jnp.float32).reshape(8, 8)
print("VALUE", float(f(x)))
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               XLA_FLAGS="")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    src = prog.format(repo=repo, cache=cache)
    for mode in ("write", "read"):
        out = subprocess.run(
            [sys.executable, "-c", src, mode], env=env,
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, (mode, out.stderr[-800:])
        val = [ln for ln in out.stdout.splitlines() if ln.startswith("VALUE")]
        assert val and abs(float(val[0].split()[1]) - 1021440.0) < 1e-3, (
            mode, out.stdout)


def test_aot_distinct_signatures_get_distinct_entries(tmp_path):
    cache = str(tmp_path / "aot")
    f = aot_jit(_f, name="t2", cache_dir=cache)
    f(jnp.ones((4, 4)))
    f(jnp.ones((8, 8)))
    files = [p for p in os.listdir(cache) if p.endswith(".aotx")]
    assert len(files) == 2


def test_aot_static_positional_args(tmp_path):
    """Static args may arrive positionally; the compiled executable is
    called with only the dynamic operands (round-5 wiring prerequisite —
    the polish programs pass their static degree positionally)."""

    def g(x, degree, scale=1.0):
        y = x
        for _ in range(degree):
            y = y @ x
        return y.sum() * scale

    cache = str(tmp_path / "aot")
    f = aot_jit(g, name="t4", static_argnames=("degree",), cache_dir=cache)
    x = jnp.eye(4, dtype=jnp.float32) * 0.5
    v1 = float(f(x, 2, scale=jnp.float32(2.0)))       # static positional
    v2 = float(f(x, 2, scale=jnp.float32(2.0)))       # in-memory hit
    np.testing.assert_allclose(v1, v2)
    assert len([p for p in os.listdir(cache) if p.endswith(".aotx")]) == 1
    v3 = float(f(x, 3, scale=jnp.float32(2.0)))       # new static -> new entry
    assert len([p for p in os.listdir(cache) if p.endswith(".aotx")]) == 2
    assert v3 != v1


def test_aot_poisoned_entry_degrades_gracefully(tmp_path):
    cache = str(tmp_path / "aot")
    f = aot_jit(_f, name="t3", cache_dir=cache)
    x = jnp.ones((4, 4))
    v0 = float(f(x))  # writes the entry
    (path,) = [os.path.join(cache, p) for p in os.listdir(cache)
               if p.endswith(".aotx")]
    with open(path, "wb") as fh:
        pickle.dump(("garbage",), fh)
    f2 = aot_jit(_f, name="t3", cache_dir=cache)  # fresh in-process memo
    v = float(f2(x))  # must rebuild, not crash
    np.testing.assert_allclose(v, v0)
    # ADVICE r4: a bad READ must not permanently disable the entry —
    # the blob is replaced (or at least removed), the marker is
    # reserved for serialize-side failures.
    assert not os.path.exists(path + ".disabled")
    with open(path, "rb") as fh:
        blob = pickle.load(fh)
    assert blob != ("garbage",)


def test_aot_key_partitions_on_matmul_precision_and_topology(tmp_path):
    """ADVICE r4 (both mediums): the cache key must include the ambient
    default_matmul_precision / x64 state (a ~2-digit f32-Gram accuracy
    swing on TPU) and the device topology, so mismatched processes hash
    to distinct entries instead of sharing whichever serialized first."""
    f = aot_jit(_f, name="t5", cache_dir=str(tmp_path))
    x = jnp.ones((4, 4))
    static, dyn_pos, dyn_kw = f._split((x,), {})
    base = f._key(static, dyn_pos, dyn_kw)
    with jax.default_matmul_precision("highest"):
        assert f._key(static, dyn_pos, dyn_kw) != base


def test_aot_inside_enclosing_trace_inlines(tmp_path):
    """aot_jit called under an enclosing jit receives tracers — it must
    inline as plain jit (no .lower() on tracers, no disk entry)."""
    f = aot_jit(_f, name="t6", cache_dir=str(tmp_path))
    g = jax.jit(lambda x: f(x) * 0.5)
    x = jnp.ones((4, 4))
    np.testing.assert_allclose(float(g(x)), 64.0)
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".aotx")]


def test_donation_allowlist_env(monkeypatch):
    """RBL_NO_DONATION=1 (the CI warm-cache allowlist) makes donate()
    return () so donated programs compile donation-free and stay out of
    the XLA:CPU persistent-cache SIGABRT path."""
    from rbl_tpu.utils.aot import donate

    monkeypatch.delenv("RBL_NO_DONATION", raising=False)
    assert donate(1) == (1,)
    monkeypatch.setenv("RBL_NO_DONATION", "1")
    assert donate(1) == ()
    assert donate(0, 2) == ()


def test_cache_dir_env_semantics(monkeypatch):
    """RBL_AOT_CACHE: explicit dir wins, '0'/'' disable, unset defaults
    OFF on the CPU backend (accelerator default-on is probed on TPU)."""
    from rbl_tpu.utils import aot

    monkeypatch.setenv("RBL_AOT_CACHE", "/tmp/x")
    assert aot.cache_dir_from_env() == "/tmp/x"
    monkeypatch.setenv("RBL_AOT_CACHE", "0")
    assert aot.cache_dir_from_env() is None
    monkeypatch.setenv("RBL_AOT_CACHE", "")
    assert aot.cache_dir_from_env() is None
    monkeypatch.delenv("RBL_AOT_CACHE")
    assert aot.cache_dir_from_env() is None  # cpu backend in tests
