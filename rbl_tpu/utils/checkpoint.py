"""Checkpoint / resume.

The reference has no checkpointing (SURVEY §5).  Three save surfaces here:

- Restart boundary (restarted solver): state compresses to (lock set,
  locked values, count, sweep length, next start block).
- Sweep-chunk boundary (MAIN solver, ``RBLConfig.sweep_checkpoint_path``):
  the full mid-sweep state at the documented between-chunks invariant —
  basis prefix Q_1..Q_{i-1}, the in-flight recurrence triple
  (Q_{i+1}, Q_i, B_{i+1}), the T band, the coupling history, and the
  reorth-policy flags — written atomically (tmp + rename) every
  ``sweep_checkpoint_every`` clean chunks and deleted on completion.
- Filter-pass boundary (Chebyshev polish, ``chebyshev_refine``): the
  whole iterate is the (n, m) block + Ritz values/residuals — tiny
  state, written atomically each pass (ADVICE r4: the warm polish path
  must honor ``checkpoint_path``, not just the cold fallback).

Stored as a single .npz; arrays are materialized to host (sub-f32 dtypes
upcast to f32 — numpy has no portable bf16), and re-sharded on load if a
mesh is active.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp


def save_restart_state(path: str, state) -> None:
    np.savez(
        path,
        lock_buf=np.asarray(state.lock_buf),
        locked_values=np.asarray(state.locked_values),
        count=np.int64(state.count),
        kryl_dim=np.int64(state.kryl_dim),
        Qi=np.asarray(state.Qi),
        restarts=np.int64(state.restarts),
        low_yield_streak=np.int64(getattr(state, "low_yield_streak", 0)),
    )


def load_restart_state(path: str, sharding=None):
    from ..solver.restarted import RestartState

    z = np.load(path)
    lock_buf = jnp.asarray(z["lock_buf"])
    Qi = jnp.asarray(z["Qi"])
    if sharding is not None:
        import jax

        lock_buf = jax.device_put(lock_buf, sharding)
        Qi = jax.device_put(Qi, sharding)
    return RestartState(
        lock_buf=lock_buf,
        locked_values=z["locked_values"].copy(),
        count=int(z["count"]),
        kryl_dim=int(z["kryl_dim"]),
        Qi=Qi,
        restarts=int(z["restarts"]),
        low_yield_streak=(
            int(z["low_yield_streak"]) if "low_yield_streak" in z else 0
        ),
    )


def save_polish_state(path: str, X, theta, res, npass: int) -> None:
    """Atomic pass-boundary checkpoint for chebyshev_refine: the filtered
    block X (n, m) plus the last Rayleigh–Ritz values/residuals."""
    import tempfile

    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(
                f,
                X=np.asarray(X, dtype=np.float64),
                theta=np.asarray(theta, dtype=np.float64),
                res=np.asarray(res, dtype=np.float64),
                npass=np.int64(npass),
            )
        os.replace(tmp, path)
    except BaseException:
        try:
            os.remove(tmp)
        except OSError:
            pass
        raise


def load_polish_state(path: str) -> dict:
    z = np.load(path)
    return dict(X=z["X"], theta=z["theta"], res=z["res"],
                npass=int(z["npass"]))


def _np32(x):
    """Host copy, sub-f32 upcast to f32 (portable serialization)."""
    a = np.asarray(x)
    return a.astype(np.float32) if a.dtype.itemsize < 4 else a


def save_sweep_state(path: str, state: dict) -> None:
    """Atomically persist a mid-sweep checkpoint (lanczos_iteration).

    ``state`` carries numpy/jax arrays and python scalars; the write goes
    through a temp file + rename so a crash mid-save can never leave a
    torn checkpoint behind."""
    payload = {}
    for k, v in state.items():
        if isinstance(v, dict):  # B_hist: {iteration: (b, b)}
            keys = np.asarray(sorted(v.keys()), dtype=np.int64)
            payload[f"{k}__keys"] = keys
            payload[f"{k}__vals"] = np.stack(
                [np.asarray(v[int(i)], dtype=np.float64) for i in keys]
            ) if keys.size else np.zeros((0,))
        elif isinstance(v, (bool, int, float)):
            payload[k] = np.asarray(v)
        else:
            payload[k] = _np32(v)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    os.replace(tmp, path)


def load_sweep_state(path: str) -> dict:
    """Inverse of ``save_sweep_state`` — scalars back to python types,
    dict-valued entries reassembled."""
    z = np.load(path)
    out: dict = {}
    dicts: dict = {}
    for k in z.files:
        if k.endswith("__keys"):
            dicts.setdefault(k[: -len("__keys")], {})["keys"] = z[k]
        elif k.endswith("__vals"):
            dicts.setdefault(k[: -len("__vals")], {})["vals"] = z[k]
        else:
            a = z[k]
            out[k] = a.item() if a.ndim == 0 else a
    for name, kv in dicts.items():
        out[name] = {
            int(i): kv["vals"][j] for j, i in enumerate(kv["keys"])
        }
    return out
