"""Checkpoint / resume for the restarted solver.

The reference has no checkpointing (SURVEY §5); its restart boundary is the
natural save point — solver state compresses to (lock set, locked values,
count, sweep length, next start block).  Stored as a single .npz; arrays are
materialized to host, and re-sharded on load if a mesh is active.
"""

from __future__ import annotations

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
    )
