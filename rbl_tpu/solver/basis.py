"""Krylov-basis store.

The reference archives every Lanczos block twice — a ``push!``-grown list of
host copies (pinned RAM, RBL_gpu.jl:168-169) plus a VRAM-budgeted resident
device buffer (gpu_buffer_size, RBL_gpu.jl:95-104) — and streams overflow
blocks host→device inside partial reorth (hybrid_part_reorth!,
RBL_gpu.jl:59-81).

TPU-native replacement: one zero-padded device buffer of shape
(n, capacity), grown geometrically (×2) and updated in place via
donated ``dynamic_update_slice``.  Zero padding makes the fused
reorthogonalization contraction static-shaped for XLA while contributing
exactly nothing numerically; geometric growth keeps the number of distinct
compiled shapes logarithmic.  Under a mesh the buffer rows are sharded like
every other n-sized array, which *is* the "sharded Krylov-basis store" of
SURVEY §2c — partial reorth then reduces b×b Grams with a single psum
inserted by GSPMD.  Optional host offload (``memory_kind='pinned_host'``)
mirrors the reference's pinned-RAM overflow for capacity beyond HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, donate_argnums=(0,))
def _write_block(buf, block, col):
    zero = jnp.zeros((), dtype=col.dtype)
    return jax.lax.dynamic_update_slice(buf, block.astype(buf.dtype), (zero, col))


@partial(jax.jit, static_argnames=("new_cols",))
def _grow(buf, new_cols):
    n, cols = buf.shape
    return jnp.pad(buf, ((0, 0), (0, new_cols - cols)))


class BasisStore:
    """Zero-padded, geometrically grown (n, capacity) basis buffer."""

    def __init__(self, n, block_size, max_cols, dtype, init_cols=32, sharding=None):
        b = block_size
        init_cols = max(b, min(max_cols, ((init_cols + b - 1) // b) * b))
        self.n = n
        self.b = b
        self.max_cols = max_cols
        self.ncols = 0
        self.sharding = sharding
        buf = jnp.zeros((n, init_cols), dtype=dtype)
        if sharding is not None:
            buf = jax.device_put(buf, sharding)
        self.buf = buf

    @property
    def capacity(self):
        return self.buf.shape[1]

    def _ensure(self, needed):
        if needed <= self.capacity:
            return
        new_cols = self.capacity
        while new_cols < needed:
            new_cols *= 2
        new_cols = min(new_cols, self.max_cols)
        buf = _grow(self.buf, new_cols=new_cols)
        if self.sharding is not None:
            buf = jax.device_put(buf, self.sharding)
        self.buf = buf

    def append(self, block) -> None:
        self._ensure(self.ncols + self.b)
        self.buf = _write_block(self.buf, block, jnp.int32(self.ncols))
        self.ncols += self.b

    def view(self):
        """The full zero-padded buffer (safe operand for fused reorth)."""
        return self.buf

    def reset(self):
        self.buf = jnp.zeros_like(self.buf)
        self.ncols = 0
