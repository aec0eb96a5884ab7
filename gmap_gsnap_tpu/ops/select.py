"""MXU-based selection: one-hot matmul replacements for take_along_axis.

TPU gathers execute elementwise (~60-90M elem/s measured); a one-hot
contraction rides the MXU and is orders of magnitude faster for the
[B, <=256]-wide permutation/selection patterns in the ranking stages.
Exactness: f32 carries integers <= 2^24 exactly; uint32 coordinate
arrays route through two 16-bit halves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_ONEHOT_WIDTH = 512


def take_cols(x: jax.Array, idx: jax.Array) -> jax.Array:
    """take_along_axis(x, idx, axis=1) for 2D arrays.

    x [B, N] (int32 < 2^24 magnitude, uint32, bool, or float32),
    idx [B, K] int32 in [0, N).  Falls back to take_along_axis when N is
    too wide for an economical one-hot."""
    b, n = x.shape
    if n > MAX_ONEHOT_WIDTH:
        return jnp.take_along_axis(x, idx, axis=1)
    oh = jax.nn.one_hot(idx, n, dtype=jnp.float32)  # [B, K, N]

    def mat(v):
        return jnp.einsum("bkn,bn->bk", oh, v)

    if x.dtype == jnp.uint32:
        lo = mat((x & jnp.uint32(0xFFFF)).astype(jnp.float32))
        hi = mat((x >> 16).astype(jnp.float32))
        return (hi.astype(jnp.uint32) << 16) | lo.astype(jnp.uint32)
    out = mat(x.astype(jnp.float32))
    if x.dtype == jnp.bool_:
        return out > 0.5
    return out.astype(x.dtype)


def take_cols_dict(fields: dict, idx: jax.Array, skip=()) -> dict:
    """Apply one permutation/selection to every array in a dict."""
    return {
        k: (v if k in skip else take_cols(v, idx)) for k, v in fields.items()
    }


def table_lookup(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table[idx] for a constant f32 table and integer indices of any
    shape, via MXU one-hot contractions instead of elementwise gathers.

    Small tables use a direct one-hot; large power-of-two tables (e.g.
    the 16384-entry maxent score tables) factor the index into high/low
    7-bit halves and do a two-level contraction."""
    n = table.shape[0]
    flat = idx.reshape(-1).astype(jnp.int32)
    if n <= MAX_ONEHOT_WIDTH:
        oh = jax.nn.one_hot(flat, n, dtype=jnp.float32)
        out = oh @ table.astype(jnp.float32)
        return out.reshape(idx.shape)
    assert n % 128 == 0
    t2 = table.astype(jnp.float32).reshape(n // 128, 128)
    hi = flat // 128
    lo = flat % 128
    oh_hi = jax.nn.one_hot(hi, n // 128, dtype=jnp.float32)
    oh_lo = jax.nn.one_hot(lo, 128, dtype=jnp.float32)
    rows = oh_hi @ t2                      # [N, 128] selected rows
    out = jnp.sum(rows * oh_lo, axis=-1)   # pick the lane
    return out.reshape(idx.shape)
