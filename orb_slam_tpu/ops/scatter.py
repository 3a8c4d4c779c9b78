"""Add-only scatter helpers.

On the axon TPU relay, dynamic non-add scatters (``.at[idx].set``,
``.at[idx].max``) permanently demote the process to a slow execution mode
(~50x per-program latency; measured, see memory note axon-tpu-environment).
Add-scatters, gathers, segment reductions and top_k stay on the fast path.
These helpers express set-like semantics with add-scatters only, assuming
UNIQUE indices (true for all call sites: landmark ids, slot ids, match
targets after duplicate resolution).
"""
from __future__ import annotations

import jax.numpy as jnp


def scatter_set_rows(arr: jnp.ndarray, idx: jnp.ndarray, vals: jnp.ndarray,
                     active=None) -> jnp.ndarray:
    """arr[idx[i]] = vals[i] for unique idx; rows not in idx keep their value.

    active: optional [n] bool — rows with active=False are dropped (their
    index must still be in-range; point them at a scratch row if needed).
    """
    out_dtype = arr.dtype
    if arr.dtype == jnp.bool_:
        arr = arr.astype(jnp.int32)     # bool has no add-scatter
    if active is not None:
        a = active.astype(arr.dtype)
        shape = (-1,) + (1,) * (arr.ndim - 1)
        vals = vals.astype(arr.dtype) * a.reshape(shape)
        cnt_src = active.astype(jnp.int32)
    else:
        cnt_src = jnp.ones(idx.shape[0], jnp.int32)
    upd = jnp.zeros_like(arr).at[idx].add(vals.astype(arr.dtype))
    cnt = jnp.zeros((arr.shape[0],), jnp.int32).at[idx].add(cnt_src)
    mask = (cnt > 0).reshape((-1,) + (1,) * (arr.ndim - 1))
    return jnp.where(mask, upd, arr).astype(out_dtype)


def invert_matches(idx: jnp.ndarray, valid: jnp.ndarray, n_cols: int):
    """Given row->col matches (unique cols after duplicate resolution),
    return per-col source row: inv [n_cols] int32, -1 where unmatched."""
    col = jnp.where(valid, idx, n_cols)  # invalid -> scratch bucket
    rows1 = (jnp.arange(idx.shape[0], dtype=jnp.int32) + 1) * valid
    inv1 = jnp.zeros((n_cols + 1,), jnp.int32).at[col].add(rows1)
    return inv1[:n_cols] - 1
