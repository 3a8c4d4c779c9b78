"""Pallas TPU kernel for the pairwise Hamming-distance matrix.

The matcher's hot op (ops/match.py hamming_matrix): dist[i, j] =
popcount(d1[i] ^ d2[j]) over 8 packed uint32 words.  The jnp formulation
materializes the [N, M, 8] XOR intermediate in HBM (33 MB at 2048x1024);
this kernel tiles the output into 128x128 VMEM blocks and keeps the
intermediate entirely on-chip: per grid cell it streams two [8, 128]
descriptor panels (descriptors stored TRANSPOSED — 8 sublanes x 128 lanes
fits the int tile constraint) and accumulates popcounts in registers.

HBM traffic: N*8*4 + M*8*4 read + N*M*4 written vs the jnp path's extra
N*M*32 intermediate — an ~8x traffic reduction on the matcher's dominant
term.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _kernel(d1t_ref, d2t_ref, out_ref):
    # d1t_ref: [8, TILE] uint32 (block of transposed descriptors, side 1)
    # d2t_ref: [8, TILE] uint32
    # out_ref: [TILE, TILE] int32
    acc = jnp.zeros((_TILE, _TILE), jnp.int32)
    for k in range(8):
        a = d1t_ref[k, :]                      # [TILE]
        b = d2t_ref[k, :]
        x = jnp.bitwise_xor(a[:, None], b[None, :])   # [TILE, TILE] u32
        acc = acc + jax.lax.population_count(x).astype(jnp.int32)
    out_ref[:, :] = acc


@partial(jax.jit, static_argnames=())
def hamming_matrix_pallas(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """d1: [N, 8] uint32, d2: [M, 8] uint32 -> [N, M] int32.

    N and M are padded up to multiples of 128 internally; padded rows
    produce garbage distances — callers must mask with their validity masks
    (they already do: every matcher applies valid_mask).
    """
    n, m = d1.shape[0], d2.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    m_pad = -(-m // _TILE) * _TILE
    d1p = jnp.pad(d1, ((0, n_pad - n), (0, 0)))
    d2p = jnp.pad(d2, ((0, m_pad - m), (0, 0)))
    d1t = d1p.T.astype(jnp.uint32)            # [8, n_pad]
    d2t = d2p.T.astype(jnp.uint32)            # [8, m_pad]

    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.int32),
        grid=(n_pad // _TILE, m_pad // _TILE),
        in_specs=[
            pl.BlockSpec((8, _TILE), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, _TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * 8,
            bytes_accessed=(n_pad * 32 + m_pad * 32 + n_pad * m_pad * 4),
            transcendentals=0,
        ),
    )(d1t, d2t)
    return out[:n, :m]
