"""Pallas Hamming kernel: exactness vs the XLA path (interpreter mode on
CPU; the TPU run is exercised by bench/entry)."""
import numpy as np
import jax
import jax.numpy as jnp

from orb_slam_tpu.ops.match import hamming_matrix_xla


def test_pallas_kernel_exact_interpret(rng):
    from jax.experimental import pallas as pl
    from orb_slam_tpu.ops import hamming_pallas as hp

    d1 = jnp.asarray(rng.integers(0, 2**32, (256, 8), dtype=np.uint32))
    d2 = jnp.asarray(rng.integers(0, 2**32, (130, 8), dtype=np.uint32))

    n, m = 256, 130
    n_pad, m_pad = 256, 256
    d1t = d1.T
    d2t = jnp.pad(d2, ((0, m_pad - m), (0, 0))).T
    out = pl.pallas_call(
        hp._kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.int32),
        grid=(n_pad // hp._TILE, m_pad // hp._TILE),
        in_specs=[
            pl.BlockSpec((8, hp._TILE), lambda i, j: (0, i)),
            pl.BlockSpec((8, hp._TILE), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((hp._TILE, hp._TILE), lambda i, j: (i, j)),
        interpret=True,
    )(d1t, d2t)[:n, :m]

    ref = hamming_matrix_xla(d1, d2)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
