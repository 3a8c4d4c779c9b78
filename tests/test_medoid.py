import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.pipeline import mapping_kernels as mk


def flip(rng, d, nbits):
    d = d.copy()
    for b in rng.choice(256, nbits, replace=False):
        d[b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return d


def test_medoid_picks_central_descriptor(rng):
    base = rng.integers(0, 2**32, 8, dtype=np.uint32)
    # observations: the clean descriptor + noisy copies + one outlier
    obs = np.stack([
        flip(rng, base, 6),
        base,                       # the medoid
        flip(rng, base, 5),
        flip(rng, base, 7),
        rng.integers(0, 2**32, 8, dtype=np.uint32),  # outlier observation
    ])
    sets = np.zeros((2, 8, 8), np.uint32)
    valid = np.zeros((2, 8), bool)
    sets[0, :5] = obs
    valid[0, :5] = True
    best, has = mk.medoid_descriptors(jnp.asarray(sets), jnp.asarray(valid))
    assert bool(has[0]) and not bool(has[1])
    np.testing.assert_array_equal(np.asarray(best[0]), base)


def test_medoid_single_observation(rng):
    d = rng.integers(0, 2**32, 8, dtype=np.uint32)
    sets = np.zeros((1, 4, 8), np.uint32)
    valid = np.zeros((1, 4), bool)
    sets[0, 0] = d
    valid[0, 0] = True
    best, has = mk.medoid_descriptors(jnp.asarray(sets), jnp.asarray(valid))
    assert bool(has[0])
    np.testing.assert_array_equal(np.asarray(best[0]), d)
