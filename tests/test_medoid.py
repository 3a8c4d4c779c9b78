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


def test_refresh_medoid_descriptors_device_gather(rng):
    """The one-program refresh must reproduce the straightforward host
    formulation: for every point observed by the target keyframe, the
    medoid of all its observation descriptors lands in mp_desc."""
    K, N, P = 6, 32, 40
    kf_obs = np.full((K, N), -1, np.int32)
    kf_desc = rng.integers(0, 2**32, (K, N, 8), dtype=np.uint32)
    # point p observed by keyframes p % 3, p % 3 + 1, and 5
    for p in range(P):
        for k in (p % 3, p % 3 + 1, 5):
            slot = (p * 7 + k) % N
            if kf_obs[k, slot] < 0:
                kf_obs[k, slot] = p
    mp_desc0 = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    out = np.asarray(mk.refresh_medoid_descriptors(
        jnp.asarray(kf_obs), jnp.asarray(kf_desc), jnp.asarray(mp_desc0),
        jnp.int32(5), max_obs=8, cap=64))

    def ham(a, b):
        return sum(bin(int(x)).count("1") for x in np.bitwise_xor(a, b))

    touched = sorted(set(kf_obs[5][kf_obs[5] >= 0].tolist()))
    assert touched, "fixture must observe points from kf 5"
    for p in range(P):
        sets = [kf_desc[k, s] for k in range(K) for s in range(N)
                if kf_obs[k, s] == p]
        if p in touched and sets:
            meds = []
            for d in sets:
                ds = sorted(ham(d, o) for o in sets)
                meds.append(ds[(len(sets) - 1) // 2])
            best = sets[int(np.argmin(meds))]
            np.testing.assert_array_equal(out[p], best)
        else:
            np.testing.assert_array_equal(out[p], mp_desc0[p])
