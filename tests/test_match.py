import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.ops import match


def rand_desc(rng, n):
    return jnp.asarray(rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32))


def flip_bits(rng, desc, n_bits):
    """Flip n_bits random bits in each descriptor."""
    d = np.asarray(desc).copy()
    for i in range(d.shape[0]):
        for b in rng.choice(256, size=n_bits, replace=False):
            d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return jnp.asarray(d)


def test_hamming_matrix_vs_bruteforce(rng):
    d1, d2 = rand_desc(rng, 16), rand_desc(rng, 24)
    dist = np.asarray(match.hamming_matrix(d1, d2))
    for i in range(16):
        for j in range(0, 24, 5):
            x = np.bitwise_xor(np.asarray(d1)[i], np.asarray(d2)[j])
            expected = sum(bin(int(v)).count("1") for v in x)
            assert dist[i, j] == expected


def test_hamming_identity_is_zero(rng):
    d = rand_desc(rng, 8)
    dist = np.asarray(match.hamming_matrix(d, d))
    assert np.all(np.diag(dist) == 0)


def test_match_nn_recovers_permutation(rng):
    d1 = rand_desc(rng, 64)
    perm = rng.permutation(64)
    d2 = flip_bits(rng, np.asarray(d1)[perm], 5)  # noisy copies, shuffled
    dist = match.hamming_matrix(d1, d2)
    m = match.match_nn(dist, max_dist=50, ratio=0.9)
    idx = np.asarray(m.idx)
    ok = np.asarray(m.valid)
    # noisy random 256-bit codes: distances to non-matches ~128, to match ~5
    assert ok.sum() >= 60
    recovered = np.argsort(perm)  # d2[j] came from d1[perm[j]]
    assert np.all(idx[ok] == np.argsort(recovered)[ok] if False else True)
    for i in np.where(ok)[0]:
        assert perm[idx[i]] == i


def test_ratio_test_rejects_ambiguous(rng):
    d = rand_desc(rng, 4)
    # two identical candidates -> second best == best -> ratio test fails
    d2 = jnp.concatenate([d, d], axis=0)
    dist = match.hamming_matrix(d, d2)
    m = match.match_nn(dist, max_dist=100, ratio=0.9)
    assert not np.any(np.asarray(m.valid))


def test_mask_gating(rng):
    d1 = rand_desc(rng, 8)
    d2 = d1  # perfect matches on the diagonal
    dist = match.hamming_matrix(d1, d2)
    # gate out the diagonal -> no zero-distance matches possible
    mask = ~jnp.eye(8, dtype=bool)
    gated = match.apply_masks(dist, mask)
    m = match.match_nn(gated, max_dist=256)
    assert not np.any(np.asarray(m.dist) == 0)


def test_window_mask():
    xy1 = jnp.asarray([[10.0, 10.0], [50.0, 50.0]])
    xy2 = jnp.asarray([[12.0, 11.0], [100.0, 100.0], [48.0, 53.0]])
    m = np.asarray(match.window_mask(xy1, xy2, 5.0))
    assert m.tolist() == [[True, False, False], [False, False, True]]


def test_level_mask():
    l1 = jnp.asarray([2, 0])
    l2 = jnp.asarray([1, 2, 3, 7])
    m = np.asarray(match.level_mask(l1, l2, lo=1, hi=1))
    assert m.tolist() == [[True, True, True, False], [True, False, False, False]]


def test_resolve_duplicates(rng):
    # rows 0 and 1 both match column 3; row 1 is closer
    dist = np.full((4, 6), 200, np.int32)
    dist[0, 3] = 30
    dist[1, 3] = 10
    dist[2, 2] = 5
    m = match.match_nn(jnp.asarray(dist), max_dist=100)
    r = match.resolve_duplicates(m, n_cols=6)
    v = np.asarray(r.valid)
    assert v[1] and v[2] and not v[0]


def test_rotation_consistency(rng):
    n = 100
    d1 = rand_desc(rng, n)
    d2 = flip_bits(rng, np.asarray(d1), 4)
    dist = match.hamming_matrix(d1, d2)
    m = match.match_nn(dist, max_dist=50)
    a1 = jnp.zeros((n,))
    # 90 matches rotated by ~0.5 rad, 10 outliers scattered
    a2 = np.full(n, -0.5)
    a2[:10] = rng.uniform(1.0, 6.0, 10)
    keep = match.rotation_consistency(a1, jnp.asarray(a2), m)
    k = np.asarray(keep)
    assert k[10:].sum() >= 85       # consistent majority kept
    assert k[:10].sum() <= 3        # outliers dropped


def test_epipolar_mask_known_geometry():
    # F for pure horizontal translation: epipolar lines are horizontal,
    # correspondence must share the y coordinate. F = [e]_x R K^-T ... for
    # canonical K=I, R=I, t=(1,0,0): F = [t]_x = [[0,0,0],[0,0,-1],[0,1,0]]
    F = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
    xy1 = jnp.asarray([[0.3, 0.4]])
    xy2 = jnp.asarray([[0.9, 0.4], [0.9, 0.9]])
    s2 = jnp.ones((2,)) * 1e-4
    m = np.asarray(match.epipolar_mask(xy1, xy2, F, s2))
    assert m.tolist() == [[True, False]]
