"""Native graph ops: correctness vs NumPy fallback + build sanity."""
import numpy as np

from orb_slam_tpu import native


def test_native_built():
    # the toolchain is available in this environment; the extension must build
    assert native.HAS_NATIVE


def test_pack_ba_edges_matches_fallback(rng):
    C, N, P = 4, 32, 100
    obs = rng.integers(-1, P, (C, N)).astype(np.int32)
    kpv = rng.uniform(size=(C, N)) > 0.2
    lut = np.full(P + 1, -1, np.int32)
    sel = rng.choice(P, 40, replace=False)
    lut[sel] = np.arange(40, dtype=np.int32)

    out_native = native.pack_ba_edges(obs, kpv, lut)
    # force fallback
    saved = native._graphops
    native._graphops = None
    out_py = native.pack_ba_edges(obs, kpv, lut)
    native._graphops = saved
    for a, b in zip(out_native, out_py):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_remap_observations_merges_and_dedups(rng):
    P = 50
    obs = np.asarray([[1, 2, 3, -1, 7], [2, 2, 9, -1, 1]], np.int32)
    lut = np.arange(P + 1, dtype=np.int32)
    lut[3] = 1   # merge landmark 3 -> 1
    lut[9] = 2   # merge landmark 9 -> 2
    obs_n = obs.copy()
    native.remap_observations(obs_n, lut)
    # row 0: [1, 2, 3->1 dup -> -1, -1, 7]
    assert obs_n[0].tolist() == [1, 2, -1, -1, 7]
    # row 1: [2, 2 dup -> -1, 9->2 dup -> -1, -1, 1]
    assert obs_n[1].tolist() == [2, -1, -1, -1, 1]

    # fallback agreement
    saved = native._graphops
    native._graphops = None
    obs_p = obs.copy()
    native.remap_observations(obs_p, lut)
    native._graphops = saved
    np.testing.assert_array_equal(obs_n, obs_p)


def test_vote_keyframes(rng):
    obs = np.asarray([[0, 1, -1], [2, 3, 4], [5, 5, -1]], np.int32)
    seed = np.zeros(10, bool)
    seed[[1, 2, 3, 5]] = True
    votes = native.vote_keyframes(obs, seed)
    assert votes.tolist() == [1, 2, 2]


def test_covisibility_counts(rng):
    """Sparse CSR counting == dense incidence product, native == fallback."""
    K, N, P = 24, 48, 200
    obs = np.full((K, N), -1, np.int32)
    for k in range(K):
        n_obs = rng.integers(5, N)
        pts = rng.choice(P, size=n_obs, replace=False)
        obs[k, :n_obs] = pts
    kf_valid = np.ones(K, bool)
    kf_valid[3] = False

    # dense reference
    B = np.zeros((K, P), np.float64)
    rows = np.repeat(np.arange(K), N)
    flat = obs.reshape(-1)
    sel = flat >= 0
    B[rows[sel], flat[sel]] = 1.0
    W_ref = (B @ B.T).astype(np.int32)
    W_ref *= kf_valid[:, None] & kf_valid[None, :]
    np.fill_diagonal(W_ref, 0)

    W = native.covisibility_counts(obs, kf_valid, P)
    np.testing.assert_array_equal(W, W_ref)

    saved = native._graphops
    native._graphops = None
    try:
        W_py = native.covisibility_counts(obs, kf_valid, P)
    finally:
        native._graphops = saved
    np.testing.assert_array_equal(W_py, W_ref)
