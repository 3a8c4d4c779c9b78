"""Vocabulary at realistic scale (VERDICT r1 item 3): sparse scoring must
support 10^4+ words, TF-IDF weights must come from the training corpus, and
the ORBvoc.txt writer/loader must round-trip (golden-format test — the
reference's blob is absent, so we generate a reference-format file and
verify scoring equivalence after reload, TemplatedVocabulary.h:1127-1193,
1338)."""
import numpy as np
import jax.numpy as jnp
import pytest

from orb_slam_tpu.place import vocabulary as voc_mod
from orb_slam_tpu.place import database as db_mod


def rand_desc(rng, n):
    return rng.integers(0, 2**32, size=(n, 8), dtype=np.uint32)


def flip(rng, d, nbits):
    d = d.copy()
    for i in range(len(d)):
        for b in rng.choice(256, nbits, replace=False):
            d[i, b // 32] ^= np.uint32(1) << np.uint32(b % 32)
    return d


@pytest.fixture(scope="module")
def big_voc():
    rng = np.random.default_rng(0)
    corpus = rand_desc(rng, 30000)
    doc_ids = np.repeat(np.arange(60), 500)
    return voc_mod.train(corpus, k=10, depth=4, doc_ids=doc_ids)


def test_train_10k_words(big_voc):
    assert big_voc.n_words >= 5000, big_voc.n_words


def test_tf_idf_weights_nonuniform(big_voc):
    w = np.asarray(big_voc.weights)[: big_voc.n_words]
    assert w.min() >= 0
    assert w.max() > 0
    # a real corpus yields a spread of idf values, not a constant
    assert np.unique(np.round(w, 6)).size > 10


def test_scoring_scale_independent(big_voc):
    """Same-scene-vs-revisit ranking must hold with a 10^4-word vocab."""
    rng = np.random.default_rng(1)
    scenes = [rand_desc(rng, 300) for _ in range(4)]
    bows = [voc_mod.transform(big_voc, jnp.asarray(s), jnp.ones(300, bool))
            for s in scenes]
    bq = voc_mod.transform(
        big_voc, jnp.asarray(flip(rng, scenes[1], 6)), jnp.ones(300, bool))
    scores = [float(voc_mod.score_l1(bq, b)) for b in bows]
    assert int(np.argmax(scores)) == 1
    assert scores[1] > 3 * max(s for i, s in enumerate(scores) if i != 1)


def test_detect_candidates_large_vocab(big_voc):
    rng = np.random.default_rng(2)
    K, N = 16, 400
    db = db_mod.BowDatabase.create(K, N)
    scenes = [rand_desc(rng, N) for _ in range(12)]
    for k in range(12):
        db = db.add(k, voc_mod.transform(
            big_voc, jnp.asarray(scenes[k]), jnp.ones(N, bool)))
    bq = voc_mod.transform(
        big_voc, jnp.asarray(flip(rng, scenes[7], 5)), jnp.ones(N, bool))
    cands = db_mod.detect_candidates(
        db, bq, np.zeros(K, bool), np.zeros((K, K)), min_score=0.01)
    assert 7 in cands


def test_sparse_matches_dense_score(big_voc):
    """The searchsorted merge must equal the dense 1 - 0.5|a-b|_1."""
    rng = np.random.default_rng(3)
    a = voc_mod.transform(big_voc, jnp.asarray(rand_desc(rng, 200)),
                          jnp.ones(200, bool))
    base = rand_desc(rng, 200)
    b = voc_mod.transform(big_voc, jnp.asarray(flip(rng, base, 30)),
                          jnp.ones(200, bool))
    sparse = float(voc_mod.score_l1(a, b))
    da = np.asarray(voc_mod.densify(big_voc, a))
    dbv = np.asarray(voc_mod.densify(big_voc, b))
    dense = 1.0 - 0.5 * np.abs(da - dbv).sum()
    np.testing.assert_allclose(sparse, dense, atol=1e-5)


def test_orbvoc_text_roundtrip(tmp_path, big_voc):
    """save -> load must preserve scoring behavior exactly (word ids may be
    relabeled; scores and word-occupancy structure are invariants)."""
    p = str(tmp_path / "voc.txt")
    voc_mod.save_orbvoc_text(big_voc, p)
    voc2 = voc_mod.load_orbvoc_text(p)
    assert voc2.k == big_voc.k and voc2.depth == big_voc.depth
    assert voc2.n_words == big_voc.n_words

    rng = np.random.default_rng(4)
    scenes = [rand_desc(rng, 150) for _ in range(3)]
    bows1 = [voc_mod.transform(big_voc, jnp.asarray(s), jnp.ones(150, bool))
             for s in scenes]
    bows2 = [voc_mod.transform(voc2, jnp.asarray(s), jnp.ones(150, bool))
             for s in scenes]
    for i in range(3):
        for j in range(3):
            s1 = float(voc_mod.score_l1(bows1[i], bows1[j]))
            s2 = float(voc_mod.score_l1(bows2[i], bows2[j]))
            np.testing.assert_allclose(s1, s2, atol=1e-4)


def test_npz_roundtrip(tmp_path, big_voc):
    p = str(tmp_path / "voc.npz")
    voc_mod.save_npz(big_voc, p)
    voc2 = voc_mod.load_npz(p)
    rng = np.random.default_rng(5)
    d = jnp.asarray(rand_desc(rng, 100))
    b1 = voc_mod.transform(big_voc, d, jnp.ones(100, bool))
    b2 = voc_mod.transform(voc2, d, jnp.ones(100, bool))
    np.testing.assert_array_equal(np.asarray(b1.ids), np.asarray(b2.ids))
    np.testing.assert_allclose(np.asarray(b1.weights),
                               np.asarray(b2.weights), atol=1e-6)


def test_transform_np_matches_device(big_voc):
    """The host (numpy) twin of transform/score must match the jnp path
    bit-for-bit — the loop closer runs the host twin at keyframe rate
    (place/database.py module docstring)."""
    rng = np.random.default_rng(6)
    d = rand_desc(rng, 300)
    valid = rng.random(300) > 0.1
    b_dev = voc_mod.transform(big_voc, jnp.asarray(d), jnp.asarray(valid))
    b_np = voc_mod.transform_np(big_voc, d, valid)
    np.testing.assert_array_equal(np.asarray(b_dev.ids), b_np.ids)
    np.testing.assert_allclose(np.asarray(b_dev.weights), b_np.weights,
                               atol=1e-6)
    d2 = rand_desc(rng, 300)
    b2_dev = voc_mod.transform(big_voc, jnp.asarray(d2), jnp.ones(300, bool))
    b2_np = voc_mod.transform_np(big_voc, d2, np.ones(300, bool))
    s_dev = float(voc_mod.score_l1(b_dev, b2_dev))
    s_np = voc_mod.score_l1_np(b_np, b2_np)
    np.testing.assert_allclose(s_dev, s_np, atol=1e-6)


def test_score_l1_many_np_matches_device(big_voc):
    rng = np.random.default_rng(7)
    K, N = 8, 200
    rows_i = np.full((K, N), voc_mod.PAD_ID, np.int32)
    rows_w = np.zeros((K, N), np.float32)
    for k in range(K):
        b = voc_mod.transform_np(big_voc, rand_desc(rng, N),
                                 np.ones(N, bool))
        rows_i[k], rows_w[k] = b.ids, b.weights
    q = voc_mod.transform_np(big_voc, rand_desc(rng, N), np.ones(N, bool))
    s_dev, sh_dev = voc_mod.score_l1_many(
        voc_mod.SparseBow(jnp.asarray(q.ids), jnp.asarray(q.weights)),
        jnp.asarray(rows_i), jnp.asarray(rows_w))
    s_np, sh_np = voc_mod.score_l1_many_np(q, rows_i, rows_w)
    np.testing.assert_allclose(np.asarray(s_dev), s_np, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(sh_dev), sh_np)


def test_shipped_100k_vocab_ranking():
    """VERDICT r2 item 4: place recognition at 10^5 words.  Loads the
    shipped vocab100k.npz (k=10, L=5, trained on rendered+jittered ORB
    descriptors, scripts/train_vocabulary.py --augment) and checks the
    same-scene-vs-revisit ranking margin plus the host transform cost."""
    import os
    import time
    p = os.path.join(os.path.dirname(__file__), "..", "orb_slam_tpu",
                     "data", "vocab100k.npz")
    if not os.path.exists(p):
        pytest.skip("vocab100k.npz not built")
    voc = voc_mod.load_npz(p)
    assert voc.n_words >= 90_000, voc.n_words

    rng = np.random.default_rng(8)
    scenes = [rand_desc(rng, 500) for _ in range(6)]
    bows = [voc_mod.transform_np(voc, s, np.ones(500, bool))
            for s in scenes]
    bq = voc_mod.transform_np(voc, flip(rng, scenes[2], 6),
                              np.ones(500, bool))
    scores = [voc_mod.score_l1_np(bq, b) for b in bows]
    assert int(np.argmax(scores)) == 2
    assert scores[2] > 3 * max(s for i, s in enumerate(scores) if i != 2)

    t0 = time.perf_counter()
    for _ in range(5):
        voc_mod.transform_np(voc, scenes[0], np.ones(500, bool))
    per_frame_ms = (time.perf_counter() - t0) / 5 * 1e3
    # keyframe-rate budget: L=5 descent over 500 descriptors on the host
    assert per_frame_ms < 250, per_frame_ms
