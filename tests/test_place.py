import numpy as np
import jax.numpy as jnp

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


def test_train_and_transform(rng):
    corpus = rand_desc(rng, 3000)
    voc = voc_mod.train(corpus, k=8, depth=3)
    assert voc.n_words > 100
    d = jnp.asarray(rand_desc(rng, 64))
    bow = voc_mod.transform(voc, d, jnp.ones(64, bool))
    assert bow.ids.shape == (64,) and bow.weights.shape == (64,)
    np.testing.assert_allclose(float(bow.weights.sum()), 1.0, atol=1e-5)
    # ids sorted ascending, no duplicate real words
    ids = np.asarray(bow.ids)
    assert np.all(np.diff(ids) >= 0)
    real = ids[ids < voc.n_words]
    assert len(np.unique(real)) == len(real)
    # dense reconstruction agrees with weights
    dense = np.asarray(voc_mod.densify(voc, bow))
    np.testing.assert_allclose(dense.sum(), 1.0, atol=1e-5)


def test_same_image_scores_highest(rng):
    corpus = rand_desc(rng, 3000)
    voc = voc_mod.train(corpus, k=8, depth=3)
    # three "scenes" with distinct descriptor sets
    scenes = [rand_desc(rng, 200) for _ in range(3)]
    bows = [voc_mod.transform(voc, jnp.asarray(s), jnp.ones(200, bool))
            for s in scenes]
    # a noisy revisit of scene 0
    revisit = flip(rng, scenes[0], 6)
    bq = voc_mod.transform(voc, jnp.asarray(revisit), jnp.ones(200, bool))
    scores = [float(voc_mod.score_l1(bq, b)) for b in bows]
    assert np.argmax(scores) == 0
    assert scores[0] > 2 * max(scores[1], scores[2])


def test_detect_candidates_loop(rng):
    corpus = rand_desc(rng, 4000)
    voc = voc_mod.train(corpus, k=8, depth=3)
    K = 12
    db = db_mod.BowDatabase.create(K, 150)
    scenes = [rand_desc(rng, 150) for _ in range(10)]
    for k in range(10):
        bow = voc_mod.transform(voc, jnp.asarray(scenes[k]), jnp.ones(150, bool))
        db = db.add(k, bow)
    # query: revisit of scene 2 (a loop)
    bq = voc_mod.transform(
        voc, jnp.asarray(flip(rng, scenes[2], 5)), jnp.ones(150, bool))
    exclude = np.zeros(K, bool)
    exclude[8:] = True  # pretend 8,9 are the query's neighborhood
    covis = np.zeros((K, K))
    cands = db_mod.detect_candidates(db, bq, exclude, covis, min_score=0.01)
    assert 2 in cands


def test_reloc_candidates_no_exclusion(rng):
    corpus = rand_desc(rng, 4000)
    voc = voc_mod.train(corpus, k=8, depth=3)
    K = 8
    db = db_mod.BowDatabase.create(K, 120)
    scenes = [rand_desc(rng, 120) for _ in range(5)]
    for k in range(5):
        db = db.add(k, voc_mod.transform(voc, jnp.asarray(scenes[k]),
                                         jnp.ones(120, bool)))
    bq = voc_mod.transform(
        voc, jnp.asarray(flip(rng, scenes[4], 4)), jnp.ones(120, bool))
    cands = db_mod.detect_candidates(
        db, bq, np.zeros(K, bool), np.zeros((K, K)), min_score=None)
    assert 4 in cands


def test_empty_database(rng):
    corpus = rand_desc(rng, 2000)
    voc = voc_mod.train(corpus, k=8, depth=3)
    db = db_mod.BowDatabase.create(4, 50)
    bq = voc_mod.transform(voc, jnp.asarray(rand_desc(rng, 50)),
                           jnp.ones(50, bool))
    cands = db_mod.detect_candidates(
        db, bq, np.zeros(4, bool), np.zeros((4, 4)), min_score=None)
    assert len(cands) == 0
