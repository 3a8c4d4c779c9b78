"""ORBvoc.txt format loader: the reference's vocabulary file format
(TemplatedVocabulary::loadFromTextFile, TemplatedVocabulary.h:1338).
The real blob is absent from the snapshot (.MISSING_LARGE_BLOBS), so the
test writes a tiny vocabulary in the same format."""
import numpy as np
import jax.numpy as jnp

from orb_slam_tpu.place import vocabulary as voc_mod


def write_tiny_voc(path, k=2, L=2, rng=None):
    """Header `k L scoring weighting`; then per node (tree order):
    `parent is_leaf d0..d31 weight`."""
    rng = rng or np.random.default_rng(0)
    lines = [f"{k} {L} 0 0"]
    # nodes: root=0 implicit; children of 0: nodes 1,2; children of 1: 3,4
    # (leaves); children of 2: 5,6 (leaves)
    parents = [0, 0, 1, 1, 2, 2]
    is_leaf = [0, 0, 1, 1, 1, 1]
    descs = rng.integers(0, 256, (6, 32))
    for i in range(6):
        d = " ".join(str(x) for x in descs[i])
        w = 0.5 if is_leaf[i] else 0.0
        lines.append(f"{parents[i]} {is_leaf[i]} {d} {w}")
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    return descs


def test_load_orbvoc_text(tmp_path, rng):
    p = str(tmp_path / "ORBvoc.txt")
    descs = write_tiny_voc(p, rng=rng)
    voc = voc_mod.load_orbvoc_text(p)
    assert voc.k == 2 and voc.depth == 2
    assert voc.n_words == 4
    # transform something: a descriptor equal to a leaf centroid must land
    # in a word deterministically
    d = jnp.asarray(descs[3].astype(np.uint8).copy().view(np.uint32)[None, :])
    bow = voc_mod.transform(voc, d, jnp.ones(1, bool))
    assert float(bow.weights.sum()) > 0.99
    assert int((bow.weights > 0).sum()) == 1
