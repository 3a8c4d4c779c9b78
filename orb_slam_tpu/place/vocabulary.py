"""Bag-of-words vocabulary: TPU-native replacement of DBoW2's
TemplatedVocabulary (Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h).

Design differences (deliberate, SURVEY.md §2.2):
  * the k-ary tree is stored as dense arrays (children index table +
    packed-u32 centroid descriptors) and the descent for ALL N descriptors
    of a frame runs level-synchronously: one gather + one batched Hamming
    argmin per level — no pointer chasing;
  * BoW vectors are DENSE [n_words] TF-IDF rows (L1-normalized).  With the
    default 10^4-word vocabulary a keyframe row is 40 KB, the whole
    keyframe database is a [max_kf, n_words] matrix, and every similarity
    query in KeyFrameDatabase becomes one MXU matmul — replacing DBoW2's
    inverted-file walk (the inverted file exists to make sparse CPU scoring
    cheap; a dense matmul is faster on TPU at these sizes);
  * DBoW2's FeatureVector (node-id pairing at levelsup=4, used to restrict
    CPU matching) is unnecessary: the matchers compare all pairs on the VPU.

The reference ships a 10^6-word vocabulary (k=10, L=6) whose blob is absent
from this snapshot (.MISSING_LARGE_BLOBS).  This module trains a vocabulary
from data (hierarchical binary k-medians, same construction as DBoW2) and
also reads the standard ORBvoc.txt format (TemplatedVocabulary.h:1338) if a
file is provided.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp


class Vocabulary(NamedTuple):
    """Dense k-ary vocabulary tree over packed 256-bit descriptors."""

    children: jnp.ndarray   # [n_nodes, k] int32 child node ids (-1 = none)
    node_desc: jnp.ndarray  # [n_nodes, 8] uint32 centroid descriptors
    word_id: jnp.ndarray    # [n_nodes] int32 leaf word id (-1 internal)
    weights: jnp.ndarray    # [n_words] float32 IDF weights
    k: int
    depth: int
    n_words: int


def _popcount_rows(x: np.ndarray) -> np.ndarray:
    return np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)


def _majority_center(desc: np.ndarray) -> np.ndarray:
    """Bitwise majority vote (FORB::meanValue, FORB.cpp:28-77)."""
    bits = np.unpackbits(desc.view(np.uint8), axis=-1)  # [n, 256]
    maj = (bits.sum(0) * 2 >= len(bits)).astype(np.uint8)
    return np.packbits(maj).view(np.uint32)


def _kmedians(desc: np.ndarray, k: int, rng, iters: int = 8) -> np.ndarray:
    """Binary k-medians: Hamming assignment + majority-vote centers."""
    n = len(desc)
    centers = desc[rng.choice(n, size=min(k, n), replace=False)].copy()
    for _ in range(iters):
        d = _popcount_rows(desc[:, None, :] ^ centers[None, :, :])
        assign = d.argmin(1)
        for c in range(len(centers)):
            sel = assign == c
            if sel.sum() > 0:
                centers[c] = _majority_center(desc[sel])
    return centers


def train(descriptors: np.ndarray, k: int = 10, depth: int = 4,
          seed: int = 0) -> Vocabulary:
    """Hierarchical binary k-medians (TemplatedVocabulary::create semantics).

    descriptors: [M, 8] uint32.  Default k=10, depth=4 -> up to 10^4 words.
    """
    rng = np.random.default_rng(seed)
    max_nodes = sum(k**l for l in range(depth + 1))
    children = np.full((max_nodes, k), -1, np.int32)
    node_desc = np.zeros((max_nodes, 8), np.uint32)
    level_of = np.zeros(max_nodes, np.int32)
    n_nodes = 1  # root = 0

    # BFS split
    queue = [(0, descriptors, 0)]
    leaves = []
    while queue:
        node, data, level = queue.pop(0)
        if level == depth or len(data) <= 1:
            leaves.append(node)
            continue
        centers = _kmedians(data, k, rng)
        d = _popcount_rows(data[:, None, :] ^ centers[None, :, :])
        assign = d.argmin(1)
        for c in range(len(centers)):
            sel = assign == c
            if not sel.any():
                continue
            cid = n_nodes
            n_nodes += 1
            children[node, c] = cid
            node_desc[cid] = centers[c]
            level_of[cid] = level + 1
            queue.append((cid, data[sel], level + 1))

    word_id = np.full(max_nodes, -1, np.int32)
    for w, leaf in enumerate(leaves):
        word_id[leaf] = w
    n_words = len(leaves)

    # uniform IDF weights (DBoW2 TF_IDF with uniform corpus; refined by
    # the database as keyframes arrive is possible — reference keeps the
    # training-corpus IDF, so do we)
    weights = np.ones(n_words, np.float32)

    return Vocabulary(
        children=jnp.asarray(children[:n_nodes]),
        node_desc=jnp.asarray(node_desc[:n_nodes]),
        word_id=jnp.asarray(word_id[:n_nodes]),
        weights=jnp.asarray(weights),
        k=k, depth=depth, n_words=n_words,
    )


def transform(voc: Vocabulary, desc: jnp.ndarray, valid: jnp.ndarray
              ) -> jnp.ndarray:
    """Descriptors [N, 8] uint32 -> dense L1-normalized TF-IDF BoW [n_words].

    Batched level-synchronous tree descent (replaces the per-descriptor
    recursive descent of TemplatedVocabulary::transform)."""
    n = desc.shape[0]
    node = jnp.zeros(n, jnp.int32)
    for _ in range(voc.depth):
        ch = voc.children[node]                       # [N, k]
        cd = voc.node_desc[jnp.clip(ch, 0, None)]     # [N, k, 8]
        x = jnp.bitwise_xor(desc[:, None, :], cd)
        dist = jnp.sum(jax.lax.population_count(x), axis=-1)
        dist = jnp.where(ch >= 0, dist, 1 << 20)
        best = jnp.argmin(dist, axis=1)
        nxt = ch[jnp.arange(n), best]
        # descriptors stuck at a childless node stay there (short branch)
        node = jnp.where(nxt >= 0, nxt, node)
    words = voc.word_id[node]                          # [N]
    words = jnp.where(valid & (words >= 0), words, voc.n_words)
    vec = jnp.zeros(voc.n_words + 1, jnp.float32).at[words].add(1.0)
    vec = vec[: voc.n_words] * voc.weights
    s = jnp.sum(vec)
    return vec / jnp.maximum(s, 1e-9)


def score_l1(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """DBoW2 L1 score in [0, 1]: 1 - 0.5 * |a - b|_1 for L1-normalized
    vectors (ScoringObject.cpp L1Scoring), batched over leading dims of b."""
    return 1.0 - 0.5 * jnp.sum(jnp.abs(a - b), axis=-1)


def load_orbvoc_text(path: str) -> Vocabulary:
    """Read the standard ORBvoc.txt format (TemplatedVocabulary.h:1338):
    header `k L scoring weighting`, then one node per line:
    `parent_is_leaf? descriptor(32 bytes) weight` in tree order."""
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        rows = []
        for line in f:
            parts = line.split()
            if len(parts) < 35:
                continue
            parent = int(parts[0])
            is_leaf = bool(int(parts[1]))
            d = np.array([int(x) for x in parts[2:34]], np.uint8)
            w = float(parts[34])
            rows.append((parent, is_leaf, d, w))

    n_nodes = len(rows) + 1
    children = np.full((n_nodes, k), -1, np.int32)
    node_desc = np.zeros((n_nodes, 8), np.uint32)
    word_id = np.full(n_nodes, -1, np.int32)
    weights = []
    child_count = np.zeros(n_nodes, np.int32)
    for i, (parent, is_leaf, d, w) in enumerate(rows):
        nid = i + 1
        slot = child_count[parent]
        if slot < k:
            children[parent, slot] = nid
            child_count[parent] += 1
        node_desc[nid] = d.copy().view(np.uint32)
        if is_leaf:
            word_id[nid] = len(weights)
            weights.append(w)
    return Vocabulary(
        children=jnp.asarray(children),
        node_desc=jnp.asarray(node_desc),
        word_id=jnp.asarray(word_id),
        weights=jnp.asarray(np.asarray(weights, np.float32)),
        k=k, depth=L, n_words=len(weights),
    )
