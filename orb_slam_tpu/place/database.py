"""Keyframe database: loop/relocalisation candidate retrieval.

TPU-native replacement of KeyFrameDatabase (src/KeyFrameDatabase.cc).  The
reference walks a word->keyframe inverted file; here the database is a dense
[max_kf, n_words] TF-IDF matrix and every query is one matmul + masked
reductions, preserving the reference's selection semantics:

  DetectLoopCandidates (KeyFrameDatabase.cc:75-196):
    1. count shared words with every keyframe, excluding the query's
       covisibility neighborhood;
    2. keep keyframes with sharedWords > 0.8 * maxCommonWords and
       L1 similarity >= minScore;
    3. accumulate scores over each candidate's top-10 covisibility group and
       keep those above 0.75 * bestAccumulated.

  DetectRelocalisationCandidates (:198-308): same pipeline without the
  minScore gate and without excluding neighbors.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .vocabulary import Vocabulary, transform, score_l1


class BowDatabase(NamedTuple):
    rows: jnp.ndarray      # [max_kf, n_words] float32 L1-normalized TF-IDF
    has_row: jnp.ndarray   # [max_kf] bool

    @staticmethod
    def create(max_kf: int, n_words: int) -> "BowDatabase":
        return BowDatabase(
            rows=jnp.zeros((max_kf, n_words), jnp.float32),
            has_row=jnp.zeros(max_kf, bool),
        )

    def add(self, kf_id: int, bow: jnp.ndarray) -> "BowDatabase":
        return BowDatabase(
            rows=self.rows.at[kf_id].set(bow),
            has_row=self.has_row.at[kf_id].set(True),
        )

    def remove(self, kf_id: int) -> "BowDatabase":
        return BowDatabase(
            rows=self.rows.at[kf_id].set(0.0),
            has_row=self.has_row.at[kf_id].set(False),
        )


@jax.jit
def query_scores(db: BowDatabase, bow: jnp.ndarray):
    """Returns (shared_word_counts [K], l1_scores [K]) vs every keyframe."""
    present = db.rows > 0
    q = bow > 0
    shared = jnp.sum(present & q[None, :], axis=1)
    scores = score_l1(bow[None, :], db.rows)
    return shared * db.has_row, jnp.where(db.has_row, scores, -1.0)


def detect_candidates(
    db: BowDatabase,
    bow: jnp.ndarray,
    exclude: np.ndarray,
    covis_weights: np.ndarray,
    min_score: float | None,
    shared_ratio: float = 0.8,
    acc_ratio: float = 0.75,
    top_group: int = 10,
) -> np.ndarray:
    """Shared semantics of DetectLoop/DetectRelocalisationCandidates.

    exclude: [K] bool — keyframes never returned (query + its covisible
    neighborhood for loops; empty for reloc).
    covis_weights: [K, K] covisibility weights for group accumulation.
    Returns candidate keyframe ids (host array).
    """
    shared, scores = query_scores(db, bow)
    shared = np.asarray(shared)
    scores = np.asarray(scores)
    shared = np.where(exclude, 0, shared)

    max_common = shared.max()
    if max_common == 0:
        return np.asarray([], np.int64)
    min_common = shared_ratio * max_common
    ok = (shared > min_common) & (shared > 0)
    if min_score is not None:
        ok &= scores >= min_score
    cand = np.where(ok)[0]
    if len(cand) == 0:
        return np.asarray([], np.int64)

    # covisibility-group accumulated score (KeyFrameDatabase.cc:138-176):
    # for each candidate, sum the scores of itself + its top-10 covisible
    # keyframes that are also candidates; the group's best member represents
    # the group.
    acc_scores = []
    best_of_group = []
    ok_set = ok
    for c in cand:
        w = covis_weights[c].copy()
        top = np.argsort(-w)[:top_group]
        group = [c] + [int(t) for t in top if w[t] > 0]
        members = [g for g in group if ok_set[g]]
        acc = float(scores[members].sum())
        best = members[int(np.argmax(scores[members]))]
        acc_scores.append(acc)
        best_of_group.append(best)

    acc_scores = np.asarray(acc_scores)
    cut = acc_ratio * acc_scores.max()
    keep = np.unique([b for b, a in zip(best_of_group, acc_scores) if a >= cut])
    return keep
