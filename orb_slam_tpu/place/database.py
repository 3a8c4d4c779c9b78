"""Keyframe database: loop/relocalisation candidate retrieval.

TPU-native replacement of KeyFrameDatabase (src/KeyFrameDatabase.cc).  The
reference walks a word->keyframe inverted file; here the database stores one
SparseBow row per keyframe ([max_kf, W] sorted word ids + weights, W =
max keypoints per frame) and a query is one offset-flattened `searchsorted`
against every row — O(max_kf * W log(max_kf * W)) independent of the
vocabulary size, so the same code serves a 512-word test vocab and a
10^6-word ORBvoc.

The database lives on the HOST: queries are keyframe-rate sparse
bookkeeping over ~640-wide rows (microseconds in numpy), while a device
round trip on the tunneled TPU costs a fixed dispatch latency — place
recognition is exactly the kind of tiny irregular work the layer map keeps
off the accelerator (SURVEY.md L1/L2 split).  Selection semantics preserved:

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

from .vocabulary import SparseBow, score_l1_many_np


class BowDatabase(NamedTuple):
    ids: np.ndarray       # [max_kf, W] int32 sorted word ids (pad = large)
    w: np.ndarray         # [max_kf, W] float32 L1-normalized weights
    has_row: np.ndarray   # [max_kf] bool

    @staticmethod
    def create(max_kf: int, width: int) -> "BowDatabase":
        return BowDatabase(
            ids=np.full((max_kf, width), np.int32(2**30), np.int32),
            w=np.zeros((max_kf, width), np.float32),
            has_row=np.zeros(max_kf, bool),
        )

    # add/remove mutate IN PLACE and return self: the LoopCloser is the
    # database's sole owner (worker-thread writes; the tracker's reloc path
    # reads only after flushing the worker), and copying the whole
    # [max_kf, W] tables per keyframe is O(K*W) host work that doubles at
    # every pool growth.

    def add(self, kf_id: int, bow: SparseBow) -> "BowDatabase":
        self.ids[kf_id] = np.asarray(bow.ids)
        self.w[kf_id] = np.asarray(bow.weights)
        self.has_row[kf_id] = True
        return self

    def remove(self, kf_id: int) -> "BowDatabase":
        self.ids[kf_id] = np.int32(2**30)
        self.w[kf_id] = 0.0
        self.has_row[kf_id] = False
        return self

    def grown(self, max_kf: int) -> "BowDatabase":
        """Re-pad to a larger keyframe capacity (pool growth; ids stable)."""
        pad = max_kf - self.ids.shape[0]
        if pad <= 0:
            return self
        W = self.ids.shape[1]
        return BowDatabase(
            ids=np.concatenate(
                [self.ids, np.full((pad, W), np.int32(2**30), np.int32)]),
            w=np.concatenate([self.w, np.zeros((pad, W), np.float32)]),
            has_row=np.concatenate([self.has_row, np.zeros(pad, bool)]),
        )

    def row(self, kf_id: int) -> SparseBow:
        return SparseBow(ids=self.ids[kf_id], weights=self.w[kf_id])


def query_scores(db: BowDatabase, bow: SparseBow):
    """Returns (shared_word_counts [K], l1_scores [K]) vs every keyframe."""
    scores, shared = score_l1_many_np(bow, db.ids, db.w)
    return (shared * db.has_row,
            np.where(db.has_row, scores, -1.0))


def detect_candidates(
    db: BowDatabase,
    bow: SparseBow,
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
    # the group.  One argpartition over the candidate rows — no Python loop,
    # so detection cost stays flat as the keyframe count grows.
    K = covis_weights.shape[0]
    Wc = np.asarray(covis_weights)[cand]                  # [C, K]
    tg = min(top_group, K - 1) if K > 1 else 0
    if tg > 0:
        top = np.argpartition(-Wc, kth=tg - 1, axis=1)[:, :tg]   # [C, tg]
        wtop = np.take_along_axis(Wc, top, axis=1)
        members = np.concatenate(
            [cand[:, None], np.where(wtop > 0, top, -1)], axis=1)  # [C, 1+tg]
    else:
        members = cand[:, None]
    ok_m = (members >= 0) & ok[np.clip(members, 0, None)]
    sc = np.where(ok_m, scores[np.clip(members, 0, None)], 0.0)
    acc_scores = sc.sum(axis=1)
    # column 0 is the candidate itself (always ok), so zero-score ties
    # resolve to it — matching the loop's "members start at c" order
    best_of_group = members[np.arange(len(cand)), sc.argmax(axis=1)]
    keep = acc_scores >= acc_ratio * acc_scores.max()
    # rank by accumulated score, best first, then dedup keeping rank:
    # callers cut the list (reloc tries the top 5), so id-sorted output
    # would bias toward the OLDEST keyframes instead of the best match
    order = np.argsort(-acc_scores[keep], kind="stable")
    ranked = best_of_group[keep][order]
    _, first = np.unique(ranked, return_index=True)
    return ranked[np.sort(first)]
