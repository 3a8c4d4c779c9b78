"""Batched descriptor matching: the TPU replacement of ORBmatcher.

The reference implements 13 hand-specialized matchers (src/ORBmatcher.cc) that
all share one skeleton: candidate gating (spatial window / projection radius /
epipolar band / BoW node), Hamming argmin with best/second-best ratio test,
and a 30-bin rotation-consistency histogram (src/ORBmatcher.cc:40-42,
:1748-1792, :1794-1810).  Here that skeleton is a single dense pipeline:

    dist = hamming_matrix(d1, d2)             # [N, M] int32
    dist = where(mask, dist, INF)             # gating as dense masks
    matches = match_nn(dist, th, ratio)       # argmin + ratio test
    matches &= rotation_consistency(...)      # histogram filter

Dense [N, M] work (N = M = 1024) is ~1M lanes — far cheaper on the VPU than
the reference's per-cell candidate gathers are on a CPU, and it needs no grid
data structure at all (the 64x48 Frame grid of src/Frame.cc:108-122 exists
only to make CPU scans sub-quadratic).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

# plain Python/numpy scalar, NOT jnp.int32: a module-level device array
# captured as a jit closure constant demotes the axon relay to a permanent
# slow mode for the whole process (measured: every dispatch 0.1ms -> 30ms+)
INF_DIST = np.int32(1 << 20)
TWO_PI = 6.283185307179586


def hamming_matrix_xla(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise XOR+popcount formulation (materializes [N, M, 8])."""
    x = jnp.bitwise_xor(d1[:, None, :], d2[None, :, :])
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def _unpack_bits(d: jnp.ndarray) -> jnp.ndarray:
    """[N, 8] uint32 -> [N, 256] {0,1} bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (d[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    return bits.reshape(d.shape[0], 256)


def hamming_matrix_mxu(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distance as ONE MXU matmul.

    popcount(a XOR b) = |a| + |b| - 2 * |a AND b|, and |a AND b| over
    unpacked bits is a plain inner product — so the entire [N, M] distance
    matrix is a [N, 256] x [256, M] matmul on the systolic array (bf16
    inputs are exact for {0,1}; f32 accumulation is exact for sums <= 256).
    This is the TPU-native form of the reference's DescriptorDistance
    (src/ORBmatcher.cc:1794-1810): the FLOPs land on the MXU instead of a
    scalar popcount loop.
    """
    b1 = _unpack_bits(d1).astype(jnp.bfloat16)
    b2 = _unpack_bits(d2).astype(jnp.bfloat16)
    inter = jax.lax.dot_general(
        b1, b2, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # [N, M] |a AND b|
    n1 = jnp.sum(b1, axis=1, dtype=jnp.float32)      # |a|
    n2 = jnp.sum(b2, axis=1, dtype=jnp.float32)      # |b|
    return (n1[:, None] + n2[None, :] - 2.0 * inter).astype(jnp.int32)


def hamming_matrix(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distance of packed descriptors.

    d1: [N, 8] uint32, d2: [M, 8] uint32 -> [N, M] int32.

    Uses the MXU matmul formulation (hamming_matrix_mxu).  Head-to-head on
    the chip (HAMMING_r04.json, 32-application in-program scans): MXU wins
    the live matcher shapes — 0.754 vs 0.778 (xla popcount) vs 0.757
    (Pallas) ms at 1024x1024 and 0.734 vs 0.844 vs 0.786 ms at 1024x2048;
    the retired Pallas kernel edged it only at 640x640 (0.694 vs 0.705).
    The differences are 3-13%, not the "~40x" an earlier docstring claimed
    from an unrecorded measurement — at these sizes all formulations are
    dominated by the same [N,256]x[256,M]-scale data movement, and the MXU
    contraction is kept for being fastest where the pipeline actually runs
    (FORB.cpp:81-101 is the reference's scalar equivalent).
    """
    return hamming_matrix_mxu(d1, d2)


class Matches(NamedTuple):
    idx: jnp.ndarray    # [N] int32: matched column per row (-1 invalid)
    dist: jnp.ndarray   # [N] int32: best distance
    valid: jnp.ndarray  # [N] bool


def match_nn(
    dist: jnp.ndarray,
    max_dist: int,
    ratio: float = 1.0,
    mutual: bool = False,
) -> Matches:
    """Row-wise nearest neighbor with best/second-best ratio test.

    dist: [N, M] with INF_DIST at gated-out pairs.
    ratio < 1 enforces best < ratio * second-best (reference mfNNratio test,
    e.g. src/ORBmatcher.cc:231-257).
    mutual=True additionally requires row i to be the argmin of its matched
    column (used by SearchForInitialization semantics).
    """
    best_idx = jnp.argmin(dist, axis=1)
    n = dist.shape[0]
    rows = jnp.arange(n)
    best = dist[rows, best_idx]
    # second-best via masked re-min (NOT a scatter-set: dynamic non-add
    # scatters demote the axon relay to a permanent slow mode; see
    # ops/scatter.py)
    cols = jnp.arange(dist.shape[1])[None, :]
    second = jnp.min(
        jnp.where(cols == best_idx[:, None], INF_DIST, dist), axis=1)

    ok = best <= max_dist
    if ratio < 1.0:
        ok = ok & (best.astype(jnp.float32) < ratio * second.astype(jnp.float32))
    if mutual:
        col_best_row = jnp.argmin(dist, axis=0)  # [M]
        ok = ok & (col_best_row[best_idx] == rows)
    idx = jnp.where(ok, best_idx, -1)
    return Matches(idx=idx.astype(jnp.int32), dist=best, valid=ok)


def resolve_duplicates(m: Matches, n_cols: int) -> Matches:
    """Keep only the lowest-distance row per matched column (the reference
    erases the previous match when a better one lands on the same feature,
    e.g. SearchForInitialization src/ORBmatcher.cc:598-713)."""
    # segment-min of dist over columns
    col = jnp.where(m.valid, m.idx, n_cols)  # invalid -> scratch bucket
    best_per_col = jax.ops.segment_min(
        jnp.where(m.valid, m.dist, INF_DIST), col, num_segments=n_cols + 1
    )
    keep = m.valid & (m.dist <= best_per_col[col])
    # ties: keep the first row
    first_row = jax.ops.segment_min(
        jnp.where(keep, jnp.arange(m.idx.shape[0]), 1 << 30),
        col,
        num_segments=n_cols + 1,
    )
    keep = keep & (jnp.arange(m.idx.shape[0]) == first_row[col])
    return Matches(idx=jnp.where(keep, m.idx, -1), dist=m.dist, valid=keep)


def rotation_consistency(
    angle1: jnp.ndarray,
    angle2: jnp.ndarray,
    m: Matches,
    histo_length: int = 30,
    keep_bins: int = 3,
) -> jnp.ndarray:
    """Keep matches whose orientation delta falls in the top-`keep_bins` of a
    `histo_length`-bin histogram (reference ComputeThreeMaxima,
    src/ORBmatcher.cc:1748-1792).  Returns the filtered validity mask."""
    a2 = jnp.where(m.valid, angle2[jnp.clip(m.idx, 0, None)], 0.0)
    rot = jnp.mod(angle1 - a2, TWO_PI)
    bins = jnp.clip((rot / TWO_PI * histo_length).astype(jnp.int32), 0, histo_length - 1)
    hist = jnp.zeros((histo_length,), jnp.int32).at[bins].add(m.valid.astype(jnp.int32))
    top = jax.lax.top_k(hist, keep_bins)[0]
    # reference drops bins 2/3 if far below max (10% rule)
    cutoff = jnp.maximum(top[keep_bins - 1], (0.1 * top[0]).astype(jnp.int32))
    good_bin = hist >= jnp.maximum(cutoff, 1)
    return m.valid & good_bin[bins]


# ---------------------------------------------------------------------------
# Gating masks (composable with &). All return [N, M] bool.
# ---------------------------------------------------------------------------

def window_mask(xy1: jnp.ndarray, xy2: jnp.ndarray, radius: jnp.ndarray) -> jnp.ndarray:
    """|xy2[j] - xy1[i]|_inf within radius (scalar or per-row [N]).

    Covers the window searches (SearchForInitialization :598, WindowSearch
    :409) and, with xy1 = projected positions, the projection searches."""
    dx = jnp.abs(xy1[:, None, 0] - xy2[None, :, 0])
    dy = jnp.abs(xy1[:, None, 1] - xy2[None, :, 1])
    r = jnp.asarray(radius)
    r = r[:, None] if r.ndim == 1 else r
    return (dx <= r) & (dy <= r)


def level_mask(level1: jnp.ndarray, level2: jnp.ndarray,
               lo: int = 0, hi: int = 0) -> jnp.ndarray:
    """level2[j] within [level1[i]-lo, level1[i]+hi] — the scale-gating used
    by projection matchers (e.g. src/ORBmatcher.cc:90-96)."""
    d = level2[None, :] - level1[:, None]
    return (d >= -lo) & (d <= hi)


def valid_mask(valid1: jnp.ndarray, valid2: jnp.ndarray) -> jnp.ndarray:
    return valid1[:, None] & valid2[None, :]


def epipolar_mask(
    xy1: jnp.ndarray,
    xy2: jnp.ndarray,
    F12: jnp.ndarray,
    sigma2_level2: jnp.ndarray,
    chi2: float = 3.84,
) -> jnp.ndarray:
    """Point-to-epipolar-line distance gate for triangulation search.

    Mirrors CheckDistEpipolarLine (src/ORBmatcher.cc:136-153): squared
    distance of x2 from the epipolar line of x1 under F12, compared to
    chi2 * sigma^2 of x2's level.
    """
    ones = jnp.ones((xy1.shape[0], 1), xy1.dtype)
    x1h = jnp.concatenate([xy1, ones], axis=1)                  # [N, 3]
    lines = x1h @ F12.T                                          # [N, 3]
    a, b, c = lines[:, 0:1], lines[:, 1:2], lines[:, 2:3]
    # distance^2 = (a x2 + b y2 + c)^2 / (a^2 + b^2)
    val = a * xy2[None, :, 0] + b * xy2[None, :, 1] + c          # [N, M]
    den = a * a + b * b
    dsq = (val * val) / jnp.maximum(den, 1e-12)
    return dsq < chi2 * sigma2_level2[None, :]


def apply_masks(dist: jnp.ndarray, *masks: jnp.ndarray) -> jnp.ndarray:
    m = masks[0]
    for extra in masks[1:]:
        m = m & extra
    return jnp.where(m, dist, INF_DIST)
