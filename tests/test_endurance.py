"""Endurance e2e (VERDICT r2 item 5): a multi-lap rendered loop through
System.process_image with async mapping + frame batching, long enough that
the keyframe pool wraps through culling/compaction while tracking continues
and the lap revisit closes a loop with the shipped 10^5-word vocabulary.
The full 2000-frame artifact lives in RESULTS_r03.json (scripts/
endurance_run.py); this slow-marked test runs a 2.3-lap slice of the same
protocol (reference protocol: src/main.cc:160-185 + Sim3-aligned ATE)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


@pytest.mark.slow
def test_endurance_multilap_loop_and_compaction():
    from endurance_run import run_endurance, default_vocab100k

    vocab = default_vocab100k()
    # service_polls pins the mapping worker's visible service interval
    # (6 frames ~ the live interval at this frame rate), making the whole
    # trajectory reproducible: with live timing, ulp-level shifts in
    # compile-cache state or machine load moved commit boundaries by one
    # batch and this chaotic multi-lap world flipped between a 1-frame
    # and a ~180-frame relocalization (tracked_frac 0.99 vs 0.74)
    res, system = run_endurance(
        n_frames=700, frames_per_lap=300, max_keyframes=28,
        frame_batch=4, verbose=False, vocab_path=vocab, service_polls=6)

    assert res["tracked_frac"] > 0.9, res
    # pool wrap-around actually happened (culling holes reclaimed)
    assert res["kf_pool_compactions"] >= 1, res
    # the lap revisit closed a loop using the 10^5-word vocabulary
    if vocab:
        assert res["vocab_n_words"] >= 90_000, res
    assert res["loops_closed"] >= 1, res
    # Sim3-aligned ATE small relative to the 6 m trajectory extent
    assert res["ate_rmse_sim3_m"] is not None
    assert res["ate_rmse_sim3_m"] < 0.3, res
