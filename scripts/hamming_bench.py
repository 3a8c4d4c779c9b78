"""Head-to-head Hamming-matrix benchmark on the real chip (VERDICT r2
item 8 / weak #5): XLA XOR+popcount vs MXU bit-matmul vs the Pallas kernel,
at the pipeline's live shapes.  The winner gets wired as
ops.match.hamming_matrix; the losers get deleted or demoted to tests.

Methodology per memory note axon-tpu-environment: the per-call relay cost
dominates single small programs, so each formulation is timed as a scan of
ITERS back-to-back applications inside ONE program with varying inputs
(carry-xor so iterations can't be folded), giving honest per-application
device time; a device-trace capture cross-checks the large case.

Usage:
    python scripts/hamming_bench.py --out HAMMING_r03.json   (on the TPU)
    python scripts/hamming_bench.py --cpu                    (methodology)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from functools import partial


def timed_scan(fn, d1, d2, iters=32, reps=3):
    """Per-application ms for fn(d1, d2) via an in-program scan."""

    @partial(jax.jit, static_argnames=())
    def many(d1, d2):
        def step(carry, i):
            # perturb the input each iteration so nothing is loop-hoisted
            d = fn(jnp.bitwise_xor(d1, carry), d2)
            carry = jnp.bitwise_xor(
                carry, d[0, 0].astype(jnp.uint32) + jnp.uint32(i))
            return carry, d.sum()
        carry, sums = jax.lax.scan(
            step, jnp.zeros((), jnp.uint32), jnp.arange(iters))
        return sums.sum()

    np.asarray(many(d1, d2))      # compile; np.asarray is the only honest
    best = np.inf                 # completion barrier through the relay
    for _ in range(reps):         # (block_until_ready can return early)
        t0 = time.perf_counter()
        np.asarray(many(d1, d2))
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from orb_slam_tpu.ops import match as m
    cases = {"xla_popcount": m.hamming_matrix_xla,
             "mxu_bitmatmul": m.hamming_matrix_mxu}
    rng = np.random.default_rng(0)
    results = {"backend": jax.default_backend(), "iters": args.iters,
               # the Pallas kernel lost the r4 head-to-head and was deleted
               # at commit 5588be1 (HAMMING_r04.json carries its numbers);
               # record the retirement explicitly so regenerated artifacts
               # don't silently drop the column match.py cites (advisor r4)
               "pallas": "retired at 5588be1 (see HAMMING_r04.json)",
               "shapes": []}
    # live shapes: frame-vs-frame (track), frame-vs-landmark-window
    # (local-map matching), frame-vs-keyframe-row (reloc/loop)
    for (N, M) in ((1024, 1024), (1024, 2048), (640, 640)):
        d1 = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
        d2 = jnp.asarray(rng.integers(0, 2**32, (M, 8), dtype=np.uint32))
        row = {"N": N, "M": M}
        ref = None
        for name, fn in cases.items():
            out = np.asarray(jax.jit(fn)(d1, d2))
            if ref is None:
                ref = out
            else:
                np.testing.assert_array_equal(out, ref)   # all must agree
            row[f"{name}_ms"] = round(timed_scan(fn, d1, d2, args.iters), 4)
        results["shapes"].append(row)
        print(json.dumps(row), flush=True)

    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
