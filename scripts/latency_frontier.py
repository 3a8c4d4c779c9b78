"""Measured fps-vs-pose-latency frontier over frame_batch (VERDICT r4
weak #1 / next-round #2).

The tracker amortizes the relay's fixed per-dispatch cost over
frame_batch frames (1 scan program + 1 blob fetch per batch, depth-1
software pipelining), so throughput rises with batch size while pose
latency — submit to retire, what a live consumer feels — rises with it
too (a frame's pose lands when its batch retires, roughly fill time +
one batch period + the fetch).  The reference retires a pose every
frame at its 33 ms camera period (src/main.cc:146-148); this script
records where this system can sit on that trade-off, one full bench.py
run per batch size (same warmup, prewarm, 600-frame window, honesty
asserts).

Usage:  python scripts/latency_frontier.py --out LATENCY_r05.json
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_point(frame_batch: int, timeout_s: int = 2400):
    env = dict(os.environ, ORB_SLAM_TPU_FRAME_BATCH=str(frame_batch))
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                           timeout=timeout_s, env=env, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        return {"frame_batch": frame_batch, "error": "timeout"}
    row = {"frame_batch": frame_batch, "rc": r.returncode,
           "wall_s": round(time.time() - t0, 1)}
    detail = [ln for ln in r.stdout.splitlines() if ln.startswith("#")]
    row["detail"] = detail[-3:]
    for ln in reversed(r.stdout.splitlines()):
        try:
            j = json.loads(ln)
        except (json.JSONDecodeError, ValueError):
            continue
        if j.get("metric") == "tracking_fps":
            row.update(fps=j.get("value"), vs_baseline=j.get("vs_baseline"),
                       pose_latency_ms=j.get("pose_latency_ms"),
                       keyframe_insertions=j.get("keyframe_insertions"),
                       error=j.get("error"))
            break
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    ap.add_argument("--batches", default="4,8,12,16,24")
    args = ap.parse_args()
    results = {"points": [], "baseline_fps": 30.0,
               "note": ("each point is one full bench.py run (warmup + "
                        "prewarm + 600-frame measured window with the "
                        ">=5-insertion honesty gate); a point whose gate "
                        "fails is recorded with its error, not dropped")}
    for fb in (int(x) for x in args.batches.split(",")):
        row = run_point(fb)
        results["points"].append(row)
        print(json.dumps(row), flush=True)
        if args.out:   # checkpoint after every point: runs are ~10 min each
            with open(args.out, "w") as f:
                json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
