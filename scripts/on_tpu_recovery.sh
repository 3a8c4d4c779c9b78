#!/bin/bash
# Run the round-5 TPU evidence sweep the moment the axon tunnel is back.
# Each step is independently resumable and writes an artifact; everything
# runs under timeout because a dead tunnel hangs device init forever.
set -x
cd "$(dirname "$0")/.."

# 0. reachability (bench.py's supervisor probe logic, standalone)
timeout 150 python -c "import jax; print(jax.devices())" || exit 1

# 1. city-scale BA: flat vs GRID layout (scatter/onehot) at 64/256/512 KF
#    (VERDICT r4 missing #3/#4, weak #4 — the 512-KF row is the deliverable)
timeout 3600 python scripts/ba_city_bench.py --out BA_CITY_r05.json

# 2. fps-vs-pose-latency frontier over frame_batch (VERDICT r4 next #2)
timeout 12000 python scripts/latency_frontier.py --out LATENCY_r05.json

# 3. on-TPU endurance at 10^6 words with forced loss (VERDICT r4 next #5)
timeout 7200 python scripts/endurance_run.py --frames 2000 \
    --blackout 1200:8 --vocab orb_slam_tpu/data/vocab1m.npz \
    --out RESULTS_r05.json

# 4. headline re-capture on the final tree (driver conditions)
timeout 2400 python bench.py | tee /tmp/bench_r05.out
