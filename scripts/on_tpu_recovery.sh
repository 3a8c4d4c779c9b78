#!/bin/bash
# Run the full TPU evidence sweep the moment the axon tunnel is back
# (VERDICT r2 items 1, 6, 8).  Each step is independently resumable and
# writes a committed artifact.  Probe first: a dead tunnel hangs device
# init forever, so everything runs under timeout.
set -x
cd "$(dirname "$0")/.."

# 0. reachability (bench.py's supervisor probe logic, standalone)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline tracking fps (writes the one-line JSON the driver records)
timeout 2400 python bench.py | tee /tmp/bench_r03.out

# 2. city-scale BA ms/iter + device trace (VERDICT item 6)
timeout 2400 python scripts/ba_city_bench.py --out BA_CITY_r03.json

# 3. hamming head-to-head (VERDICT item 8) — then wire the winner
timeout 1200 python scripts/hamming_bench.py --out HAMMING_r03.json

# 4. frame_batch sweep (bench detail): rerun bench at 8/12/16
for fb in 8 16 24; do
    timeout 2400 env ORB_SLAM_TPU_FRAME_BATCH=$fb python bench.py \
        | tail -2 | tee -a /tmp/bench_sweep_r03.out
done
