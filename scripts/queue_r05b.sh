#!/bin/bash
# Remaining round-5 TPU evidence, run the moment the axon tunnel recovers.
# BA_CITY_r05.json is already banked; what's left: the headline re-measure
# on the final tree, the on-TPU endurance at 10^6 words, and the
# fps-vs-latency frontier.  Every step is independently resumable and
# bounded by timeout (a dead tunnel hangs device init forever).
set -x
cd "$(dirname "$0")/.."

for i in $(seq 1 60); do
    if timeout 150 python -c "import jax; print(jax.devices())"; then
        break
    fi
    sleep 240
done
timeout 150 python -c "import jax; print(jax.devices())" || exit 1

# 1. headline re-measure on the final tree (driver conditions).  Two runs:
#    the first repopulates the relay compile cache for any program the
#    tracker changes invalidated; the second is the steady-state capture.
timeout 2400 python bench.py > /tmp/bench_r05_warm.out 2>&1
timeout 2400 python bench.py > /tmp/bench_r05_final.out 2>&1

# 2. on-TPU endurance at 10^6 words with forced loss (VERDICT r4 next #5)
timeout 7200 python scripts/endurance_run.py --frames 2000 \
    --blackout 1200:8 --vocab orb_slam_tpu/data/vocab1m.npz \
    --out RESULTS_r05.json > /tmp/endurance_r05_tpu.out 2>&1

# 3. fps-vs-pose-latency frontier over frame_batch (VERDICT r4 next #2)
timeout 12000 python scripts/latency_frontier.py --out LATENCY_r05.json \
    > /tmp/latency_r05.out 2>&1

echo QUEUE_DONE
