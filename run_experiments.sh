#!/bin/bash
# Serialized TPU experiment queue (one client at a time; the tunnel device
# wedges under concurrent clients / killed clients).
# Usage: nohup bash run_experiments.sh > experiments.log 2>&1 &
set -u
cd /root/repo

wait_for_no_client() {
  while pgrep -f "train_ccsp|solve_ccsp|solve_compose|bench.py" > /dev/null; do
    sleep 30
  done
}

run() {
  echo "=== $(date +%H:%M:%S) RUN: $*"
  "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

wait_for_no_client

# 1. evaluate the 300k qualitative model (latest milestone = 6)
run python -u solve_ccsp.py --results_dir results/qual_v2 --milestone 6 \
    --tries 10 --rejection_baseline

# 2. train the other task families (60k steps each at ~200 steps/s)
run python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 60000 --eval_every 30000 \
    --results_dir results/tri_v1
run python -u train_ccsp.py --input_mode stability_flat \
    --train_scenes 24000 --train_num_steps 60000 --eval_every 30000 \
    --results_dir results/stab_v1
run python -u train_ccsp.py --input_mode robot_box \
    --train_scenes 10000 --train_num_steps 60000 --eval_every 30000 \
    --results_dir results/robot_v1

# 3. evaluate each
run python -u solve_ccsp.py --results_dir results/tri_v1 --milestone 3 \
    --tries 10 --rejection_baseline
run python -u solve_ccsp.py --results_dir results/stab_v1 --milestone 3 \
    --tries 10
run python -u solve_ccsp.py --results_dir results/robot_v1 --milestone 3 \
    --tries 10

# 4. composed robot x qualitative inference
run python -u solve_compose.py --robot_dir results/robot_v1 \
    --robot_milestone 3 --qual_dir results/qual_v2 --qual_milestone 6 \
    --tries 10 --problems_per_count 50

# 5. final benchmark
run python -u bench.py

echo "=== experiment queue complete ==="
