#!/bin/bash
# Serialized TPU experiment queue. One device client at a time; every job runs
# under the stall watchdog (the tunnel transport occasionally wedges D2H
# readbacks — see run_with_watchdog.sh).
# Usage: nohup bash run_experiments.sh > experiments.log 2>&1 &
set -u
cd /root/repo

wait_for_no_client() {
  while pgrep -f "train_ccsp|solve_ccsp|solve_compose|bench.py" > /dev/null; do
    sleep 30
  done
}

wd() {  # wd LOGFILE cmd...
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "$log" 600 4 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/denoised_t=*.json results/*/config.json \
      results/*/metrics.jsonl results/*/composed*.json BENCH_partial.json \
      2>/dev/null
  git add *.log 2>/dev/null
  git commit -q -m "experiment queue: record results ($1)" 2>/dev/null || true
}

wait_for_no_client

# 1. benchmark first — always recorded
wd bench_final.log python -u bench.py
tail -1 bench_final.log > BENCH_partial.json
commit_artifacts bench

# 2. evaluate the 300k qualitative model (latest milestone = 6)
wd eval_qual_v2.log python -u solve_ccsp.py --results_dir results/qual_v2 \
    --milestone 6 --tries 10 --rejection_baseline
commit_artifacts qual_v2

# 3. train + evaluate the other task families (40k steps each)
wd train_tri_v1.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 40000 --eval_every 40000 \
    --results_dir results/tri_v1
wd eval_tri_v1.log python -u solve_ccsp.py --results_dir results/tri_v1 \
    --milestone 1 --tries 10 --rejection_baseline
commit_artifacts tri_v1

wd train_stab_v1.log python -u train_ccsp.py --input_mode stability_flat \
    --train_scenes 12000 --train_num_steps 40000 --eval_every 40000 \
    --results_dir results/stab_v1
wd eval_stab_v1.log python -u solve_ccsp.py --results_dir results/stab_v1 \
    --milestone 1 --tries 10
commit_artifacts stab_v1

wd train_robot_v1.log python -u train_ccsp.py --input_mode robot_box \
    --train_scenes 10000 --train_num_steps 40000 --eval_every 40000 \
    --results_dir results/robot_v1
wd eval_robot_v1.log python -u solve_ccsp.py --results_dir results/robot_v1 \
    --milestone 1 --tries 10
commit_artifacts robot_v1

# 4. composed robot x qualitative inference
wd eval_compose.log python -u solve_compose.py --robot_dir results/robot_v1 \
    --robot_milestone 1 --qual_dir results/qual_v2 --qual_milestone 6 \
    --tries 10 --problems_per_count 50
commit_artifacts composed

echo "=== experiment queue complete ==="
