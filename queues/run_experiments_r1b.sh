#!/bin/bash
# Round-1 continuation queue: the container was recycled (checkpoints/data
# wiped), so train+eval the three families whose results were never recorded,
# then a qualitative model to drive the composed-inference eval.
set -u
cd /root/repo

wd() {  # wd LOGFILE cmd...
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "$log" 600 3 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/denoised_t=*.json results/*/config.json \
      results/*/metrics.jsonl results/*/composed*.json 2>/dev/null
  git commit -q -m "experiment queue: record results ($1)" 2>/dev/null || true
}

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

wd train_qual_v3.log python -u train_ccsp.py --input_mode qualitative \
    --train_scenes 30000 --train_num_steps 60000 --eval_every 60000 \
    --results_dir results/qual_v3
wd eval_qual_v3.log python -u solve_ccsp.py --results_dir results/qual_v3 \
    --milestone 1 --tries 10
commit_artifacts qual_v3

wd eval_compose.log python -u solve_compose.py --robot_dir results/robot_v1 \
    --robot_milestone 1 --qual_dir results/qual_v3 --qual_milestone 1 \
    --tries 10 --problems_per_count 50
commit_artifacts composed

echo "=== experiment queue complete ==="
