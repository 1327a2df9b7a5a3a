#!/bin/bash
# Round-2 training queue: retrain all four families to the 300k reference
# recipe (VERDICT item 2) on the corrected data distributions (dense
# triangles matching the reference Delaunay-frame construction; robot scenes
# with fitted yaw + stacking; SAT wall-check fix), plus the StructDiffusion
# baseline (VERDICT item 8). Evals run separately once the round-2 eval
# protocol upgrades (full oracles, --candidates, --mcmc) land.
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
  git add -f results/*/config.json results/*/metrics.jsonl \
      results/*/model-* data/*.npz 2>/dev/null
  git commit -q -m "round-2 training queue: $1" 2>/dev/null || true
}

# stale data from the pre-fix samplers
rm -f 'data/diffuse_pairwise(30000)_train.npz' 'data/robot_box(10000)_train.npz'
rm -f 'data/diffuse_pairwise(200)_train.npz' 'data/robot_box(200)_train.npz'

wd train_tri_v2.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/tri_v2
commit_artifacts tri_v2

wd train_qual_v4.log python -u train_ccsp.py --input_mode qualitative \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/qual_v4
commit_artifacts qual_v4

wd train_stab_v2.log python -u train_ccsp.py --input_mode stability_flat \
    --train_scenes 12000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/stab_v2
commit_artifacts stab_v2

wd train_robot_v2.log python -u train_ccsp.py --input_mode robot_box \
    --train_scenes 10000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/robot_v2
commit_artifacts robot_v2

wd train_struct_qual.log python -u train_ccsp.py --input_mode qualitative \
    --model StructDiffusion --train_scenes 30000 --train_num_steps 300000 \
    --eval_every 300000 --results_dir results/struct_qual
commit_artifacts struct_qual

wd train_struct_tri.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --model StructDiffusion --train_scenes 30000 --train_num_steps 300000 \
    --eval_every 300000 --results_dir results/struct_tri
commit_artifacts struct_tri

echo "=== round-2 training queue complete ==="
