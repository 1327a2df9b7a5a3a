#!/bin/bash
# Round-2f extras (after r2e): DDIM speed/quality table, stability with the
# native dynamics cross-check, robot eval under the full RRT path-planning
# oracle — cheap evals that deepen the results tables.
set -u
cd /root/repo

wd() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "$log" 600 3 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/*.json results/*/metrics.jsonl BENCH_r02_local.json 2>/dev/null
  git commit -q -m "round-2 eval: $1" 2>/dev/null || true
}

# DDIM 100-step sampling: 10x fewer denoiser steps; quality/speed tradeoff
wd eval_qual_ddim.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --sampler ddim --ddim_steps 100 \
    --json_out "results/qual_v4/denoised_t=1_ddim100.json"
commit_artifacts qual_ddim

wd eval_tri_ddim.log python -u solve_ccsp.py --results_dir results/tri_v2 \
    --milestone 1 --tries 10 --sampler ddim --ddim_steps 100 \
    --json_out "results/tri_v2/denoised_t=1_ddim100.json"
commit_artifacts tri_ddim

# stability with the native 3-D dynamics confirmation on top of LP+contact
wd eval_stab_dyn.log python -u solve_ccsp.py --results_dir results/stab_v2 \
    --milestone 1 --tries 10 --dynamics \
    --json_out "results/stab_v2/denoised_t=1_dynamics.json"
commit_artifacts stab_dynamics

# robot under the full RRT path-planning oracle (plan failures typed)
wd eval_robot_paths.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --plan_paths --problems_per_count 50 \
    --json_out "results/robot_v2/denoised_t=1_planpaths.json"
commit_artifacts robot_planpaths

echo "=== round-2f extras complete ==="
