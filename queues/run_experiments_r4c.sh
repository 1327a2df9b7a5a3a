#!/bin/bash
# Round-4c (adaptive tail): the CoRL-scale k=100 protocol, affordable via
# the fixed DDIM sampler — 100 fused re-noise rounds at 50 strided steps
# cost ~half of one k=10 DDPM row. One row per family.
set -u
cd /root/repo

wd() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "logs/$log" 1500 4 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/*.json results/*/metrics.jsonl results/*/config.json \
      2>/dev/null
  git commit -q -m "round-4: $1" 2>/dev/null || true
}

wd eval_qual_k100.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 100 --parallel_tries --resume \
    --sampler ddim --ddim_steps 50 --use_pallas --compute_dtype bfloat16 \
    --json_out "results/qual_v4/denoised_t=1_ddim=50_k100.json"
commit_artifacts "qual_v4 k=100 DDIM-50 row"

wd eval_tri_k100.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 100 --parallel_tries --resume \
    --sampler ddim --ddim_steps 50 --matmul_strategy sorted \
    --compute_dtype bfloat16 \
    --json_out "results/tri_v3/denoised_t=1_ddim=50_k100.json"
commit_artifacts "tri_v3 k=100 DDIM-50 row"

wd eval_stab_k100.log python -u solve_ccsp.py --results_dir results/stab_v3 \
    --milestone 1 --tries 100 --parallel_tries --resume \
    --sampler ddim --ddim_steps 50 --use_pallas --compute_dtype bfloat16 \
    --json_out "results/stab_v3/denoised_t=1_ddim=50_k100.json"
commit_artifacts "stab_v3 k=100 DDIM-50 row"

wd eval_robot_k100.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 100 --parallel_tries --resume \
    --sampler ddim --ddim_steps 50 --compute_dtype bfloat16 \
    --json_out "results/robot_v2/denoised_t=1_ddim=50_k100.json"
commit_artifacts "robot_v2 k=100 DDIM-50 row"

# fairness: the non-compositional baseline gets the same k=100 budget
wd eval_struct_k100.log python -u solve_ccsp.py --results_dir results/struct_tri \
    --milestone 1 --tries 100 --parallel_tries --resume \
    --sampler ddim --ddim_steps 50 --compute_dtype bfloat16 \
    --json_out "results/struct_tri/denoised_t=1_ddim=50_k100.json"
commit_artifacts "struct_tri k=100 DDIM-50 row"

echo "=== round-4c complete ==="
