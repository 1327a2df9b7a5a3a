#!/bin/bash
# Round-3e: energy-parameterized robot model + tuned MCMC — pointing the
# round's EBM machinery at the weakest family (robot top-1 0.24 @ 4 obj in
# round 2), plus a fast-path re-eval for comparison.
set -u
cd /root/repo

wd() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "$log" 1500 4 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/*.json results/*/metrics.jsonl results/*/config.json \
      results/*/model-* 2>/dev/null
  git commit -q -m "round-3: $1" 2>/dev/null || true
}

wd train_robot_ebm.log python -u train_ccsp.py --input_mode robot_box \
    --train_scenes 10000 --train_num_steps 300000 --eval_every 300000 \
    --EBM MALA --samples_per_step 4 --results_dir results/robot_ebm
commit_artifacts "robot_ebm (energy-parameterized, 300k)"

wd tune_robot_mala.log python -u tune_mcmc.py --results_dir results/robot_ebm \
    --milestone 1 --mcmc MALA --count 4
commit_artifacts robot_ebm_tuning

wd eval_rebm_ddpm.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 10 --parallel_tries --mcmc none \
    --compute_dtype bfloat16 \
    --json_out "results/robot_ebm/denoised_t=1.json"
commit_artifacts robot_ebm_ddpm

RS=$(python -c "import json; print(json.load(open('results/robot_ebm/mcmc_tuning_MALA.json'))['recommended_scale'])")
wd eval_rebm_mala.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 10 --parallel_tries --mcmc MALA \
    --step_size_scale "$RS" \
    --json_out "results/robot_ebm/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts robot_ebm_mala

echo "=== round-3e complete ==="
