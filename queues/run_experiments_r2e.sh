#!/bin/bash
# Round-2e: replaces the tail of r2d after the MCMC-table finding that
# MALA/HMC on a noise-prediction model collapse to denoiser fixed points
# (the reference forces energy_wrapper training for those samplers,
# train_utils.py:115-116) — so skip the remaining qual_v4 MALA/HMC cells,
# run the high-value evals, re-bench with the new sorted/pallas paths, and
# train a right-sized energy-parameterized model for the MALA/HMC rows.
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

# ---- TAMP suites (full oracle, tries=1 per variant) ----
wd eval_tamp_r2.log python -u solve_tamp.py --results_dir results/robot_v2 \
    --milestone 1 --scenes_per_count 5 --variants 50
commit_artifacts tamp

# ---- composed robot x qualitative inference ----
wd eval_compose_r2.log python -u solve_compose.py --robot_dir results/robot_v2 \
    --robot_milestone 1 --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50
commit_artifacts composed

# ---- triangle MCMC refinement (tuned scale) ----
wd eval_tri_v2_ULA.log python -u solve_ccsp.py \
    --results_dir results/tri_v2 --milestone 1 --tries 10 --mcmc ULA \
    --step_size_scale 0.02 --min_objects 4 --max_objects 7 \
    --json_out "results/tri_v2/denoised_t=1_mcmc=ULA_ss0.02.json"
commit_artifacts tri_mcmc

# ---- re-bench with the sorted + fixed-pallas paths ----
wd bench_r2e.log python -u bench.py
tail -1 bench_r2e.log > BENCH_r02_local.json
commit_artifacts bench_sorted_pallas

# ---- energy-parameterized qualitative model (reference energy_wrapper,
#      train_utils.py:283-284), sized to fit the round: 150k steps with a
#      milestone every 75k, then MALA/HMC/DDPM eval on it ----
wd train_qual_ebm.log python -u train_ccsp.py --input_mode qualitative \
    --train_scenes 30000 --train_num_steps 150000 --eval_every 75000 \
    --EBM MALA --samples_per_step 4 --results_dir results/qual_ebm
git add -f results/qual_ebm 2>/dev/null
git commit -q -m "round-2 training: qual_ebm (energy-parameterized, 150k)" 2>/dev/null || true
for CFG in "MALA 0.02" "HMC 0.02"; do
  set -- $CFG
  MC=$1; SC=$2
  wd "eval_qual_ebm_${MC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_ebm --milestone 2 --tries 10 --mcmc "$MC" \
      --step_size_scale "$SC" --min_objects 4 --max_objects 6 \
      --json_out "results/qual_ebm/denoised_t=1_mcmc=${MC}.json"
  commit_artifacts "qual_ebm_${MC}"
done
wd eval_qual_ebm_ddpm.log python -u solve_ccsp.py \
    --results_dir results/qual_ebm --milestone 2 --tries 10 \
    --min_objects 4 --max_objects 6
commit_artifacts qual_ebm_ddpm

echo "=== round-2e queue complete ==="
