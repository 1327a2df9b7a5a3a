#!/bin/bash
# Revised round-2 finish queue (replaces the tail of run_experiments_r2_eval):
# - MCMC table with *tuned* step scales (the saved 2*betas scale is ~250x the
#   reference's MALA-tuned step, ddpm.py:307-309, and demonstrably degrades
#   ULA) on the 4-6-object counts where refinement matters
# - composed inference, TAMP, bench
# - triangle MCMC + hidden-512 tri_v3 (the r2b follow-ups)
# - image-mode + EBM-trained runs last (cut off by round end if needed)
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

# MCMC sampler table on qual_v4, tuned scales, 4-6 objects
for CFG in "ULA 0.02" "ULA 0.1" "ULA+ 0.02" "MALA 0.02" "MALA 0.1" "HMC 0.02"; do
  set -- $CFG
  MC=$1; SC=$2
  wd "eval_qual_v4_${MC}_ss${SC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_v4 --milestone 1 --tries 10 --mcmc "$MC" \
      --step_size_scale "$SC" --min_objects 4 --max_objects 6 \
      --json_out "results/qual_v4/denoised_t=1_mcmc=${MC}_ss${SC}.json"
done
commit_artifacts mcmc_table_tuned

# composed robot x qualitative inference (full robot oracle)
wd eval_compose_r2.log python -u solve_compose.py --robot_dir results/robot_v2 \
    --robot_milestone 1 --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50
commit_artifacts composed

# TAMP suites
wd eval_tamp_r2.log python -u solve_tamp.py --results_dir results/robot_v2 \
    --milestone 1 --scenes_per_count 5 --variants 50
commit_artifacts tamp

# headline bench on the idle chip
wd bench_r2.log python -u bench.py
tail -1 bench_r2.log > BENCH_r02_local.json
commit_artifacts bench

# triangle MCMC refinement (tuned scale) + capacity study
wd eval_tri_v2_ULA.log python -u solve_ccsp.py \
    --results_dir results/tri_v2 --milestone 1 --tries 10 --mcmc ULA \
    --step_size_scale 0.02 --min_objects 4 --max_objects 7 \
    --json_out "results/tri_v2/denoised_t=1_mcmc=ULA_ss0.02.json"
commit_artifacts tri_mcmc

wd train_tri_v3.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --hidden_dim 512 --results_dir results/tri_v3
wd eval_tri_v3.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --candidates 10
commit_artifacts tri_v3

# image-geometry mode end-to-end
wd train_enc.log python -u train_encoders.py --steps 3000 \
    --out results/geom_encoder
wd train_tri_img.log python -u train_ccsp.py --input_mode diffuse_pairwise_image \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/tri_img_v1
wd eval_tri_img.log python -u solve_ccsp.py --results_dir results/tri_img_v1 \
    --milestone 1 --tries 10
commit_artifacts tri_img

# EBM-trained qualitative model, MALA/HMC inference
wd train_qual_ebm.log python -u train_ccsp.py --input_mode qualitative \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --EBM MALA --samples_per_step 4 --results_dir results/qual_ebm
for CFG in "MALA 0.02" "HMC 0.02"; do
  set -- $CFG
  MC=$1; SC=$2
  wd "eval_qual_ebm_${MC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_ebm --milestone 1 --tries 10 --mcmc "$MC" \
      --step_size_scale "$SC" --min_objects 4 --max_objects 6 \
      --json_out "results/qual_ebm/denoised_t=1_mcmc=${MC}.json"
done
commit_artifacts qual_ebm

echo "=== round-2c queue complete ==="
