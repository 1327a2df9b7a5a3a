#!/bin/bash
# Round-2d recovery + finish queue. The container recycle wiped the
# uncommitted eval artifacts (the 300k model checkpoints survived in git),
# so: regenerate the core protocol evals FIRST (headline results), then the
# r2c items (bench, tuned MCMC table, TAMP, composed, EBM / tri_v3 / image
# trainings) in decreasing priority so a wall-clock cutoff costs the least.
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

# ---- core protocol evals (full oracles), rejection + candidate fan-out ----
wd eval_tri_v2.log python -u solve_ccsp.py --results_dir results/tri_v2 \
    --milestone 1 --tries 10 --rejection_baseline --candidates 10
commit_artifacts tri_v2

wd eval_qual_v4.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --rejection_baseline --candidates 10
commit_artifacts qual_v4

wd eval_stab_v2.log python -u solve_ccsp.py --results_dir results/stab_v2 \
    --milestone 1 --tries 10
commit_artifacts stab_v2

wd eval_robot_v2.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --candidates 10
commit_artifacts robot_v2

# ---- StructDiffusion baselines ----
wd eval_struct_qual.log python -u solve_ccsp.py --results_dir results/struct_qual \
    --milestone 1 --tries 10
wd eval_struct_tri.log python -u solve_ccsp.py --results_dir results/struct_tri \
    --milestone 1 --tries 10
commit_artifacts struct_baselines

# ---- headline bench ----
wd bench_r2.log python -u bench.py
tail -1 bench_r2.log > BENCH_r02_local.json
commit_artifacts bench

# ---- MCMC sampler table on qual_v4, tuned step scales, 4-6 objects ----
for CFG in "ULA 0.02" "ULA 0.1" "ULA+ 0.02" "MALA 0.02" "MALA 0.1" "HMC 0.02"; do
  set -- $CFG
  MC=$1; SC=$2
  wd "eval_qual_v4_${MC}_ss${SC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_v4 --milestone 1 --tries 10 --mcmc "$MC" \
      --step_size_scale "$SC" --min_objects 4 --max_objects 6 \
      --json_out "results/qual_v4/denoised_t=1_mcmc=${MC}_ss${SC}.json"
  commit_artifacts "mcmc_${MC}_ss${SC}"
done

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

# ---- EBM-trained qualitative model + MALA/HMC inference ----
wd train_qual_ebm.log python -u train_ccsp.py --input_mode qualitative \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --EBM MALA --samples_per_step 4 --results_dir results/qual_ebm
git add -f results/qual_ebm 2>/dev/null; git commit -q -m "round-2 training: qual_ebm (energy-parameterized, 300k)" 2>/dev/null || true
for CFG in "MALA 0.02" "HMC 0.02"; do
  set -- $CFG
  MC=$1; SC=$2
  wd "eval_qual_ebm_${MC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_ebm --milestone 1 --tries 10 --mcmc "$MC" \
      --step_size_scale "$SC" --min_objects 4 --max_objects 6 \
      --json_out "results/qual_ebm/denoised_t=1_mcmc=${MC}.json"
done
wd eval_qual_ebm_ddpm.log python -u solve_ccsp.py \
    --results_dir results/qual_ebm --milestone 1 --tries 10
commit_artifacts qual_ebm

# ---- hidden-512 triangle capacity study ----
wd train_tri_v3.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --hidden_dim 512 --results_dir results/tri_v3
git add -f results/tri_v3 2>/dev/null; git commit -q -m "round-2 training: tri_v3 (hidden 512, 300k)" 2>/dev/null || true
wd eval_tri_v3.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --candidates 10
commit_artifacts tri_v3

# ---- image-geometry mode end-to-end ----
wd train_enc.log python -u train_encoders.py --steps 3000 \
    --out results/geom_encoder
wd train_tri_img.log python -u train_ccsp.py --input_mode diffuse_pairwise_image \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/tri_img_v1
git add -f results/tri_img_v1 results/geom_encoder 2>/dev/null; git commit -q -m "round-2 training: tri_img_v1 (image-geometry mode, 300k)" 2>/dev/null || true
wd eval_tri_img.log python -u solve_ccsp.py --results_dir results/tri_img_v1 \
    --milestone 1 --tries 10
commit_artifacts tri_img

echo "=== round-2d queue complete ==="
