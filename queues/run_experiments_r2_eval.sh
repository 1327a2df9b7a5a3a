#!/bin/bash
# Round-2 evaluation queue (runs after run_experiments_r2.sh):
# full-protocol evals with host oracles, rejection baselines, candidate
# fan-out, EBM/MCMC sampler table, composed inference, TAMP suites, bench.
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

# --- triangles: protocol eval + rejection baseline + candidate fan-out
wd eval_tri_v2.log python -u solve_ccsp.py --results_dir results/tri_v2 \
    --milestone 1 --tries 10 --rejection_baseline --candidates 10
commit_artifacts tri_v2

# --- qualitative: protocol eval + rejection + candidates
wd eval_qual_v4.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --rejection_baseline --candidates 10
commit_artifacts qual_v4

# --- stability: full oracle (LP + contact), failure modes
wd eval_stab_v2.log python -u solve_ccsp.py --results_dir results/stab_v2 \
    --milestone 1 --tries 10
commit_artifacts stab_v2

# --- robot: full oracle (IK pick-and-place + settle) + candidates
wd eval_robot_v2.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --candidates 10
commit_artifacts robot_v2

# --- StructDiffusion baselines
wd eval_struct_qual.log python -u solve_ccsp.py --results_dir results/struct_qual \
    --milestone 1 --tries 10
wd eval_struct_tri.log python -u solve_ccsp.py --results_dir results/struct_tri \
    --milestone 1 --tries 10
commit_artifacts struct_baselines

# --- EBM/MCMC inference table on the qualitative model (reference
#     ddpm.py:277-320; MALA acceptance anchor ddpm.py:307-309)
for MC in ULA ULA+ MALA HMC; do
  wd "eval_qual_v4_${MC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_v4 --milestone 1 --tries 10 --mcmc "$MC" \
      --json_out "results/qual_v4/denoised_t=1_mcmc=${MC}.json"
done
# MALA step-size sensitivity (reference tunes by acceptance)
for SC in 1.0 4.0; do
  wd "eval_qual_v4_MALA_${SC}.log" python -u solve_ccsp.py \
      --results_dir results/qual_v4 --milestone 1 --tries 10 --mcmc MALA \
      --step_size_scale "$SC" \
      --json_out "results/qual_v4/denoised_t=1_mcmc=MALA_ss${SC}.json"
done
commit_artifacts mcmc_table

# --- composed robot x qualitative inference
wd eval_compose_r2.log python -u solve_compose.py --robot_dir results/robot_v2 \
    --robot_milestone 1 --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50
commit_artifacts composed

# --- TAMP suites (placement-order variants, tries=1)
wd eval_tamp_r2.log python -u solve_tamp.py --results_dir results/robot_v2 \
    --milestone 1 --scenes_per_count 5 --variants 50
commit_artifacts tamp

# --- bench on the idle chip
wd bench_r2.log python -u bench.py
cp bench_r2.log BENCH_r02_local.json 2>/dev/null || true
tail -1 bench_r2.log > BENCH_r02_local.json
commit_artifacts bench

# --- image-geometry mode (C4 end-to-end): CNN pretrain + diffusion train + eval
wd train_enc.log python -u train_encoders.py --steps 3000     --out results/geom_encoder
wd train_tri_img.log python -u train_ccsp.py --input_mode diffuse_pairwise_image     --train_scenes 30000 --train_num_steps 300000 --eval_every 300000     --results_dir results/tri_img_v1
wd eval_tri_img.log python -u solve_ccsp.py --results_dir results/tri_img_v1     --milestone 1 --tries 10
commit_artifacts tri_img

# --- EBM-trained qualitative model (reference energy_wrapper training,
#     train_utils.py:283-284) evaluated with MALA/HMC
wd train_qual_ebm.log python -u train_ccsp.py --input_mode qualitative     --train_scenes 30000 --train_num_steps 300000 --eval_every 300000     --EBM MALA --samples_per_step 4 --results_dir results/qual_ebm
for MC in MALA HMC; do
  wd "eval_qual_ebm_${MC}.log" python -u solve_ccsp.py       --results_dir results/qual_ebm --milestone 1 --tries 10 --mcmc "$MC"       --json_out "results/qual_ebm/denoised_t=1_mcmc=${MC}.json"
done
commit_artifacts qual_ebm

echo "=== round-2 eval queue complete ==="
