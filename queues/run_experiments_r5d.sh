#!/bin/bash
# Round-5 stage 4 (final stretch, after r5c): one more data-scaling push on
# the thesis front. 60k -> 120k scenes doubled dense-count DDPM satisfaction
# and the count-ceiling diagnostic shows the difficulty is joint-mode
# coverage (learnable), not geometric tightness — so double the data again:
# tri_ebm_v4 = hidden 512, 240k scenes, energy, 300k steps. Time-guarded.
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
  git add -f results/*/*.json results/*.json results/*/metrics.jsonl \
      results/*/config.json 2>/dev/null
  git commit -q -m "round-5: $1" 2>/dev/null || true
}

# roofline profile note (VERDICT item 2 evidence) — cheap, runs first
wd profile_v2.log python -u _profile_v2_kernel.py
git add -f results/v2_kernel_profile.json 2>/dev/null
git commit -q -m "round-5: v2 kernel roofline profile decomposition" 2>/dev/null || true

# cfree-weight retry with the FIXED energy semantics (the first sweep
# scaled the raw output on an energy model, shifting the energy minimum —
# both rows zeroed; weights now scale the per-edge energy contribution)
SS3=$(python -c "import json; print(json.load(open('results/tri_ebm_v3/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 100)
wd eval_tebm3_twfix.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v3 --milestone 1 --tries 100 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 100 --mcmc_steps 8 \
    --launch_segments 10 --mcmc MALA --resume --no_warmup \
    --min_objects 6 --max_objects 7 \
    --type_weights 1.0 1.3 \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS3" \
    --json_out "results/tri_ebm_v3/denoised_t=1_hybrid100s8_k100_twfix.json"
commit_artifacts "tri_ebm_v3 cfree-energy-weight retry (fixed semantics)"

if [ "$(date +%H%M)" -ge 2245 ]; then
  echo "too late for the v4 training; skipping stage 4"
  exit 0
fi

if [ ! -d results/tri_ebm_v4/model-1 ]; then
wd train_tri_ebm_v4.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 240000 --train_num_steps 300000 --eval_every 300000 \
    --hidden_dim 512 --EBM MALA --samples_per_step 4 \
    --results_dir results/tri_ebm_v4
commit_artifacts "tri_ebm_v4 (hidden 512, 240k scenes, energy, 300k)"
fi

if [ ! -f results/tri_ebm_v4/mcmc_tuning_MALA.json ]; then
wd tune_tri4_mala.log python -u tune_mcmc.py --results_dir results/tri_ebm_v4 \
    --milestone 1 --mcmc MALA --count 5
commit_artifacts "tri_ebm_v4 MALA tuning"
fi

SS4=$(python -c "import json; print(json.load(open('results/tri_ebm_v4/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 100)

# hybrid k=100 full counts (cheap, the headline protocol)
wd eval_tebm4_hyb_k100.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v4 --milestone 1 --tries 100 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 50 \
    --launch_segments 5 --mcmc MALA --resume --no_warmup \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS4" \
    --json_out "results/tri_ebm_v4/denoised_t=1_hybrid50_k100.json"
commit_artifacts "tri_ebm_v4 hybrid k=100 row"

# full tuned MALA k=100 at the dense counts
wd eval_tebm4_mala_k100.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v4 --milestone 1 --tries 100 \
    --parallel_tries --launch_segments 40 --mcmc MALA --resume --no_warmup \
    --min_objects 5 --max_objects 7 \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS4" \
    --json_out "results/tri_ebm_v4/denoised_t=1_mcmc=MALA_k100.json"
commit_artifacts "tri_ebm_v4 tuned MALA k=100 dense counts"

python annotate_stalls.py
commit_artifacts "stall annotations refresh (r5d)"

echo "=== round-5 stage-4 queue complete ==="
