#!/bin/bash
# Round-3b: protocol evals at the bench-winning compute path (VERDICT item 1a),
# acceptance-tuned MALA/HMC on the 300k energy models (items 2+3), true DDPM
# rows, rejection baselines for all four families (item 5), new bench with the
# fan-out/roofline row (item 1b).
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
  git add -f results/*/*.json results/*/metrics.jsonl BENCH_r03_local.json 2>/dev/null
  git commit -q -m "round-3 eval: $1" 2>/dev/null || true
}

scale_of() {  # scale_of RESULTS_DIR KIND -> prints recommended scale
  python -c "import json; print(json.load(open('$1/mcmc_tuning_$2.json'))['recommended_scale'])"
}

# ---- 1. bench with the fan-out + roofline row ----
wd bench_r3.log python -u bench.py
tail -1 bench_r3.log > BENCH_r03_local.json
commit_artifacts bench_fanout

# ---- 2. headline protocol evals at the winning path, fused tries,
#         with rejection baselines for all four families ----
wd eval_qual_fast.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --parallel_tries --use_pallas \
    --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/qual_v4/denoised_t=1_fast.json"
commit_artifacts qual_fast

wd eval_tri_fast.log python -u solve_ccsp.py --results_dir results/tri_v2 \
    --milestone 1 --tries 10 --parallel_tries --use_pallas \
    --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/tri_v2/denoised_t=1_fast.json"
commit_artifacts tri_fast

wd eval_stab_fast.log python -u solve_ccsp.py --results_dir results/stab_v2 \
    --milestone 1 --tries 10 --parallel_tries --use_pallas \
    --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/stab_v2/denoised_t=1_fast.json"
commit_artifacts stab_fast

wd eval_robot_fast.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --parallel_tries \
    --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/robot_v2/denoised_t=1_fast.json"
commit_artifacts robot_fast

# ---- 3. acceptance-tuned step sizes on the 300k energy model ----
wd tune_qual_mala.log python -u tune_mcmc.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --mcmc MALA --count 5
wd tune_qual_hmc.log python -u tune_mcmc.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --mcmc HMC --count 5
commit_artifacts qual_ebm_tuning

# ---- 4. qual_ebm_v2 rows: true DDPM + tuned MALA/HMC + ULA ----
wd eval_qebm_ddpm.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --mcmc none \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/qual_ebm_v2/denoised_t=1.json"
commit_artifacts qual_ebm_ddpm

MS=$(scale_of results/qual_ebm_v2 MALA)
wd eval_qebm_mala.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --mcmc MALA \
    --step_size_scale "$MS" --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts qual_ebm_mala

HS=$(scale_of results/qual_ebm_v2 HMC)
wd eval_qebm_hmc.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --mcmc HMC \
    --step_size_scale "$HS" --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=HMC_tuned.json"
commit_artifacts qual_ebm_hmc

wd eval_qebm_ula.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --mcmc ULA \
    --step_size_scale 0.1 --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=ULA_ss0.1.json"
commit_artifacts qual_ebm_ula

# ---- 5. triangle energy model: tuner + rows (item 3: crack triangles) ----
wd tune_tri_mala.log python -u tune_mcmc.py --results_dir results/tri_ebm \
    --milestone 1 --mcmc MALA --count 5
wd tune_tri_hmc.log python -u tune_mcmc.py --results_dir results/tri_ebm \
    --milestone 1 --mcmc HMC --count 5
commit_artifacts tri_ebm_tuning

wd eval_tebm_ddpm.log python -u solve_ccsp.py --results_dir results/tri_ebm \
    --milestone 1 --tries 10 --parallel_tries --mcmc none \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_ebm/denoised_t=1.json"
commit_artifacts tri_ebm_ddpm

TS=$(scale_of results/tri_ebm MALA)
wd eval_tebm_mala.log python -u solve_ccsp.py --results_dir results/tri_ebm \
    --milestone 1 --tries 10 --parallel_tries --mcmc MALA \
    --step_size_scale "$TS"                                                   \
    --json_out "results/tri_ebm/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts tri_ebm_mala

THS=$(scale_of results/tri_ebm HMC)
wd eval_tebm_hmc.log python -u solve_ccsp.py --results_dir results/tri_ebm \
    --milestone 1 --tries 10 --parallel_tries --mcmc HMC \
    --step_size_scale "$THS"                                                   \
    --json_out "results/tri_ebm/denoised_t=1_mcmc=HMC_tuned.json"
commit_artifacts tri_ebm_hmc

echo "=== round-3b eval queue complete ==="
