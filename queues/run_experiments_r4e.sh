#!/bin/bash
# Round-4e: final tail in strict priority order (swapped in for the r4d tail
# after the composed rows land): the robot_ebm MALA redo (its first run hit
# the closure-literal XLA crash, since fixed), DDIM rows, candidates rows,
# the k=100 CoRL-scale rows, segmented MCMC re-runs, profile, bench.
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

# ---- 1. robot_ebm tuned MALA row (redo on the fixed segmented sampler)
RS=$(python -c "import json; print(json.load(open('results/robot_ebm/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_rebm_mala2.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 10 --mcmc MALA --resume \
    --parallel_tries --launch_segments 10 \
    --step_size_scale "$RS" \
    --json_out "results/robot_ebm/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts "robot_ebm tuned MALA row"

# ---- 1b. composed full row at w=0.1 (the r4d selection averaged over
#          files with different count coverage and picked w=0.2; on the
#          common counts w=0.1 sweeps better: top-10 .62/.44 vs .57/.30)
wd eval_compose_w01_full.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 100 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 0.1 --parallel_tries --resume \
    --json_out "results/robot_v2/composed_robot_qualitative_v4_w0.1.json"
commit_artifacts "composed full row at w=0.1"

# ---- 2. DDIM k=10 rows (fixed init + x0 clip + eta=1)
for K in 100 50; do
  wd "eval_qual_ddim${K}.log" python -u solve_ccsp.py \
      --results_dir results/qual_v4 --milestone 1 --tries 10 \
      --parallel_tries --sampler ddim --ddim_steps "$K" --resume \
      --use_pallas --compute_dtype bfloat16 \
      --json_out "results/qual_v4/denoised_t=1_ddim=${K}.json"
  wd "eval_tri_ddim${K}.log" python -u solve_ccsp.py \
      --results_dir results/tri_v3 --milestone 1 --tries 10 \
      --parallel_tries --sampler ddim --ddim_steps "$K" --resume \
      --matmul_strategy sorted --compute_dtype bfloat16 \
      --json_out "results/tri_v3/denoised_t=1_ddim=${K}.json"
done
commit_artifacts "DDIM rows (fixed) qual_v4 + tri_v3"

# ---- 3. k=100 CoRL-scale DDIM-50 rows + struct fairness
bash queues/run_experiments_r4c.sh > logs/r4c_queue.log 2>&1

# ---- 4. candidates rows
wd eval_tri_cand.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --candidates 20 --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_v3/denoised_t=1_cand20.json"
commit_artifacts "tri_v3 candidates row"

wd eval_robot_cand.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --candidates 20 --resume \
    --compute_dtype bfloat16 \
    --json_out "results/robot_v2/denoised_t=1_cand20.json"
commit_artifacts "robot candidates row"

# ---- 5. segmented fused re-runs of the round-3 sequential MCMC rows
for MC in MALA HMC; do
  SS=$(python -c "import json; print(json.load(open('results/qual_ebm_v2/mcmc_tuning_${MC}.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
  wd "eval_qebm_${MC}_seg.log" python -u solve_ccsp.py \
      --results_dir results/qual_ebm_v2 --milestone 1 --tries 10 \
      --parallel_tries --launch_segments 10 --mcmc "$MC" --resume \
      --matmul_strategy sorted --compute_dtype bfloat16 \
      --step_size_scale "$SS" \
      --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=${MC}_fused_seg.json"
done
commit_artifacts "segmented fused MCMC rows (qual_ebm_v2)"

# ---- 6. chain-profile decomposition
wd profile_chain.log python -u _profile_chain.py --results_dir results/qual_v4 \
    --milestone 1 --counts 2 6 --batch 1000 \
    --json_out results/chain_profile.json
git add -f results/chain_profile.json 2>/dev/null
git commit -q -m "round-4: fused-chain profile decomposition" 2>/dev/null || true

# ---- 7. bench
wd bench_r4.log python -u bench.py
git commit -q -am "round-4: bench" 2>/dev/null || true

echo "=== round-4e complete ==="
