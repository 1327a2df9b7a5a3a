#!/bin/bash
# Round-4d: all post-training evals in final priority order (replaces the
# r4b tail once the last training lands; every stage is resume-safe).
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

# ---- 1. tri_v3 protocol row (+rejection)
wd eval_tri_v3.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --parallel_tries --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/tri_v3/denoised_t=1.json"
commit_artifacts "tri_v3 protocol eval"

# ---- 2. qual fast row on the phantom-skip kernel (VERDICT item 5)
wd eval_qual_fast_r4.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --parallel_tries --use_pallas --resume \
    --compute_dtype bfloat16 \
    --json_out "results/qual_v4/denoised_t=1_fast_r4.json"
commit_artifacts "qual_v4 fast row (phantom-skip kernel)"

# ---- 3. tri_image protocol row
wd eval_tri_image.log python -u solve_ccsp.py --results_dir results/tri_image \
    --milestone 1 --tries 10 --parallel_tries --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_image/denoised_t=1.json"
commit_artifacts "tri_image protocol eval"

# ---- 4. stab_v3 protocol row
wd eval_stab_v3.log python -u solve_ccsp.py --results_dir results/stab_v3 \
    --milestone 1 --tries 10 --parallel_tries --use_pallas --resume \
    --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/stab_v3/denoised_t=1_fast.json"
commit_artifacts "stab_v3 protocol eval"

# ---- 5. robot_ebm tails
wd tune_robot_mala.log python -u tune_mcmc.py --results_dir results/robot_ebm \
    --milestone 1 --mcmc MALA --count 4
commit_artifacts "robot_ebm MALA tuning"

wd eval_rebm_ddpm.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 10 --parallel_tries --mcmc none --resume \
    --compute_dtype bfloat16 \
    --json_out "results/robot_ebm/denoised_t=1.json"
commit_artifacts "robot_ebm DDPM row"

RS=$(python -c "import json; print(json.load(open('results/robot_ebm/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_rebm_mala.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 10 --mcmc MALA --resume \
    --parallel_tries --launch_segments 10 \
    --step_size_scale "$RS" \
    --json_out "results/robot_ebm/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts "robot_ebm tuned MALA row"

# ---- 6. tri_ebm_v2 tuned MALA row (beat-the-transformer attempt)
wd tune_tri2_mala.log python -u tune_mcmc.py --results_dir results/tri_ebm_v2 \
    --milestone 1 --mcmc MALA --count 5
commit_artifacts "tri_ebm_v2 MALA tuning"

TS2=$(python -c "import json; print(json.load(open('results/tri_ebm_v2/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_tri_ebm_v2.log python -u solve_ccsp.py --results_dir results/tri_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --launch_segments 10 \
    --mcmc MALA --step_size_scale "$TS2" --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_ebm_v2/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts "tri_ebm_v2 tuned MALA row"

# ---- 7. fused-MCMC fault bisect (VERDICT item 4 evidence)
wd repro_mcmc.log python -u repro_mcmc_fault.py \
    --results_dir results/qual_ebm_v2 --milestone 1 --mcmc MALA \
    --batches 100 250 500 1000 --segments 10 \
    --json_out results/mcmc_fault_repro.json
git add -f results/mcmc_fault_repro.json 2>/dev/null
git commit -q -m "round-4: fused-MCMC fault bisect" 2>/dev/null || true

# ---- 8. composed robot x qualitative sweep + full row (VERDICT item 3)
for W in 0.1 0.3; do
  wd "eval_compose_w${W}.log" python -u solve_compose.py \
      --robot_dir results/robot_v2 --robot_milestone 1 \
      --qual_dir results/qual_v4 --qual_milestone 1 \
      --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 5 \
      --composing_weight 1.0 "$W" --parallel_tries --resume \
      --json_out "results/robot_v2/composed_sweep_w${W}.json"
done
commit_artifacts "composed-weight sweep w=0.1/0.3"

BEST_W=$(python - << 'PYEOF'
import json, glob
cand = {}
for f in glob.glob("results/robot_v2/composed_sweep_w*.json"):
    cand[f.split("_w")[-1][:-5]] = f
cand.setdefault("0.2", "results/robot_v2/composed_w0.2.json")
best, best_w = -1.0, "0.2"
for w, f in cand.items():
    try:
        d = json.load(open(f))
    except Exception:
        continue
    rows = [v for v in d.values() if isinstance(v, dict)]
    if not rows:
        continue
    score = sum(v.get("success_rate_topk", 0) for v in rows) / len(rows)
    if score > best:
        best, best_w = score, w
print(best_w)
PYEOF
)
echo "best composing weight: 1.0 $BEST_W"
wd eval_compose_best.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 100 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 "$BEST_W" --parallel_tries --resume \
    --json_out "results/robot_v2/composed_robot_qualitative_v4.json"
commit_artifacts "composed robot x qualitative full row (best weight)"

# ---- 9. DDIM k=10 rows (fixed init + x0 clip + eta=1)
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

# ---- 10. candidates rows
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

# ---- 11. segmented fused re-runs of the round-3 sequential MCMC rows
for MC in MALA HMC; do
  SS=$(python -c "import json; print(json.load(open('results/qual_ebm_v2/mcmc_tuning_${MC}.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
  wd "eval_qebm_${MC}_seg.log" python -u solve_ccsp.py \
      --results_dir results/qual_ebm_v2 --milestone 1 --tries 10 \
      --parallel_tries --launch_segments 10 --mcmc "$MC" --resume \
      --matmul_strategy sorted --compute_dtype bfloat16 \
      --step_size_scale "$SS" \
      --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=${MC}_fused_seg.json"
done
SS=$(python -c "import json; print(json.load(open('results/tri_ebm/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_tebm_mala_seg.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm --milestone 1 --tries 10 \
    --parallel_tries --launch_segments 10 --mcmc MALA --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS" \
    --json_out "results/tri_ebm/denoised_t=1_mcmc=MALA_fused_seg.json"
commit_artifacts "segmented fused MCMC rows (qual_ebm_v2, tri_ebm)"

# ---- 12. chain-profile decomposition (VERDICT item 5 evidence)
wd profile_chain.log python -u _profile_chain.py --results_dir results/qual_v4 \
    --milestone 1 --counts 2 6 --batch 1000 \
    --json_out results/chain_profile.json
git add -f results/chain_profile.json 2>/dev/null
git commit -q -m "round-4: fused-chain profile decomposition" 2>/dev/null || true

# ---- 13. k=100 DDIM-50 protocol rows (CoRL-scale budget) + struct fairness
bash queues/run_experiments_r4c.sh >> logs/r4c_queue.log 2>&1

# ---- 14. bench
wd bench_r4.log python -u bench.py
git commit -q -am "round-4: bench" 2>/dev/null || true

echo "=== round-4 queue complete ==="
