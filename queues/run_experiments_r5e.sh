#!/bin/bash
# Round-5 stage 5 (post-reset catch-up). The environment reset between
# sessions wiped every git-ignored artifact (logs/, data/, .jax_cache/ and
# all UNTRACKED model checkpoints: tri_v3, stab_v3, robot_ebm, tri_ebm_v2/
# v3, tri_image*). Stage-4's tri_ebm_v4 push and the robot_ebm/stab_v3
# stage-3 leftovers are therefore unrunnable this session. What IS runnable
# with surviving (tracked) checkpoints, in value order:
#   1. v2-kernel roofline profile note (VERDICT item 2 evidence — never
#      committed; needs no checkpoint)
#   2. composed per-domain renormalization sweep + full row (VERDICT item 4
#      last untried knob; robot_v2 + qual_v4 checkpoints are tracked)
#   3. qual_ebm_v2 DDIM-50xMALA hybrid row (Weak #7: MALA-quality at ~DDIM
#      cost — the hybrid was built this round but never run on qualitative)
set -u
cd /root/repo

wd() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "logs/$log" 900 3 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/*.json results/*.json results/*/metrics.jsonl \
      results/*/config.json 2>/dev/null
  git commit -q -m "round-5: $1" 2>/dev/null || true
}

# ---- 1. roofline profile note (VERDICT item 2 evidence)
wd profile_v2.log python -u _profile_v2_kernel.py
git add -f results/v2_kernel_profile.json 2>/dev/null
git commit -q -m "round-5: v2 kernel roofline profile decomposition" 2>/dev/null || true

# ---- 2. composed per-domain renormalization (VERDICT item 4 last knob)
wd eval_dnorm_w1.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 1.0 --domain_norm --parallel_tries --resume \
    --json_out "results/robot_v2/composed_dnorm_w1.json"
commit_artifacts "composed domain_norm w=1 sweep row"
wd eval_dnorm_w03.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 0.3 --domain_norm --parallel_tries --resume \
    --json_out "results/robot_v2/composed_dnorm_w03.json"
commit_artifacts "composed domain_norm w=0.3 sweep row"
wd eval_dnorm_anneal.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 0.5 --composing_weight_final 1.0 0.05 \
    --domain_norm --parallel_tries --resume \
    --json_out "results/robot_v2/composed_dnorm_anneal.json"
commit_artifacts "composed domain_norm annealed sweep row"

BESTDN=$(python - << 'PYEOF'
import json, glob
best, best_f = -1.0, None
for f in glob.glob("results/robot_v2/composed_dnorm_*.json"):
    if f.endswith("_full.json"):
        continue
    try:
        d = json.load(open(f))
    except Exception:
        continue
    rows = [(k, v) for k, v in d.items() if isinstance(v, dict) and k in ("5", "6")]
    if not rows:
        continue
    score = sum(v.get("success_rate_topk", 0) for _, v in rows) / len(rows)
    if score > best:
        best, best_f = score, f
print(best_f or "")
PYEOF
)
if [ -n "$BESTDN" ]; then
  echo "best domain_norm config: $BESTDN (full row at 100 problems)"
  case "$BESTDN" in
    *w1*)     DNARGS="--composing_weight 1.0 1.0 --domain_norm" ;;
    *w03*)    DNARGS="--composing_weight 1.0 0.3 --domain_norm" ;;
    *anneal*) DNARGS="--composing_weight 1.0 0.5 --composing_weight_final 1.0 0.05 --domain_norm" ;;
  esac
  wd eval_dnorm_full.log python -u solve_compose.py \
      --robot_dir results/robot_v2 --robot_milestone 1 \
      --qual_dir results/qual_v4 --qual_milestone 1 \
      --tries 10 --problems_per_count 100 --min_objects 3 --max_objects 6 \
      $DNARGS --parallel_tries --resume \
      --json_out "results/robot_v2/composed_dnorm_full.json"
  commit_artifacts "composed domain_norm full row"
fi

# ---- 3. qual_ebm_v2 hybrid: tuned-MALA refinement on the DDIM-50 grid at
#         the standard protocol (100 problems, tries 10) — the Weak #7 test:
#         does the hybrid hold the fused-MALA quality at ~1/20 the cost?
SSQ=$(python -c "import json; print(json.load(open('results/qual_ebm_v2/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 100)
wd eval_qebm_hybrid.log python -u solve_ccsp.py \
    --results_dir results/qual_ebm_v2 --milestone 1 --tries 10 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 50 --mcmc MALA \
    --resume --no_warmup --compute_dtype bfloat16 \
    --step_size_scale "$SSQ" \
    --json_out "results/qual_ebm_v2/denoised_t=1_hybrid50_MALA.json"
commit_artifacts "qual_ebm_v2 DDIM-50xMALA hybrid row (Weak 7)"

python annotate_stalls.py
commit_artifacts "stall annotations refresh (r5e)"

echo "=== round-5 stage-5 queue complete ==="
