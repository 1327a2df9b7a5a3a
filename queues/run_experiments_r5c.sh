#!/bin/bash
# Round-5 stage 3 (after r5b): the full tuned-MALA k=100 thesis rows,
# restricted to the dense counts where the fight is decided (the full-count
# versions cost ~20 min/count; counts 2-4 are saturated at k=100 and the
# hybrid rows cover them), the literal VERDICT item-7 robot row, MALA-pool
# cascade, the unfrozen image ablation, and a stability k=100 row.
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

# ---- 1. tri_ebm_v3 full tuned MALA at k=100, dense counts (thesis row)
SS3=$(python -c "import json; print(json.load(open('results/tri_ebm_v3/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_tebm3_mala_k100c.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v3 --milestone 1 --tries 100 \
    --parallel_tries --launch_segments 40 --mcmc MALA --resume --no_warmup \
    --min_objects 5 --max_objects 7 \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS3" \
    --json_out "results/tri_ebm_v3/denoised_t=1_mcmc=MALA_k100.json"
commit_artifacts "tri_ebm_v3 tuned MALA k=100 dense counts (thesis)"

# ---- 1b. mid-budget hybrid: DDIM-100 x 8 MALA steps at the hardest counts
wd eval_tebm3_hyb100s8.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v3 --milestone 1 --tries 100 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 100 --mcmc_steps 8 \
    --launch_segments 10 --mcmc MALA --resume --no_warmup \
    --min_objects 6 --max_objects 7 \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS3" \
    --json_out "results/tri_ebm_v3/denoised_t=1_hybrid100s8_k100.json"
commit_artifacts "tri_ebm_v3 DDIM-100x8 hybrid k=100 dense counts"

# ---- 1c. cfree up-weighting sweep (count-7 failures are ~90% cfree;
#         per-type output weights are the untried knob). Triangle vocab is
#         ['in','cfree'].
for TW in 1.3 1.6; do
  wd "eval_tebm3_tw${TW}.log" python -u solve_ccsp.py \
      --results_dir results/tri_ebm_v3 --milestone 1 --tries 100 \
      --parallel_tries --sampler ddim_mcmc --ddim_steps 50 \
      --launch_segments 5 --mcmc MALA --resume --no_warmup \
      --min_objects 6 --max_objects 7 \
      --type_weights 1.0 "$TW" \
      --matmul_strategy sorted --compute_dtype bfloat16 \
      --step_size_scale "$SS3" \
      --json_out "results/tri_ebm_v3/denoised_t=1_hybrid50_k100_tw${TW}.json"
done
commit_artifacts "tri_ebm_v3 cfree-weight sweep at dense counts"

# ---- 2. tri_ebm_v2 full tuned MALA k=100, dense counts (VERDICT item 1
#         literal: 'tuned MALA on tri_ebm_v2 at tries=100')
SS2=$(python -c "import json; print(json.load(open('results/tri_ebm_v2/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_tebm2_mala_k100c.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v2 --milestone 1 --tries 100 \
    --parallel_tries --launch_segments 40 --mcmc MALA --resume --no_warmup \
    --min_objects 5 --max_objects 7 \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS2" \
    --json_out "results/tri_ebm_v2/denoised_t=1_mcmc=MALA_k100.json"
commit_artifacts "tri_ebm_v2 tuned MALA k=100 dense counts"

# ---- 2b. composed per-domain renormalization (VERDICT item 4's last
#          untried knob): alone and stacked on the annealed schedule; sweep
#          on 50 problems, full row at the winner
wd eval_dnorm_w1.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 1.0 --domain_norm --parallel_tries --resume \
    --json_out "results/robot_v2/composed_dnorm_w1.json"
wd eval_dnorm_w03.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 0.3 --domain_norm --parallel_tries --resume \
    --json_out "results/robot_v2/composed_dnorm_w03.json"
wd eval_dnorm_anneal.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 0.5 --composing_weight_final 1.0 0.05 \
    --domain_norm --parallel_tries --resume \
    --json_out "results/robot_v2/composed_dnorm_anneal.json"
commit_artifacts "composed domain_norm sweep"

BESTDN=$(python - << 'PYEOF'
import json, glob
best, best_f = -1.0, None
for f in glob.glob("results/robot_v2/composed_dnorm_*.json"):
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

# ---- 3. robot_ebm full tuned MALA at k=100, dense counts (VERDICT item 7)
SSR=$(python -c "import json; print(json.load(open('results/robot_ebm/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_rebm_mala_k100.log python -u solve_ccsp.py \
    --results_dir results/robot_ebm --milestone 1 --tries 100 \
    --parallel_tries --launch_segments 40 --mcmc MALA --resume --no_warmup \
    --min_objects 5 --max_objects 6 \
    --compute_dtype bfloat16 --step_size_scale "$SSR" \
    --json_out "results/robot_ebm/denoised_t=1_mcmc=MALA_k100.json"
commit_artifacts "robot_ebm tuned MALA k=100 dense counts"

# ---- 4. oracle-cascade candidates drawn from the tuned-MALA pool
wd eval_rebm_mala_cascade.log python -u solve_ccsp.py \
    --results_dir results/robot_ebm --milestone 1 --tries 10 \
    --candidates 10 --mcmc MALA --step_size_scale "$SSR" --resume \
    --compute_dtype bfloat16 \
    --json_out "results/robot_ebm/denoised_t=1_mala_cand10_cascade.json"
commit_artifacts "robot_ebm MALA-pool cascade candidates"

# ---- 5. image-mode unfrozen ablation: only if frozen v2 still lags the
#         numeric model by >2x at count 4 (VERDICT item 3 done-criterion)
NEED_V3=$(python - << 'PYEOF'
import json
try:
    v2 = json.load(open("results/tri_image_v2/denoised_t=1.json"))
    tri = json.load(open("results/tri_v3/denoised_t=1.json"))
    a = v2["4"]["success_rate_top10"]
    b = tri["4"]["success_rate_top10"]
    print("yes" if a * 2.0 < b else "no")
except Exception:
    print("no")
PYEOF
)
if [ "$NEED_V3" = "yes" ] && [ ! -d results/tri_image_v3/model-1 ] \
   && [ "$(date +%H%M)" -lt 2200 ]; then
wd train_tri_image_v3.log python -u train_ccsp.py \
    --input_mode diffuse_pairwise_image --train_scenes 30000 \
    --train_num_steps 300000 --eval_every 300000 --soft_raster \
    --pretrained_encoder encoder_checkpoints/geom_autoencoder_soft \
    --finetune_encoder \
    --results_dir results/tri_image_v3
commit_artifacts "tri_image_v3 (soft raster, UNFROZEN finetuned encoder)"
wd eval_tri_image_v3.log python -u solve_ccsp.py \
    --results_dir results/tri_image_v3 \
    --milestone 1 --tries 10 --parallel_tries --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_image_v3/denoised_t=1.json"
commit_artifacts "tri_image_v3 protocol row"
fi

# ---- 6. stability k=100 on the v2 kernel (same budget as other families)
wd eval_stab_k100.log python -u solve_ccsp.py --results_dir results/stab_v3 \
    --milestone 1 --tries 100 --parallel_tries --sampler ddim \
    --ddim_steps 50 --resume --use_pallas --compute_dtype bfloat16 \
    --json_out "results/stab_v3/denoised_t=1_ddim=50_k100_v2.json"
commit_artifacts "stab_v3 k=100 DDIM row on v2 kernel"

python annotate_stalls.py
commit_artifacts "stall annotations refresh (r5c)"

echo "=== round-5 stage-3 queue complete ==="
