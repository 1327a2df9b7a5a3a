#!/bin/bash
# Round-5 stage 2 (after r5a trainings): evals in VERDICT value order.
# 1. rejection-baseline rows (item 6, cheap, unblocks every table)
# 2. dense-triangle thesis fight at k=100: tuned MALA + DDIM-50xMALA hybrid
#    on tri_ebm_v2, then the same on the fresh tri_ebm_v3 (item 1)
# 3. image-mode v2: soft-raster encoder retrain + frozen/rescaled training
#    (item 3; the diagnosis pinned binary-raster quantization + embedding
#    scale as the bottleneck)
# 4. composed robot x qualitative: annealed-weight sweep + full row (item 4)
# 5. robot dense push: hybrid k=100 + oracle-cascade candidates (items 5+7)
# 6. qual k=100 row on the split-bank v2 kernel + bench (item 2 evidence)
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

# ---- 1. rejection-baseline rows, all four families (VERDICT item 6)
for M in qualitative diffuse_pairwise stability_flat robot_box; do
  wd "rej_${M}.log" python -u solve_rejection.py --input_mode "$M" \
      --resume --json_out "results/rejection_${M}.json"
done
commit_artifacts "rejection-baseline rows (4 families)"

# ---- 2a. thesis fight: tri_ebm_v2 tuned MALA at the CoRL k=100 budget
SS2=$(python -c "import json; print(json.load(open('results/tri_ebm_v2/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_tebm2_mala_k100.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v2 --milestone 1 --tries 100 \
    --parallel_tries --launch_segments 40 --mcmc MALA --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS2" \
    --json_out "results/tri_ebm_v2/denoised_t=1_mcmc=MALA_k100.json"
commit_artifacts "tri_ebm_v2 tuned MALA k=100 (thesis row)"

# ---- 2b. thesis fight: DDIM-50 x MALA hybrid at k=100 (20x cheaper)
wd eval_tebm2_hyb_k100.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v2 --milestone 1 --tries 100 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 50 \
    --launch_segments 5 --mcmc MALA --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS2" \
    --json_out "results/tri_ebm_v2/denoised_t=1_hybrid50_k100.json"
commit_artifacts "tri_ebm_v2 DDIM-50xMALA hybrid k=100"

# ---- 2c. tri_ebm_v3 (120k scenes): protocol rows
if [ -d results/tri_ebm_v3/model-1 ]; then
SS3=$(python -c "import json; print(json.load(open('results/tri_ebm_v3/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo "$SS2")
wd eval_tebm3_ddpm.log python -u solve_ccsp.py --results_dir results/tri_ebm_v3 \
    --milestone 1 --tries 10 --parallel_tries --mcmc none --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_ebm_v3/denoised_t=1.json"
wd eval_tebm3_mala.log python -u solve_ccsp.py --results_dir results/tri_ebm_v3 \
    --milestone 1 --tries 10 --parallel_tries --launch_segments 10 \
    --mcmc MALA --step_size_scale "$SS3" --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_ebm_v3/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts "tri_ebm_v3 DDPM + tuned MALA rows"

wd eval_tebm3_mala_k100.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v3 --milestone 1 --tries 100 \
    --parallel_tries --launch_segments 40 --mcmc MALA --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS3" \
    --json_out "results/tri_ebm_v3/denoised_t=1_mcmc=MALA_k100.json"
wd eval_tebm3_hyb_k100.log python -u solve_ccsp.py \
    --results_dir results/tri_ebm_v3 --milestone 1 --tries 100 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 50 \
    --launch_segments 5 --mcmc MALA --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --step_size_scale "$SS3" \
    --json_out "results/tri_ebm_v3/denoised_t=1_hybrid50_k100.json"
commit_artifacts "tri_ebm_v3 k=100 MALA + hybrid rows (thesis)"
fi

# ---- 3. image-mode v2: soft-raster + dataset-mixed encoder, rescaled
#         frozen transplant (diagnosis: results/tri_image/diagnosis.json)
if [ ! -d encoder_checkpoints/geom_autoencoder_soft ]; then
wd train_enc_soft.log python -u train_encoders.py --steps 12000 --soft \
    --data_npz "data/diffuse_pairwise_image(30000)_train.npz" \
    --out encoder_checkpoints/geom_autoencoder_soft
fi
if [ ! -d results/tri_image_v2/model-1 ]; then
wd train_tri_image_v2.log python -u train_ccsp.py \
    --input_mode diffuse_pairwise_image --train_scenes 30000 \
    --train_num_steps 300000 --eval_every 300000 --soft_raster \
    --pretrained_encoder encoder_checkpoints/geom_autoencoder_soft \
    --results_dir results/tri_image_v2
commit_artifacts "tri_image_v2 (soft raster, rescaled frozen encoder, 300k)"
fi
wd eval_tri_image_v2.log python -u solve_ccsp.py \
    --results_dir results/tri_image_v2 \
    --milestone 1 --tries 10 --parallel_tries --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_image_v2/denoised_t=1.json"
commit_artifacts "tri_image_v2 protocol row"

# ---- 4. composed: annealed-weight sweep (50 problems, counts 3-5), then
#         the full 100-problem row at the best schedule (VERDICT item 4)
for SCHED in "0.3 0.02" "0.5 0.05" "1.0 0.1"; do
  read W0 W1 <<< "$SCHED"
  wd "eval_anneal_${W0}_${W1}.log" python -u solve_compose.py \
      --robot_dir results/robot_v2 --robot_milestone 1 \
      --qual_dir results/qual_v4 --qual_milestone 1 \
      --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 5 \
      --composing_weight 1.0 "$W0" --composing_weight_final 1.0 "$W1" \
      --parallel_tries --resume \
      --json_out "results/robot_v2/composed_anneal_${W0}to${W1}.json"
done
commit_artifacts "composed annealed-weight sweep"

BEST=$(python - << 'PYEOF'
import json, glob
best, best_f = -1.0, None
for f in glob.glob("results/robot_v2/composed_anneal_*.json"):
    try:
        d = json.load(open(f))
    except Exception:
        continue
    rows = [v for v in d.values() if isinstance(v, dict)]
    if not rows:
        continue
    score = sum(v.get("success_rate_topk", v.get("success_rate_top10", 0))
                for v in rows) / len(rows)
    if score > best:
        best, best_f = score, f
print(best_f or "")
PYEOF
)
if [ -n "$BEST" ]; then
  W0=$(basename "$BEST" .json | sed 's/composed_anneal_//; s/to.*//')
  W1=$(basename "$BEST" .json | sed 's/.*to//')
  echo "best anneal schedule: 1.0x$W0 -> 1.0x$W1"
  wd eval_anneal_full.log python -u solve_compose.py \
      --robot_dir results/robot_v2 --robot_milestone 1 \
      --qual_dir results/qual_v4 --qual_milestone 1 \
      --tries 10 --problems_per_count 100 --min_objects 3 --max_objects 6 \
      --composing_weight 1.0 "$W0" --composing_weight_final 1.0 "$W1" \
      --parallel_tries --resume \
      --json_out "results/robot_v2/composed_anneal_full.json"
  commit_artifacts "composed annealed full row"
fi

# ---- 5a. robot dense push: robot_ebm DDIM-50xMALA hybrid at k=100
SSR=$(python -c "import json; print(json.load(open('results/robot_ebm/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_rebm_hyb_k100.log python -u solve_ccsp.py \
    --results_dir results/robot_ebm --milestone 1 --tries 100 \
    --parallel_tries --sampler ddim_mcmc --ddim_steps 50 \
    --launch_segments 5 --mcmc MALA --resume \
    --compute_dtype bfloat16 --step_size_scale "$SSR" \
    --json_out "results/robot_ebm/denoised_t=1_hybrid50_k100.json"
commit_artifacts "robot_ebm hybrid k=100 row"

# ---- 5b. oracle-cascade candidates rows (VERDICT item 5 done-criterion)
wd eval_robot_cascade.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --candidates 20 --resume \
    --compute_dtype bfloat16 \
    --json_out "results/robot_v2/denoised_t=1_cand20_cascade.json"
wd eval_rebm_cascade.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 10 --candidates 20 --mcmc none --resume \
    --compute_dtype bfloat16 \
    --json_out "results/robot_ebm/denoised_t=1_cand20_cascade.json"
wd eval_stab_cascade.log python -u solve_ccsp.py --results_dir results/stab_v3 \
    --milestone 1 --tries 10 --candidates 20 --resume \
    --compute_dtype bfloat16 \
    --json_out "results/stab_v3/denoised_t=1_cand20_cascade.json"
commit_artifacts "oracle-cascade candidates rows (robot_v2, robot_ebm, stab_v3)"

# ---- 6. split-bank v2 kernel evidence: qual k=100 DDIM-50 re-run + bench
wd eval_qual_k100_v2.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 100 --parallel_tries --sampler ddim \
    --ddim_steps 50 --resume --use_pallas --compute_dtype bfloat16 \
    --json_out "results/qual_v4/denoised_t=1_ddim=50_k100_v2.json"
wd eval_qual_fast_v2.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --parallel_tries --resume \
    --use_pallas --compute_dtype bfloat16 \
    --json_out "results/qual_v4/denoised_t=1_fast_r5.json"
commit_artifacts "qual rows on split-bank v2 kernel"

wd bench_r5.log python -u bench.py
git add -f results/*/*.json 2>/dev/null
git commit -q -am "round-5: bench on split-bank v2" 2>/dev/null || true

python annotate_stalls.py
commit_artifacts "stall annotations refresh"

echo "=== round-5 stage-2 queue complete ==="
