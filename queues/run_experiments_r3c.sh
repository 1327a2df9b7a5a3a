#!/bin/bash
# Round-3c: image-mode pipeline end-to-end (VERDICT item 6) + stability
# retrain at the reference's 24k dataset size (item 9 tail).
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
  git add -f results/*/*.json results/*/metrics.jsonl results/*/config.json \
      results/*/model-* encoder_checkpoints data/*.npz 2>/dev/null
  git commit -q -m "round-3: $1" 2>/dev/null || true
}

# ---- 1. pretrain the CNN geometry autoencoder (reference
#          train_encoders.py:25-88) ----
wd train_enc.log python -u train_encoders.py --steps 3000 \
    --out encoder_checkpoints/geom_autoencoder
commit_artifacts "geometry autoencoder pretraining"

# ---- 2. image-mode diffusion with the frozen pretrained encoder ----
wd train_tri_image.log python -u train_ccsp.py \
    --input_mode diffuse_pairwise_image --train_scenes 30000 \
    --train_num_steps 300000 --eval_every 300000 \
    --pretrained_encoder encoder_checkpoints/geom_autoencoder \
    --results_dir results/tri_image
commit_artifacts "tri_image (image-mode, frozen encoder, 300k)"

# ---- 3. image-mode triangle protocol eval ----
wd eval_tri_image.log python -u solve_ccsp.py --results_dir results/tri_image \
    --milestone 1 --tries 10 --parallel_tries \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_image/denoised_t=1.json"
commit_artifacts "tri_image protocol eval"

# ---- 4. stability retrained on the reference-size 24k dataset ----
wd train_stab_v3.log python -u train_ccsp.py --input_mode stability_flat \
    --train_scenes 24000 --train_num_steps 300000 --eval_every 300000 \
    --results_dir results/stab_v3
commit_artifacts "stab_v3 (24k scenes, 300k)"

wd eval_stab_v3.log python -u solve_ccsp.py --results_dir results/stab_v3 \
    --milestone 1 --tries 10 --parallel_tries --use_pallas \
    --compute_dtype bfloat16 --rejection_baseline \
    --json_out "results/stab_v3/denoised_t=1_fast.json"
commit_artifacts "stab_v3 protocol eval"

echo "=== round-3c complete ==="
