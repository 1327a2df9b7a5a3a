#!/bin/bash
# Round-2 follow-up queue: lift the compositional model on dense triangles
# (where the attention baseline currently wins at 5-7 objects):
# annealed-MCMC inference on tri_v2 and a higher-capacity tri_v3.
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
  git add -f results/*/*.json results/*/metrics.jsonl results/*/model-* 2>/dev/null
  git commit -q -m "round-2b: $1" 2>/dev/null || true
}

# MCMC-refined inference on the triangle model (ULA is the reference's
# cheap sampler; composition needs annealed refinement)
for MC in ULA ULA+; do
  wd "eval_tri_v2_${MC}.log" python -u solve_ccsp.py \
      --results_dir results/tri_v2 --milestone 1 --tries 10 --mcmc "$MC" \
      --min_objects 4 --max_objects 7 \
      --json_out "results/tri_v2/denoised_t=1_mcmc=${MC}.json"
done
commit_artifacts tri_mcmc

# higher-capacity compositional triangle model
wd train_tri_v3.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --hidden_dim 512 --results_dir results/tri_v3
wd eval_tri_v3.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --candidates 10
commit_artifacts tri_v3

echo "=== round-2b queue complete ==="
