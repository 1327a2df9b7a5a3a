#!/bin/bash
# Round-3a: energy-parameterized models to the full 300k recipe (VERDICT
# items 2+3). qual_ebm_v2 replaces the half-trained round-2 qual_ebm; tri_ebm
# is the triangle energy model the round-2 "MCMC is the compositional answer"
# assertion was never tested with.
set -u
cd /root/repo

wd() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "$log" 600 4 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/config.json results/*/metrics.jsonl results/*/model-* 2>/dev/null
  git commit -q -m "round-3 training: $1" 2>/dev/null || true
}

wd train_qual_ebm_v2.log python -u train_ccsp.py --input_mode qualitative \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --EBM MALA --samples_per_step 4 --results_dir results/qual_ebm_v2
commit_artifacts "qual_ebm_v2 (energy-parameterized, 300k)"

wd train_tri_ebm.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 30000 --train_num_steps 300000 --eval_every 300000 \
    --EBM MALA --samples_per_step 4 --results_dir results/tri_ebm
commit_artifacts "tri_ebm (triangle energy model, 300k)"

echo "=== round-3a training complete ==="
