#!/bin/bash
# Round-5 stage 1: the capacity push for the dense-triangle thesis fight
# (VERDICT r4 item 1): tri_ebm_v3 = hidden 512, 120k scenes (2x tri_ebm_v2's
# data), energy-parameterized, 300k steps. Dataset is generated inline on
# first use (~1 min at ~2500 scenes/s). Later stages (evals, MALA tuning,
# k=100 rows) are queued separately once the round-5 sampler code lands.
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
  git commit -q -m "round-5: $1" 2>/dev/null || true
}

# ---- 1. tri_ebm_v3: capacity x data x energy (VERDICT item 1)
if [ ! -d results/tri_ebm_v3/model-1 ]; then
wd train_tri_ebm_v3.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 120000 --train_num_steps 300000 --eval_every 300000 \
    --hidden_dim 512 --EBM MALA --samples_per_step 4 \
    --results_dir results/tri_ebm_v3
commit_artifacts "tri_ebm_v3 (hidden 512, 120k scenes, energy, 300k)"
fi

# ---- 2. MALA tuning for it (cheap, needed by every later MCMC row)
if [ ! -f results/tri_ebm_v3/mcmc_tuning_MALA.json ]; then
wd tune_tri3_mala.log python -u tune_mcmc.py --results_dir results/tri_ebm_v3 \
    --milestone 1 --mcmc MALA --count 5
commit_artifacts "tri_ebm_v3 MALA tuning"
fi

echo "=== round-5 stage-1 queue complete ==="
