#!/bin/bash
# Round-4f: final stages — the chain-profile decomposition, the EBM row on
# the Pallas kernel (custom VJP end-to-end on device), and bench.
set -u
cd /root/repo

wd() {
  local log="$1"; shift
  echo "=== $(date +%H:%M:%S) RUN: $*"
  bash run_with_watchdog.sh "logs/$log" 1500 3 "$@"
  echo "=== $(date +%H:%M:%S) DONE (rc=$?): $*"
}

commit_artifacts() {
  cd /root/repo
  git add -f results/*/*.json results/*/metrics.jsonl results/*/config.json \
      2>/dev/null
  git commit -q -m "round-4: $1" 2>/dev/null || true
}

# ---- 1. chain-profile decomposition (VERDICT item 5 evidence)
wd profile_chain.log python -u _profile_chain.py --results_dir results/qual_v4 \
    --milestone 1 --counts 2 6 --batch 1000 \
    --json_out results/chain_profile.json
git add -f results/chain_profile.json 2>/dev/null
git commit -q -m "round-4: fused-chain profile decomposition" 2>/dev/null || true

# ---- 2. EBM sampling ON the Pallas kernel (custom VJP on device):
#         tuned-MALA qual row with --use_pallas (VERDICT item 6 done-criterion)
SS=$(python -c "import json; print(json.load(open('results/qual_ebm_v2/mcmc_tuning_MALA.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_qebm_pallas.log python -u solve_ccsp.py \
    --results_dir results/qual_ebm_v2 --milestone 1 --tries 10 \
    --parallel_tries --launch_segments 10 --mcmc MALA --resume \
    --use_pallas --compute_dtype bfloat16 \
    --step_size_scale "$SS" \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=MALA_pallas.json"
commit_artifacts "qual_ebm_v2 MALA row on the Pallas kernel (custom VJP)"

# ---- 3. bench
wd bench_r4.log python -u bench.py
git commit -q -am "round-4: bench" 2>/dev/null || true

echo "=== round-4f complete ==="
