#!/bin/bash
# Sequential tuned-MALA row for qual_ebm_v2 (the 1000-chain fused MALA
# program faults the device on this mode; batch-100 sequential ran fine in
# round 2 and in the tuner).
set -u
cd /root/repo
echo "=== $(date +%H:%M:%S) RUN r3g2 sequential MALA"
MS=$(python -c "import json; print(json.load(open('results/qual_ebm_v2/mcmc_tuning_MALA.json'))['recommended_scale'])")
bash run_with_watchdog.sh eval_qebm_mala3.log 1500 3 python -u solve_ccsp.py \
    --results_dir results/qual_ebm_v2 --milestone 1 --tries 10 --mcmc MALA \
    --step_size_scale "$MS" \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=MALA_tuned.json"
git add -f results/qual_ebm_v2/*.json 2>/dev/null
git commit -q -m "round-3 eval: qual_ebm_mala_v2 (sequential)" 2>/dev/null || true
echo "=== round-3g2 complete ==="
