#!/bin/bash
set -u
cd /root/repo
wd() { local log="$1"; shift; echo "=== $(date +%H:%M:%S) RUN: $*"; bash run_with_watchdog.sh "logs/$log" 1200 2 "$@"; echo "=== $(date +%H:%M:%S) DONE (rc=$?)"; }
commit_artifacts() { git add -f results/*/*.json 2>/dev/null; git commit -q -m "round-4: $1" 2>/dev/null || true; }

wd eval_tri2_ddpm.log python -u solve_ccsp.py --results_dir results/tri_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --mcmc none --resume \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_ebm_v2/denoised_t=1.json"
commit_artifacts "tri_ebm_v2 DDPM ablation row"

SS=$(python -c "import json; print(json.load(open('results/qual_ebm_v2/mcmc_tuning_HMC.json'))['recommended_scale'])" 2>/dev/null || echo 0.1)
wd eval_qebm_HMC_seg2.log python -u solve_ccsp.py \
    --results_dir results/qual_ebm_v2 --milestone 1 --tries 10 \
    --parallel_tries --launch_segments 10 --mcmc HMC --resume \
    --use_pallas --compute_dtype bfloat16 --step_size_scale "$SS" \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=HMC_fused_seg.json"
commit_artifacts "qual_ebm_v2 HMC fused segmented row (pallas)"
echo "=== r4g complete ==="
