#!/bin/bash
set -u
cd /root/repo
wd() { local log="$1"; shift; echo "=== $(date +%H:%M:%S) RUN: $*"; bash run_with_watchdog.sh "logs/$log" 1200 2 "$@"; echo "=== $(date +%H:%M:%S) DONE (rc=$?)"; }
commit_artifacts() { git add -f results/*/*.json 2>/dev/null; git commit -q -m "round-4: $1" 2>/dev/null || true; }

wd eval_rebm_k100.log python -u solve_ccsp.py --results_dir results/robot_ebm \
    --milestone 1 --tries 100 --parallel_tries --resume --mcmc none \
    --sampler ddim --ddim_steps 50 --compute_dtype bfloat16 \
    --json_out "results/robot_ebm/denoised_t=1_ddim=50_k100.json"
commit_artifacts "robot_ebm k=100 DDIM-50 row"

wd eval_qual_cand.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --candidates 20 --resume \
    --use_pallas --compute_dtype bfloat16 \
    --json_out "results/qual_v4/denoised_t=1_cand20.json"
commit_artifacts "qual_v4 candidates row"

wd eval_stab_cand.log python -u solve_ccsp.py --results_dir results/stab_v3 \
    --milestone 1 --tries 10 --candidates 20 --resume \
    --use_pallas --compute_dtype bfloat16 \
    --json_out "results/stab_v3/denoised_t=1_cand20.json"
commit_artifacts "stab_v3 candidates row"
echo "=== r4h complete ==="
