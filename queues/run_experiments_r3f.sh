#!/bin/bash
# Round-3f (stretch): capacity/data push on dense triangles (VERDICT item 3
# fallback if the energy model alone doesn't beat the transformer baseline)
# and candidate fan-out rows for the robot family (selection-side attack on
# the weak robot top-1).
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
      results/*/model-* 2>/dev/null
  git commit -q -m "round-3: $1" 2>/dev/null || true
}

# ---- 1. high-capacity triangle model: 2x hidden width, 2x data ----
wd train_tri_v3.log python -u train_ccsp.py --input_mode diffuse_pairwise \
    --train_scenes 60000 --train_num_steps 300000 --eval_every 300000 \
    --hidden_dim 512 --results_dir results/tri_v3
commit_artifacts "tri_v3 (hidden 512, 60k scenes, 300k)"

wd eval_tri_v3.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --parallel_tries \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_v3/denoised_t=1.json"
commit_artifacts "tri_v3 protocol eval"

# ---- 2. candidate fan-out rows: K=20 fused candidates, satisfied-first
#         selection (parallel/sampling.py) on the weak families ----
wd eval_robot_cand.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --candidates 20 --compute_dtype bfloat16 \
    --json_out "results/robot_v2/denoised_t=1_cand20.json"
commit_artifacts "robot candidates row"

wd eval_tri_cand.log python -u solve_ccsp.py --results_dir results/tri_v3 \
    --milestone 1 --tries 10 --candidates 20 \
    --matmul_strategy sorted --compute_dtype bfloat16 \
    --json_out "results/tri_v3/denoised_t=1_cand20.json"
commit_artifacts "tri_v3 candidates row"

echo "=== round-3f complete ==="
