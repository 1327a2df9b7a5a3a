#!/bin/bash
# Round-3d: the r2f extras that never executed (VERDICT item 4), the composed
# inference weight sweep (item 8), the robot failure-mass analysis (item 7),
# and energy-field galleries for the 300k energy model.
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
  git add -f results/*/*.json results/*/metrics.jsonl results/*/energy_fields \
      results/*/failure_analysis.json 2>/dev/null
  git commit -q -m "round-3 eval: $1" 2>/dev/null || true
}

# ---- 1. DDIM-100 speed/quality rows (sampler acceleration table) ----
wd eval_qual_ddim.log python -u solve_ccsp.py --results_dir results/qual_v4 \
    --milestone 1 --tries 10 --parallel_tries --sampler ddim --ddim_steps 100 \
    --use_pallas --compute_dtype bfloat16 \
    --json_out "results/qual_v4/denoised_t=1_ddim100.json"
commit_artifacts qual_ddim

wd eval_tri_ddim.log python -u solve_ccsp.py --results_dir results/tri_v2 \
    --milestone 1 --tries 10 --parallel_tries --sampler ddim --ddim_steps 100 \
    --use_pallas --compute_dtype bfloat16 \
    --json_out "results/tri_v2/denoised_t=1_ddim100.json"
commit_artifacts tri_ddim

# ---- 2. stability with native dynamics confirmation; robot with RRT paths ----
wd eval_stab_dyn.log python -u solve_ccsp.py --results_dir results/stab_v2 \
    --milestone 1 --tries 10 --parallel_tries --dynamics \
    --use_pallas --compute_dtype bfloat16 \
    --json_out "results/stab_v2/denoised_t=1_dynamics.json"
commit_artifacts stab_dynamics

wd eval_robot_paths.log python -u solve_ccsp.py --results_dir results/robot_v2 \
    --milestone 1 --tries 10 --parallel_tries --plan_paths \
    --problems_per_count 50 --compute_dtype bfloat16 \
    --json_out "results/robot_v2/denoised_t=1_planpaths.json"
commit_artifacts robot_planpaths

# ---- 3. composed robot x qualitative: composing-weight sweep ----
for W in 0.2 0.5 1.0 2.0; do
  wd "eval_compose_w${W}.log" python -u solve_compose.py \
      --robot_dir results/robot_v2 --robot_milestone 1 \
      --qual_dir results/qual_v4 --qual_milestone 1 \
      --tries 10 --problems_per_count 30 --min_objects 3 --max_objects 4 \
      --composing_weight 1.0 "$W" \
      --json_out "results/robot_v2/composed_w${W}.json"
done
commit_artifacts composed_sweep

BEST_W=$(python - << 'PYEOF'
import json, glob
best, best_w = -1.0, "1.0"
for f in glob.glob("results/robot_v2/composed_w*.json"):
    w = f.split("composed_w")[1][:-5]
    d = json.load(open(f))
    score = sum(v.get("success_rate", 0) for v in d.values())
    if score > best:
        best, best_w = score, w
print(best_w)
PYEOF
)
echo "best composing weight: 1.0 $BEST_W"
wd eval_compose_best.log python -u solve_compose.py \
    --robot_dir results/robot_v2 --robot_milestone 1 \
    --qual_dir results/qual_v4 --qual_milestone 1 \
    --tries 10 --problems_per_count 50 --min_objects 3 --max_objects 6 \
    --composing_weight 1.0 "$BEST_W" \
    --json_out "results/robot_v2/composed_robot_qualitative_v3.json"
commit_artifacts composed_best

# ---- 4. robot failure-mass analysis on the new sub-check buckets ----
wd analyze_robot.log python -u analyze_failures.py \
    --results_dir results/robot_v2 --milestone 1 --problems_per_count 50 \
    --json_out results/robot_v2/failure_analysis.json
commit_artifacts robot_failure_analysis

# ---- 5. energy-field galleries for the 300k energy model ----
wd viz_energy.log python -u visualize_energy.py \
    --results_dir results/qual_ebm_v2 --milestone 1 --all_constraints --t 50
wd viz_energy2.log python -u visualize_energy.py \
    --results_dir results/qual_ebm_v2 --milestone 1 \
    --composed "left-of,close-to" --t 50
commit_artifacts energy_galleries

echo "=== round-3d complete ==="
