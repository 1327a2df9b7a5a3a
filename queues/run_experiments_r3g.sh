#!/bin/bash
# Round-3g (addendum): redo the saturated qual_ebm_v2 MALA/HMC tunings with
# the extended-grid tuner, and produce the tuned Metropolis rows on the
# ragged-f32 compute path — the sorted+bf16 Metropolis program consistently
# faults the TPU device ("kernel fault"); the ragged path ran these chains
# fine in round 2.
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
  git add -f results/*/*.json 2>/dev/null
  git commit -q -m "round-3 eval: $1" 2>/dev/null || true
}

scale_of() {
  python -c "import json; print(json.load(open('$1/mcmc_tuning_$2.json'))['recommended_scale'])"
}

wd tune_qual_mala2.log python -u tune_mcmc.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --mcmc MALA --count 5
wd tune_qual_hmc2.log python -u tune_mcmc.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --mcmc HMC --count 5
commit_artifacts qual_ebm_tuning_v2

MS=$(scale_of results/qual_ebm_v2 MALA)
wd eval_qebm_mala2.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10 --parallel_tries --mcmc MALA \
    --step_size_scale "$MS" \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=MALA_tuned.json"
commit_artifacts qual_ebm_mala_v2

HS=$(scale_of results/qual_ebm_v2 HMC)
wd eval_qebm_hmc2.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10 --mcmc HMC \
    --step_size_scale "$HS" \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=HMC_tuned.json"
commit_artifacts qual_ebm_hmc_v2


wd eval_qebm_ula2.log python -u solve_ccsp.py --results_dir results/qual_ebm_v2 \
    --milestone 1 --tries 10                  --mcmc ULA \
    --step_size_scale 0.1 \
    --json_out "results/qual_ebm_v2/denoised_t=1_mcmc=ULA_ss0.1.json"
commit_artifacts qual_ebm_ula_v2


THS=$(scale_of results/tri_ebm HMC)
wd eval_tebm_hmc2.log python -u solve_ccsp.py --results_dir results/tri_ebm \
    --milestone 1 --tries 10 --mcmc HMC \
    --step_size_scale "$THS" \
    --json_out "results/tri_ebm/denoised_t=1_mcmc=HMC_tuned.json"
commit_artifacts tri_ebm_hmc_v2

echo "=== round-3g complete ==="
