#!/bin/bash
# Resume the round-3 queue after the machine restart: the r3a qual_ebm_v2
# training committed, tri_ebm and everything after never ran. Waits for the
# TPU tunnel to answer a compute probe, then runs the remaining queues in
# VERDICT-priority order.
set -u
cd /root/repo

probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; jnp.ones((2,2)).sum().block_until_ready()" >/dev/null 2>&1
}

echo "=== $(date +%H:%M:%S) waiting for TPU to answer a compute probe"
until probe; do sleep 45; done
echo "=== $(date +%H:%M:%S) TPU alive; starting r3a remainder (tri_ebm)"

bash run_with_watchdog.sh train_tri_ebm.log 600 4 python -u train_ccsp.py \
    --input_mode diffuse_pairwise --train_scenes 30000 \
    --train_num_steps 300000 --eval_every 300000 \
    --EBM MALA --samples_per_step 4 --results_dir results/tri_ebm
git add -f results/tri_ebm/config.json results/tri_ebm/metrics.jsonl \
    results/tri_ebm/model-* 2>/dev/null
git commit -q -m "round-3 training: tri_ebm (triangle energy model, 300k)" || true

echo "=== $(date +%H:%M:%S) starting r3b"
bash run_experiments_r3b.sh > r3b_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3c"
bash run_experiments_r3c.sh > r3c_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3d"
bash run_experiments_r3d.sh > r3d_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3e"
bash run_experiments_r3e.sh > r3e_queue.log 2>&1
echo "=== $(date +%H:%M:%S) round-3 resume pipeline complete"
