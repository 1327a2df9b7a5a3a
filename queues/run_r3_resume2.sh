#!/bin/bash
# Second resume: r3a done (qual_ebm_v2 + tri_ebm trained/committed); the
# chunked-kernel fix unblocked the --use_pallas fast evals. Run r3b..r3f.
set -u
cd /root/repo
probe() {
  timeout 120 python -c "import jax, jax.numpy as jnp; jnp.ones((2,2)).sum().block_until_ready()" >/dev/null 2>&1
}
until probe; do sleep 45; done
echo "=== $(date +%H:%M:%S) TPU alive; starting r3b"
bash run_experiments_r3b.sh > r3b_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3c"
bash run_experiments_r3c.sh > r3c_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3d"
bash run_experiments_r3d.sh > r3d_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3e"
bash run_experiments_r3e.sh > r3e_queue.log 2>&1
echo "=== $(date +%H:%M:%S) round-3 resume2 pipeline complete"
