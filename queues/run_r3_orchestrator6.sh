#!/bin/bash
# Value-ordered tail of round 3: after r3b, run the corrected qual MCMC rows
# (r3g) and the cheap r3d extras before the expensive r3c trainings; r3e
# last (supervisor4 chains r3f after it).
set -u
cd /root/repo
while ! grep -q "round-3b eval queue complete" r3b_queue.log 2>/dev/null; do
  sleep 60
done
echo "=== $(date +%H:%M:%S) r3b done; starting r3g"
bash run_experiments_r3g.sh > r3g_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3d"
bash run_experiments_r3d.sh > r3d_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3c"
bash run_experiments_r3c.sh > r3c_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3e"
bash run_experiments_r3e.sh > r3e_queue.log 2>&1
echo "=== $(date +%H:%M:%S) orchestrator6 done"
