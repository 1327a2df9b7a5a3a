#!/bin/bash
set -u
cd /root/repo
while ! grep -q "round-3g complete" r3g_queue.log 2>/dev/null; do sleep 60; done
echo "=== $(date +%H:%M:%S) r3g done; r3g2"
bash run_experiments_r3g2.sh > r3g2_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3d"
bash run_experiments_r3d.sh > r3d_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3c"
bash run_experiments_r3c.sh > r3c_queue.log 2>&1
echo "=== $(date +%H:%M:%S) starting r3e"
bash run_experiments_r3e.sh > r3e_queue.log 2>&1
echo "=== $(date +%H:%M:%S) orchestrator7 done"
