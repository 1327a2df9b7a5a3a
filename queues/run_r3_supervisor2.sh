#!/bin/bash
# Chains r3d after r3c completes.
set -u
cd /root/repo
while ! grep -q "round-3c complete" r3c_queue.log 2>/dev/null; do
  sleep 120
done
echo "=== $(date +%H:%M:%S) r3c done; starting r3d"
bash run_experiments_r3d.sh > r3d_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r3d complete"
