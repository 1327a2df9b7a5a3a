#!/bin/bash
set -u
cd /root/repo
while ! grep -q "round-3d complete" r3d_queue.log 2>/dev/null; do
  sleep 120
done
echo "=== $(date +%H:%M:%S) r3d done; starting r3e"
bash run_experiments_r3e.sh > r3e_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r3e complete"
