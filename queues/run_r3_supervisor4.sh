#!/bin/bash
set -u
cd /root/repo
while ! grep -q "round-3e complete" r3e_queue.log 2>/dev/null; do
  sleep 120
done
echo "=== $(date +%H:%M:%S) r3e done; starting r3f"
bash run_experiments_r3f.sh > r3f_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r3f complete"
