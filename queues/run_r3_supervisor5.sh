#!/bin/bash
set -u
cd /root/repo
while ! grep -q "round-3f complete" r3f_queue.log 2>/dev/null; do
  sleep 120
done
echo "=== $(date +%H:%M:%S) r3f done; starting r3g"
bash run_experiments_r3g.sh > r3g_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r3g complete"
