#!/bin/bash
set -u
cd /root/repo
while ! grep -q "round-4 queue complete" logs/r4b_queue.log 2>/dev/null; do sleep 60; done
echo "=== $(date +%H:%M:%S) r4b done; starting r4c"
bash queues/run_experiments_r4c.sh > logs/r4c_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r4c supervisor done"
