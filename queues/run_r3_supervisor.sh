#!/bin/bash
# Chains the round-3 queues: wait for r3a (EBM trainings), then r3b (evals),
# then r3c (image + stab24k). Keeps the single TPU chip serialized.
set -u
cd /root/repo

while ! grep -q "round-3a training complete" r3a_queue.log 2>/dev/null; do
  sleep 60
done
echo "=== $(date +%H:%M:%S) r3a done; starting r3b"
bash run_experiments_r3b.sh > r3b_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r3b done; starting r3c"
bash run_experiments_r3c.sh > r3c_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r3 queues complete"
