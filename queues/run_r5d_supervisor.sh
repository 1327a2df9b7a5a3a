#!/bin/bash
# Wait for the r5c supervisor (PID $1), then run the r5d final-stretch queue.
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
bash /root/repo/queues/run_experiments_r5d.sh
