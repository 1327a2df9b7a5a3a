#!/bin/bash
# Wait for the r5a stage (PID $1) to finish, then run the r5b eval queue.
if [ -n "${1:-}" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi
bash /root/repo/queues/run_experiments_r5b.sh
