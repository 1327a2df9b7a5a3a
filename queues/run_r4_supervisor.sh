#!/bin/bash
# Waits for the robot_ebm training watchdog to exit, then runs the round-4
# queue (queues/run_experiments_r4.sh).
set -u
cd /root/repo
WD_PID="$1"
while kill -0 "$WD_PID" 2>/dev/null; do sleep 30; done
echo "=== $(date +%H:%M:%S) robot_ebm training done; starting r4 queue"
bash queues/run_experiments_r4.sh > logs/r4_queue.log 2>&1
echo "=== $(date +%H:%M:%S) r4 supervisor done"
