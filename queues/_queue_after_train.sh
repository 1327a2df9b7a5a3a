#!/bin/bash
# wait for the qual_v2 watchdog to finish, then run the experiment queue
while pgrep -f "run_with_watchdog.sh train_qual_v2.log" > /dev/null; do
  sleep 60
done
sleep 30
bash run_experiments.sh > experiments.log 2>&1
