#!/bin/bash
# Force-add result JSONs every 5 minutes so rows landing near the round
# boundary are committed even if their queue stage never reaches its commit.
cd /root/repo
for i in $(seq 1 24); do
  sleep 300
  git add -f results/*/*.json 2>/dev/null
  git commit -q -m "round-4: autocommit late result rows" 2>/dev/null || true
done
