#!/bin/bash
# Round-5 queue phase 8: final bench preview after the Q2 breakdown
# probe — picks up the residue-decomposition gather/scatter (Q2 + GD
# rows) and the bf16-state headline on real hardware.
set -x
cd /root/repo
for i in $(seq 1 400); do
  grep -q QUEUE7_DONE docs/r5_queue7.log && break
  sleep 30
done
timeout 3600 python bench.py > docs/bench_r5_preview2.log 2>&1
echo "BENCH2 rc=$?"
echo QUEUE8_DONE
