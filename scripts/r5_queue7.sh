#!/bin/bash
# Round-5 queue phase 7: Q2 lattice-matvec stage breakdown, after the
# cycle-5 sphere + roofline (queue6) release the chip.
set -x
cd /root/repo
for i in $(seq 1 400); do
  grep -q QUEUE6_DONE docs/r5_queue6.log && break
  sleep 30
done
timeout 1200 python scripts/probe_q2_breakdown.py > docs/q2_breakdown_r5.log 2>&1
echo "PROBE rc=$?"
echo QUEUE7_DONE
