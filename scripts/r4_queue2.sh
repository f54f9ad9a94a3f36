#!/bin/bash
# Round-4 chip queue, phase 2: cylinder Q2/refine-5 band-closing run
# (VERDICT r3 #3).  Waits for the sphere scale-up to release the chip,
# then probes 15 steps (validates GMG+probation+pallas-coarse on the
# multiblock mesh and measures sec/step) before the full 700-step run.
set -x
cd /root/repo

# wait for queue phase 1 (sphere scale-up + its retry loop) to exit so
# a mid-retry sleep can't look like a free chip
while ps aux | grep -q '[r]4_queue\.sh'; do
  sleep 60
done

CYL_ORDER=2 CYL_REFINE=5 CYL_T=0.15 CYL_DT=0.01 \
  timeout 3000 python scripts/run_cylinder.py \
  > docs/r4_cyl_q2r5_probe.log 2>&1
echo "PROBE rc=$?"

CYL_ORDER=2 CYL_REFINE=5 CYL_T=7.0 CYL_DT=0.01 \
  timeout 25000 python scripts/run_cylinder.py \
  > docs/r4_cylinder_q2r5.log 2>&1
echo "CYL_DONE rc=$?"
