#!/bin/bash
# Round-4 chip queue: sequential so the single v5e is never contended.
# 1. flagship sphere scale-up (converged Kelly cycles toward 1M+ DoF)
# 2. cylinder Q2/refine-5 band-closing re-run (VERDICT r3 #3)
set -x
cd /root/repo

SPH_REFINE=2 SPH_CYCLES=4 SPH_MAXEL=2600000 SPH_FRAC=0.2 \
  SPH_PRECOND=block_jacobi SPH_SHARDS=1 \
  timeout 14000 python scripts/run_sphere_flagship.py \
  > docs/r4_sphere_scale.log 2>&1

CYL_ORDER=2 CYL_REFINE=5 CYL_T=7.0 CYL_DT=0.01 \
  timeout 18000 python scripts/run_cylinder.py \
  > docs/r4_cylinder_q2r5.log 2>&1

echo QUEUE_DONE
