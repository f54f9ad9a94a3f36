#!/bin/bash
# Round-4 chip queue: sequential so the single v5e is never contended.
# Launch DETACHED (setsid nohup) so it survives builder-session restarts.
# 1. flagship sphere scale-up (converged Kelly cycles toward 1M+ DoF)
# 2. cylinder band-closing runs follow as separate jobs once the
#    cylinder GMG stagnation is diagnosed (docs/r4_cyl_q2r4_probe.log).
set -x
cd /root/repo

for try in 1 2 3; do
  SPH_REFINE=2 SPH_CYCLES=4 SPH_MAXEL=2600000 SPH_FRAC=0.2 \
    SPH_PRECOND=block_jacobi SPH_SHARDS=1 SPH_RESUME=1 \
    timeout 14000 python scripts/run_sphere_flagship.py \
    >> docs/r4_sphere_scale.log 2>&1
  rc=$?
  echo "SPHERE_TRY $try rc=$rc"
  [ $rc -eq 0 ] && break
  sleep 60
done

echo SPHERE_DONE rc=$rc
