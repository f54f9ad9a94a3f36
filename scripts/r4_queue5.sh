#!/bin/bash
# Round-4 chip queue, phase 5: flagship config-#5 re-run toward the
# 10M-DoF BASELINE target with this round's solver fixes in place:
#   - GMG preconditioner (r4 Q2-GMG fix; 21 vs 140 FGMRES iters on the
#     refine-1 system — the r4 ladder ran block_jacobi and never
#     retried GMG), runtime stagnation fallback still armed
#   - f32 noise-floor stall guard + best-iterate (cuts the wasted
#     ~half of every cycle's Newton iterations)
#   - NumPy Kelly + memoized tabulation + strike-persistent eviction
#     (cuts the per-cycle relay compile bill)
# Waits for queue4 (cylinder/TGV/cavity band runs) to finish first so
# the single v5e is never contended; queue4 itself waits for the relay
# to come back.  Launch DETACHED (setsid nohup).
set -x
cd /root/repo

for i in $(seq 1 1440); do
  grep -q QUEUE4_DONE docs/r4_queue4.log 2>/dev/null && break
  sleep 60
done
echo "QUEUE4 finished (or 24h elapsed)"

SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 SPH_SHARDS=1 \
  SPH_MAXNEWTON=14 SPH_KRYLOV_M=10 \
  timeout 28000 python scripts/run_sphere_flagship.py \
  > docs/r4_sphere_10m.log 2>&1
echo "SPHERE10M rc=$?"

echo QUEUE5_DONE
