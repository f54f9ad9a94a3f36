#!/bin/bash
# Round-4 chip queue, phase 3 (post Q2-GMG fix + chunked-pstate):
# 1. cylinder Q2/refine-4 adaptive band run (VERDICT r3 #3) — the
#    13:08 launch of the same config died with the builder session.
# 2. TGV-96^3 under GMG (VERDICT r3 #5 done-criterion: the coarse
#    levels now run the Pallas kernel, no 42x SoA tile-pad).
# 3. cavity Q2-192^2 band run (config #1: min-u -> -0.327).
# Sequential so the single v5e is never contended.  Launch DETACHED
# (setsid nohup) so it survives builder-session restarts.
set -x
cd /root/repo

CYL_ORDER=2 CYL_REFINE=4 CYL_T=7.0 CYL_DT=0.01 \
  timeout 18000 python scripts/run_cylinder.py \
  > docs/cylinder_q2r4_run.log 2>&1
echo "CYL rc=$?"

TGV_N=96 TGV_DT=0.02 TGV_T=12 TGV_PRECOND=auto \
  timeout 14000 python scripts/run_tgv.py \
  > docs/tgv96_gmg_run.log 2>&1
echo "TGV96 rc=$?"

CAV_N=192 CAV_ORDER=2 \
  timeout 10000 python scripts/run_cavity.py \
  > docs/cavity192q2_run.log 2>&1
echo "CAV rc=$?"

echo QUEUE3_DONE
