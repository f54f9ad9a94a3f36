#!/bin/bash
# Round-3 physics validation queue: runs the band-closing cases
# sequentially on the single TPU chip.  Each run logs to docs/ and
# tolerates failure of the previous one.  All runs use the
# host-chunked Newton driver (SOFTX_NEWTON_CHUNK=1, set inside the
# scripts) to stay under the relay's ~60 s program watchdog
# (scripts/probe_tpu_fault.py).
set -u
cd /root/repo
mkdir -p docs

echo "=== queue start $(date) ==="

echo "--- cavity Q2 128 $(date) ---"
CAV_N=128 CAV_ORDER=2 timeout 7200 python scripts/run_cavity.py \
  > docs/cavity128q2_run.log 2>&1 || echo "cavity Q2 FAILED rc=$?"

echo "--- sphere Re=100 Kelly $(date) ---"
SPH_REFINE=2 SPH_CYCLES=3 SPH_MAXEL=400000 timeout 14400 \
  python scripts/run_sphere.py \
  > docs/sphere_run.log 2>&1 || echo "sphere FAILED rc=$?"

echo "--- cylinder Q2 refine-5 $(date) ---"
CYL_ORDER=2 CYL_REFINE=5 CYL_DT=0.005 CYL_T=7 timeout 28800 \
  python scripts/run_cylinder.py \
  > docs/cylinder_q2r5_run.log 2>&1 || echo "cylinder Q2 FAILED rc=$?"

echo "--- TGV 96^3 $(date) ---"
TGV_N=96 TGV_DT=0.025 TGV_T=12 timeout 21600 python scripts/run_tgv.py \
  > docs/tgv96_run.log 2>&1 || echo "tgv96 FAILED rc=$?"

echo "=== queue done $(date) ==="
