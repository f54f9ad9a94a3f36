#!/bin/bash
# Round-3 TPU schedule, part 2 (after the sphere Kelly run): the
# full-f32 cavity re-run, the north-star Newton-step bench, the
# roofline measurement, then the sharded adaptive sphere flagship with
# whatever wall-clock remains.  Start this AFTER the part-1 sphere run
# releases the chip.
set -u
cd /root/repo
mkdir -p docs

echo "=== queue2 start $(date) ==="

echo "--- cavity Q2 128 (full f32) $(date) ---"
CAV_N=128 CAV_ORDER=2 timeout 5400 python scripts/run_cavity.py \
  > docs/cavity128q2_f32_run.log 2>&1 || echo "cavity f32 FAILED rc=$?"

echo "--- bench_newton 10.3M DoF (north star numerator) $(date) ---"
timeout 3600 python scripts/bench_newton.py \
  > docs/bench_newton_tpu.log 2>&1 || echo "bench_newton FAILED rc=$?"

echo "--- roofline $(date) ---"
timeout 2400 python scripts/bench_roofline.py \
  > docs/roofline_run.log 2>&1 || echo "roofline FAILED rc=$?"

echo "--- sphere flagship (sharded adaptive ~10M DoF) $(date) ---"
SPH_REFINE=3 SPH_CYCLES=4 SPH_MAXEL=2600000 timeout 10800 \
  python scripts/run_sphere_flagship.py \
  > docs/sphere_flagship_run.log 2>&1 || echo "flagship FAILED rc=$?"

echo "=== queue2 done $(date) ==="
