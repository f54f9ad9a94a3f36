#!/bin/bash
# Round-4 chip queue, phase 6: the VM hosting queue4/queue5 rebooted
# (fresh boot 2026-08-19 02:24), killing the detached queue before any
# band run completed.  This phase re-runs the full plan with per-run
# relay-wait + one retry, in VERDICT-r3 priority order:
#   1. cylinder Q2/refine-4 adaptive  (r3 #3: Cd_max 3.22-3.24, St 0.295-0.305)
#   2. TGV-96^3 under GMG             (r3 #5 done-criterion)
#   3. cavity Q2-192^2                (config #1: min-u -> -0.327)
#   4. flagship config-#5 10M-DoF ladder (r3 #2), refine-3 base,
#      5 Kelly cycles, 2.6M-element budget, krylov-m 10 for watchdog headroom
# Sequential so the single v5e is never contended.  Launch DETACHED
# (setsid nohup) so it survives builder-session restarts.
set -x
cd /root/repo

wait_relay() {
  for i in $(seq 1 480); do
    if timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
print(float(jnp.ones(8).sum()))" >/dev/null 2>&1; then
      echo "RELAY_UP after ${i} probes"
      return 0
    fi
    sleep 60
  done
  echo "RELAY_TIMEOUT"
  return 1
}

run_with_retry() {  # name timeout_s logfile cmd...
  local name=$1 tmo=$2 log=$3; shift 3
  for attempt in 1 2; do
    wait_relay || { echo "${name} abort: relay down"; return 1; }
    timeout "$tmo" "$@" > "$log" 2>&1
    local rc=$?
    echo "${name} attempt=${attempt} rc=${rc}"
    [ "$rc" -eq 0 ] && return 0
    # nonzero: relay crash mid-run is the common cause; loop waits again
  done
  return 1
}

run_with_retry CYL 16000 docs/cylinder_q2r4_run.log \
  env CYL_ORDER=2 CYL_REFINE=4 CYL_T=7.0 CYL_DT=0.01 \
  python scripts/run_cylinder.py

run_with_retry TGV96 14000 docs/tgv96_gmg_run.log \
  env TGV_N=96 TGV_DT=0.02 TGV_T=12 TGV_PRECOND=auto \
  python scripts/run_tgv.py

run_with_retry CAV 9000 docs/cavity192q2_run.log \
  env CAV_N=192 CAV_ORDER=2 \
  python scripts/run_cavity.py

echo QUEUE6_BANDS_DONE

run_with_retry SPHERE10M 30000 docs/r4_sphere_10m.log \
  env SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 SPH_SHARDS=1 \
      SPH_MAXNEWTON=14 SPH_KRYLOV_M=10 \
  python scripts/run_sphere_flagship.py

echo QUEUE6_DONE
