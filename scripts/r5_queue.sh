#!/bin/bash
# Round-5 chip queue, in VERDICT-r4 priority order (after the O(N)
# executable fix landed, 19cb833):
#   1. cavity Q2-256^2           (r4 #3: u_min -0.3234 -> -0.327)
#   2. TGV-96^3 under GMG        (r4 #4 + the done-criterion of #1)
#   3. flagship 10M-DoF sphere   (r4 #2: north star; SPH_RESUME=1 picks
#      up the r4 checkpoint at cycle 2 / 1.2M DoF)
#   4. cylinder Q2 maxlevel-6    (r4 #3: Cd_max 3.2171 -> >=3.22; last
#      because it is the closest to done and survives truncation — the
#      force series is flushed every 50 steps)
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
    # a dead relay must fail fast, not burn the run timeout (ADVICE r4)
    wait_relay || { echo "${name} abort: relay down"; return 1; }
    timeout "$tmo" "$@" > "$log" 2>&1
    local rc=$?
    echo "${name} attempt=${attempt} rc=${rc}"
    [ "$rc" -eq 0 ] && return 0
    # nonzero: relay crash mid-run is the common cause; loop waits again
  done
  return 1
}

run_with_retry CAV256 3600 docs/cavity256q2_run.log \
  env CAV_N=256 CAV_ORDER=2 \
  python scripts/run_cavity.py

run_with_retry TGV96 15000 docs/tgv96_r5_run.log \
  env TGV_N=96 TGV_DT=0.02 TGV_T=12 TGV_PRECOND=auto \
  python scripts/run_tgv.py

run_with_retry SPHERE10M 24000 docs/r5_sphere_10m.log \
  env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 \
      SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=10 \
  python scripts/run_sphere_flagship.py

echo QUEUE_BANDS_DONE

run_with_retry CYL 15000 docs/cylinder_q2r5m6_run.log \
  env CYL_ORDER=2 CYL_REFINE=4 CYL_MAXLEVEL=6 CYL_FRAC=0.15 \
      CYL_T=7.0 CYL_DT=0.01 \
  python scripts/run_cylinder.py

echo QUEUE_DONE
