#!/bin/bash
# Round-5 chip queue, phase 6: the north-star cycle-5 run.
#
# Cycle 4 (8.93M DoF) CONVERGED under GMG with m=6 (docs/r5_sphere_10m_p5a.log,
# Cd=1.0878).  The checkpoint holds the cycle-4 START state, so the first
# attempt re-solves cycle 4 (~35 min) — but run_sphere_flagship.py now saves
# the CONVERGED state post-solve, so any retry skips straight to adaptation.
# Cycle 5 refines to the 2.6M-element cap -> ~10.9M DoF, the BASELINE north
# star scale.  Attempt (a) keeps m=6; (b) drops to m=4 in case the relay
# worker crash seen at m=10/9.2M recurs at the larger size; then the
# roofline re-run that died on a relay FailedPrecondition in queue5.
set -x
cd /root/repo

DEADLINE=1787191016
ROOFLINE_RESERVE=2100

wait_relay() {
  for i in $(seq 1 240); do
    [ "$(date +%s)" -ge "$1" ] && { echo DEADLINE; return 1; }
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

SPH_STOP=$(( DEADLINE - ROOFLINE_RESERVE ))

run_bounded() {  # logfile cmd...
  local log=$1; shift
  local now rem
  now=$(date +%s); rem=$(( SPH_STOP - now ))
  [ "$rem" -le 900 ] && { echo "skip (deadline): $log"; return 1; }
  timeout "$rem" "$@" > "$log" 2>&1
  local rc=$?
  echo "$log rc=${rc}"
  return $rc
}

# (a) cycle 5 at m=6 (the setting that converged cycle 4)
if wait_relay "$SPH_STOP"; then
  run_bounded docs/r5_sphere_10m_p6a.log \
    env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 \
        SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=6 \
    python scripts/run_sphere_flagship.py
  rc=$?
else
  rc=1
fi

# (b) retry at m=4 (smaller per-program work); resume skips solved cycles
if [ "$rc" -ne 0 ]; then
  for attempt in 1 2; do
    wait_relay "$SPH_STOP" || break
    run_bounded docs/r5_sphere_10m_p6b${attempt}.log \
      env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 \
          SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=4 \
      python scripts/run_sphere_flagship.py
    [ $? -eq 0 ] && break
    sleep 120
  done
fi

# roofline re-run (queue5's died on a relay FailedPrecondition)
wait_relay "$DEADLINE" && \
  timeout 2000 python scripts/bench_roofline.py \
    > docs/roofline_r5_run2.log 2>&1
echo "ROOFLINE rc=$?"

echo QUEUE6_DONE
