#!/bin/bash
# Round-5 chip queue, phase 3.  Queue2 state when this was written:
# TGV-96^3 DONE IN BAND (docs/tgv96_r5_run.log); cavity-256 DONE;
# SPHERE10M completed cycles 2-3 + adapt 3 (2.12M cells checkpointed)
# then lost BOTH attempts to TPU-worker crashes (relay instability —
# docs/r5_sphere_10m.log); the cylinder ml-6 band run is queued next.
# This phase waits for queue2 to exit, then resumes the sphere ladder
# at cycle 4 (~9M DoF) with 3 attempts, each bounded by an absolute
# deadline so the chip is free before the round-end driver bench.
set -x
cd /root/repo

DEADLINE=$(( $(date +%s) + 36000 ))   # hard stop ~10h from launch

wait_relay() {
  for i in $(seq 1 240); do
    [ "$(date +%s)" -ge "$DEADLINE" ] && { echo DEADLINE; return 1; }
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

run_with_retry() {  # name logfile cmd...
  local name=$1 log=$2; shift 2
  for attempt in 1 2 3; do
    wait_relay || { echo "${name} abort: relay down/deadline"; return 1; }
    local now rem
    now=$(date +%s); rem=$(( DEADLINE - now ))
    [ "$rem" -le 600 ] && { echo "${name} abort: deadline"; return 1; }
    timeout "$rem" "$@" > "$log" 2>&1
    local rc=$?
    echo "${name} attempt=${attempt} rc=${rc}"
    [ "$rc" -eq 0 ] && return 0
    sleep 120   # let a crashed TPU worker settle before reprobing
  done
  return 1
}

# wait for queue2 (launched earlier; pid recorded at write time) to
# exit before touching the chip
Q2PID=${Q2PID:-3475}
while kill -0 "$Q2PID" 2>/dev/null; do
  sleep 120
done

run_with_retry SPHERE10M docs/r5_sphere_10m_p3.log \
  env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 \
      SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=10 \
  python scripts/run_sphere_flagship.py

echo QUEUE3_DONE
