#!/bin/bash
# Round-5 chip queue, phase 5.  Replaces queue3/queue4 after THREE
# identical TPU-worker crashes of the cycle-4 sphere resume (2.12M
# cells / 9.2M DoF, GMG, m=10): the failure is systematic at this
# size, not relay flake, so repeating the same command was going to
# burn the deadline.  Escalation instead:
#   (a) GMG with smaller per-program work (m=6) — if the crash is
#       program-size/time related this keeps the good preconditioner;
#   (b) block-Jacobi fallback (proven converged at 2.16M DoF in r4's
#       ladder; more iterations, much smaller programs/consts);
# then the short phase-4 jobs (roofline re-run + bench preview) while
# the chip is still reachable, ahead of the driver's round-end bench.
set -x
cd /root/repo

DEADLINE=1787191016            # inherited from queue3's hard stop
BENCH_RESERVE=4200             # keep this much for roofline+bench

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

SPH_STOP=$(( DEADLINE - BENCH_RESERVE ))

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

# (a) GMG, smaller chunk programs
if wait_relay "$SPH_STOP"; then
  run_bounded docs/r5_sphere_10m_p5a.log \
    env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=4 SPH_MAXEL=2600000 \
        SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=6 \
    python scripts/run_sphere_flagship.py
  rc=$?
else
  rc=1
fi

# (b) block-Jacobi fallback, two tries
if [ "$rc" -ne 0 ]; then
  for attempt in 1 2; do
    wait_relay "$SPH_STOP" || break
    run_bounded docs/r5_sphere_10m_p5b${attempt}.log \
      env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=4 SPH_MAXEL=2600000 \
          SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=10 \
          SPH_PRECOND=block_jacobi \
      python scripts/run_sphere_flagship.py
    [ $? -eq 0 ] && break
    sleep 120
  done
fi

# phase-4 tail: roofline + bench preview (short, bounded)
wait_relay "$DEADLINE" && \
  timeout 2400 python scripts/bench_roofline.py \
    > docs/roofline_r5_run.log 2>&1
echo "ROOFLINE rc=$?"

wait_relay "$DEADLINE" && \
  timeout 3600 python bench.py > docs/bench_r5_preview.log 2>&1
echo "BENCH rc=$?"

echo QUEUE5_DONE
