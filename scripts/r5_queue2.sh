#!/bin/bash
# Round-5 chip queue, phase 2.  Queue1 results: cavity Q2-256^2 DONE
# (u_min -0.32498, docs/cavity256q2_run.log); TGV-96^3 GMG solved its
# first full 3.5M-DoF step (the r4 proto-size wall is GONE) but died in
# the ke_dissipation postprocessing einsum (42x tile-padded [E,nq,c,d]
# temps, 40.5 GB HBM ask).  That is fixed (commit 44a3557); re-run TGV,
# then the 10M sphere (resumes the r4 checkpoint at cycle 2), then the
# cylinder band push.
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
  done
  return 1
}

run_with_retry TGV96 16000 docs/tgv96_r5_run.log \
  env TGV_N=96 TGV_DT=0.02 TGV_T=12 TGV_PRECOND=auto \
  python scripts/run_tgv.py

run_with_retry SPHERE10M 26000 docs/r5_sphere_10m.log \
  env SPH_RESUME=1 SPH_REFINE=3 SPH_CYCLES=5 SPH_MAXEL=2600000 \
      SPH_SHARDS=1 SPH_MAXNEWTON=14 SPH_KRYLOV_M=10 \
  python scripts/run_sphere_flagship.py

echo QUEUE_CRITICAL_DONE

run_with_retry CYL 15000 docs/cylinder_q2r5m6_run.log \
  env CYL_ORDER=2 CYL_REFINE=4 CYL_MAXLEVEL=6 CYL_FRAC=0.15 \
      CYL_T=7.0 CYL_DT=0.01 \
  python scripts/run_cylinder.py

echo QUEUE_DONE
