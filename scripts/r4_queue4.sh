#!/bin/bash
# Round-4 chip queue, phase 4: queue3 died when the axon relay went
# down mid-cylinder (Connection refused on 127.0.0.1:8093 — see
# docs/cylinder_q2r4_run.log, tgv96_gmg_run.log, cavity192q2_run.log).
# This phase WAITS for the relay to come back, smoke-tests the chip,
# then re-runs the same three band runs:
# 1. cylinder Q2/refine-4 adaptive (VERDICT r3 #3, Cd_max 3.22-3.24 St 0.295-0.305)
# 2. TGV-96^3 under GMG (VERDICT r3 #5 done-criterion)
# 3. cavity Q2-192^2 (config #1: min-u -> -0.327)
# Sequential so the single v5e is never contended.  Launch DETACHED
# (setsid nohup) so it survives builder-session restarts.
set -x
cd /root/repo

# Wait up to 8h for the relay, probing with a real tiny TPU program
# (port-open alone doesn't prove the backend works).
for i in $(seq 1 480); do
  if timeout 120 python -c "
import jax, jax.numpy as jnp
assert jax.default_backend() == 'tpu'
print(float(jnp.ones(8).sum()))" >/dev/null 2>&1; then
    echo "RELAY_UP after ${i} probes"
    break
  fi
  sleep 60
done

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

echo QUEUE4_DONE
