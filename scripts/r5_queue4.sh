#!/bin/bash
# Round-5 chip queue, phase 4: after queue3 (sphere-10M resume) releases
# the chip, measure the NEW affine-lattice MXU kernel on real hardware —
# roofline re-run (docs/roofline.json: is the VPU bottleneck gone?) and a
# full bench.py preview so BENCH_r05's direction is known before the
# driver's round-end run.  Short jobs only; the chip must stay free.
set -x
cd /root/repo

wait_relay() {
  for i in $(seq 1 240); do
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

# wait for queue3 to exit before touching the chip
Q3PID=${Q3PID:-16136}
while kill -0 "$Q3PID" 2>/dev/null; do
  sleep 120
done

wait_relay || exit 1
timeout 2400 python scripts/bench_roofline.py \
  > docs/roofline_r5_run.log 2>&1
echo "ROOFLINE rc=$?"

wait_relay || exit 1
timeout 3600 python bench.py > docs/bench_r5_preview.log 2>&1
echo "BENCH rc=$?"

echo QUEUE4_DONE
