"""Probe the TPU-runtime fault seen on long programs (round-3 crash
triage: cavity-Q2-GMG, cylinder-Q2-r5, sphere-forest-GMG all died with
'TPU worker crashed or restarted' at the first host sync).

Finding (first run): a trivial fori_loop matmul program of ~90s wall
dies the same way -> single-program duration watchdog, not a kernel
bug.  This refined probe bisects the threshold.  NOTE: on the axon
relay ``block_until_ready()`` does NOT block; only a host read
(``float(jnp.sum(...))``) forces completion.

    python scripts/probe_tpu_fault.py
"""

import sys
import time

import jax
import jax.numpy as jnp


def main():
    n = 4096
    x = jnp.ones((n, n), jnp.float32) * 1e-3

    @jax.jit
    def burn(x, steps):
        def body(i, a):
            return a @ x * 1e-3 + x
        return jax.lax.fori_loop(0, steps, body, x)

    def run(steps):
        t0 = time.time()
        s = float(jnp.sum(burn(x, steps)))
        return time.time() - t0, s

    t_compile, _ = run(100)
    per100, _ = run(100)
    print(f"calibration: first {t_compile:.2f}s, 100 iters {per100:.3f}s",
          flush=True)

    for target_s in (5, 15, 30, 45, 60, 75, 90):
        steps = max(100, int(100 * target_s / max(per100, 1e-4)))
        t0 = time.time()
        try:
            wall, s = run(steps)
            print(f"target {target_s:>3}s: OK   wall={wall:.1f}s "
                  f"steps={steps} sum={s:.3e}", flush=True)
        except Exception as e:
            wall = time.time() - t0
            print(f"target {target_s:>3}s: DIED wall={wall:.1f}s "
                  f"steps={steps} err={type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
