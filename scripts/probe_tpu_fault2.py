"""Probe 2: is the axon relay watchdog per-PROGRAM or per device-busy
WINDOW across back-to-back programs?

Round-3 observation: with the host-chunked Newton driver (one program
per Newton iteration, scalar host read between), large runs still died
— and the crash surfaced at a LATER host read, after every per-chunk
``float(rnorm)`` had succeeded.  Hypothesis: N queued/back-to-back
programs of ~20 s each count as one busy window; the watchdog fires at
60 s of continuous device activity regardless of program boundaries.

This probe runs 8 consecutive ~18 s programs, forcing a scalar host
read between each, and reports where (if anywhere) it dies.  A second
phase retries with a 2 s host sleep between programs to test whether
idle gaps reset the watchdog.

    python scripts/probe_tpu_fault2.py
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

    _, _ = run(100)          # compile
    per100, _ = run(100)
    print(f"calibration: 100 iters {per100:.3f}s", flush=True)
    steps18 = max(100, int(100 * 18.0 / max(per100, 1e-4)))

    for label, gap in (("back-to-back", 0.0), ("2s-gap", 2.0)):
        print(f"--- phase: {label} ---", flush=True)
        t_phase = time.time()
        ok = True
        for k in range(8):
            t0 = time.time()
            try:
                wall, s = run(steps18)
                print(f"  prog {k}: OK wall={wall:.1f}s "
                      f"cum={time.time()-t_phase:.1f}s", flush=True)
            except Exception as e:
                print(f"  prog {k}: DIED wall={time.time()-t0:.1f}s "
                      f"cum={time.time()-t_phase:.1f}s "
                      f"err={type(e).__name__}: {str(e)[:90]}",
                      flush=True)
                ok = False
                break
            if gap:
                time.sleep(gap)
        if not ok and label == "back-to-back":
            # give the worker time to restart before phase 2
            print("  waiting 120s for worker restart...", flush=True)
            time.sleep(120)
            try:
                run(100)
            except Exception:
                time.sleep(120)
                run(100)
    return 0


if __name__ == "__main__":
    sys.exit(main())
