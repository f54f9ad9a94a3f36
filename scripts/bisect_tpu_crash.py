"""Bisect the round-3 TPU worker crashes: which (size, order,
preconditioner) first crashes the worker, and on WHICH program
(residual eval / Krylov cycle / line search)?

Each config runs in a SUBPROCESS so one crash cannot poison the next
config's jax client; a crashed config is followed by a cool-down so
the worker can restart.

    python scripts/bisect_tpu_crash.py
"""

import os
import subprocess
import sys
import time

CHILD = r"""
import os, sys, time
os.environ["SOFTX_NEWTON_CHUNK"] = "1"
sys.path.insert(0, %(repo)r)
import jax, jax.numpy as jnp
from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

N, ORDER, PRECOND = %(n)d, %(order)d, %(precond)r
DECK = '''
subsection simulation control
  set method = steady
  set output frequency = 0
end
subsection physical properties
  set kinematic viscosity = 0.0025
end
subsection mesh
  set type = dealii
  set grid type = subdivided_hyper_rectangle
  set grid arguments = {n}, {n} : 0, 0 : 1, 1 : true
end
subsection boundary conditions
  set number = 4
  subsection bc 0
    set id = 0
    set type = noslip
  end
  subsection bc 1
    set id = 1
    set type = noslip
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = function
    subsection u
      set Function expression = 1
    end
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-8
  set max iterations = 3
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set max krylov vectors = 30
end
'''
prm = SimulationParameters.from_text(DECK.format(n=N), dim=2)
prm.linear_solver.preconditioner = PRECOND
prm.fem.velocity_order = ORDER
prm.fem.pressure_order = ORDER
t0 = time.time()
s = GLSNavierStokesSolver(prm)
print(f"setup {time.time()-t0:.0f}s dofs={s.space.n_dofs(3)} "
      f"precond={s.precond_kind}", flush=True)
u0 = s.initial_condition()
cfg = s.newton_cfg
stage = "init"
try:
    t1 = time.time()
    u, R, rnorm = s._chunk_init_jit(u0, s._zero_prev, 0.0, 0.0, 0.0,
                                    s._consts)
    rn = float(rnorm)
    print(f"init ok {time.time()-t1:.1f}s rnorm={rn:.3e}", flush=True)
    stage = "cycle"
    atol = jnp.asarray(max(cfg.relative_residual * rn,
                           cfg.minimum_residual), u.dtype)
    x = jnp.zeros(u.size, u.dtype)
    t1 = time.time()
    x, lrn, j = s._chunk_cycle_jit(u, R, x, atol, s._zero_prev,
                                   0.0, 0.0, 0.0, s._consts)
    print(f"cycle ok {time.time()-t1:.1f}s j={int(j)} "
          f"lrn={float(lrn):.3e}", flush=True)
    stage = "update"
    t1 = time.time()
    u, R, rnorm, alpha = s._chunk_update_jit(
        u, x, rnorm, s._zero_prev, 0.0, 0.0, 0.0, s._consts)
    print(f"update ok {time.time()-t1:.1f}s rnorm={float(rnorm):.3e}",
          flush=True)
    print("PASS", flush=True)
except Exception as e:
    print(f"CRASH at stage={stage}: {type(e).__name__} "
          f"{str(e)[:100]}", flush=True)
    sys.exit(2)
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    configs = [
        (32, 2, "gmg"),
        (64, 2, "gmg"),
        (128, 2, "block_jacobi"),
        (128, 2, "gmg"),
        (128, 1, "gmg"),
        (256, 1, "gmg"),
    ]
    for n, order, precond in configs:
        print(f"=== N={n} order={order} precond={precond} ===",
              flush=True)
        code = CHILD % {"repo": repo, "n": n, "order": order,
                        "precond": precond}
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=2400)
        out = (r.stdout + r.stderr)
        for line in out.splitlines():
            if ("WARNING" not in line and line.strip()
                    and "Traceback" not in line):
                print("  " + line[:150], flush=True)
        print(f"  rc={r.returncode} wall={time.time()-t0:.0f}s",
              flush=True)
        if r.returncode != 0:
            time.sleep(90)   # let the worker restart
    return 0


if __name__ == "__main__":
    sys.exit(main())
