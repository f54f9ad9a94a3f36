"""Instrumented repro of the round-3 cavity-Q2-128 TPU crash: prints
wall time + residual for every chunked-Newton device program so the
crash site (which program, how long it ran) is unambiguous.

    CAV_N=128 CAV_ORDER=2 python scripts/repro_cavity_crash.py
"""

import os
import time

os.environ.setdefault("SOFTX_NEWTON_CHUNK", "1")
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver
from scripts.run_cavity import DECK  # reuse the deck text

N = int(os.environ.get("CAV_N", "128"))
ORDER = int(os.environ.get("CAV_ORDER", "2"))

prm = SimulationParameters.from_text(DECK.format(n=N), dim=2)
prm.linear_solver.preconditioner = os.environ.get("CAV_PRECOND", "auto")
prm.fem.velocity_order = ORDER
prm.fem.pressure_order = ORDER

t0 = time.time()
s = GLSNavierStokesSolver(prm)
print(f"setup {time.time()-t0:.0f}s elements={s.space.n_elements} "
      f"dofs={s.space.n_dofs(3)} precond={s.precond_kind} "
      f"levels={len(getattr(s, '_mg_levels', []) or [])}", flush=True)

u0 = s.initial_condition()
print(f"ic done {time.time()-t0:.0f}s", flush=True)

cfg = s.newton_cfg
t1 = time.time()
u, R, rnorm = s._chunk_init_jit(u0, s._zero_prev, 0.0, 0.0, 0.0,
                                s._consts)
rn = float(rnorm)
print(f"chunk_init wall={time.time()-t1:.1f}s rnorm={rn:.3e}",
      flush=True)

it = 0
while rn > cfg.tolerance and it < cfg.max_iterations:
    atol = jnp.asarray(max(cfg.relative_residual * rn,
                           cfg.minimum_residual), u.dtype)
    x = jnp.zeros(u.size, u.dtype)
    for cyc in range(cfg.max_krylov_cycles):
        t1 = time.time()
        x, lrn, j = s._chunk_cycle_jit(
            u, R, x, atol, s._zero_prev, 0.0, 0.0, 0.0, s._consts)
        j = int(j)
        lr = float(lrn)
        print(f"  cycle {cyc}: lin_rnorm={lr:.3e} j={j} "
              f"wall={time.time()-t1:.1f}s", flush=True)
        if j == 0 or lr <= float(atol):
            break
    t1 = time.time()
    u, R, rnorm, alpha = s._chunk_update_jit(
        u, x, rnorm, s._zero_prev, 0.0, 0.0, 0.0, s._consts)
    rn = float(rnorm)
    it += 1
    print(f"iter {it}: rnorm={rn:.3e} alpha={float(alpha):.3f} "
          f"wall={time.time()-t1:.1f}s", flush=True)

t1 = time.time()
un = np.asarray(u)
print(f"u transfer wall={time.time()-t1:.1f}s |u|={np.abs(un).max():.3f} "
      f"total={time.time()-t0:.0f}s", flush=True)
