"""Why does the flagship sphere Newton contract at only ~1.5x/step?

Runs the config-#5 base mesh (channel_with_sphere) steady solve and
prints per-Newton-iteration: residual norm, line-search alpha, linear
iterations spent, and the achieved-vs-requested linear residual.
Hypotheses this separates:
  (a) line search backing off (alpha < 1 rows)
  (b) linear solves not reaching their tolerance (lrn >> atol)
  (c) f32 residual-evaluation noise floor (A/B with DIAG_X64=1)
  (d) frozen-tau Jacobian limiting the asymptotic rate (slow even in
      f64 with alpha = 1 and converged linear solves)

Usage (CPU):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    SOFTX_NEWTON_CHUNK=1 DIAG_REFINE=1 python scripts/diag_newton_rate.py
  ... DIAG_X64=1 ... for the f64 leg.
"""

import os
import sys
import time

os.environ.setdefault("SOFTX_NEWTON_CHUNK", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("DIAG_X64") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

prm = SimulationParameters.from_file(
    os.path.join(os.path.dirname(__file__), "..",
                 "examples", "sphere_re100.prm"), dim=3)
prm.simulation_control.output_frequency = 0
prm.simulation_control.number_mesh_adaptation = 0
prm.mesh.initial_refinement = int(os.environ.get("DIAG_REFINE", "1"))
prm.fem.velocity_order = 1
prm.fem.pressure_order = 1
prm.nonlinear_solver.max_iterations = int(
    os.environ.get("DIAG_MAXNEWTON", "20"))
prm.linear_solver.preconditioner = os.environ.get("DIAG_PRECOND", "gmg")
prm.forces.calculate_forces = False
prm.restart.checkpoint = False
for blk in (prm.nonlinear_solver, prm.linear_solver):
    blk.verbosity = type(blk.verbosity)("quiet")

t0 = time.time()
s = GLSNavierStokesSolver(prm)
print(f"mesh: {s.space.n_elements} cells {s.space.n_dofs(4)} dofs "
      f"x64={jax.config.jax_enable_x64} precond={s.precond_kind} "
      f"setup={time.time()-t0:.0f}s", flush=True)

# ---- instrumented replica of _newton_chunked ------------------------
cfg = s.newton_cfg
u0 = s.bh.constrain(s.initial_condition(), 0.0)
uprev_combo = s._zero_prev
t, alpha0, sdt = 0.0, 0.0, 0.0

u, R, rnorm = s._chunk_init_jit(u0, uprev_combo, t, alpha0, sdt,
                                s._consts)
rn = float(rnorm)
print(f"it  0  res={rn:.6e}", flush=True)
it = 0
pstate = None
use_pstate = s._chunk_has_pstate()
while rn > cfg.tolerance and it < cfg.max_iterations:
    t1 = time.time()
    atol = jnp.asarray(max(cfg.relative_residual * rn,
                           cfg.minimum_residual), u.dtype)
    x = jnp.zeros(u.size, u.dtype)
    if use_pstate:
        pstate = s._chunk_pstate_jit(u, uprev_combo, t, alpha0, sdt,
                                     s._consts)
    lin = 0
    lrn = None
    for _cyc in range(cfg.max_krylov_cycles):
        if use_pstate:
            x, lrn, j = s._chunk_cycle_state_jit(
                u, R, x, atol, pstate, uprev_combo, t, alpha0, sdt,
                s._consts)
        else:
            x, lrn, j = s._chunk_cycle_jit(
                u, R, x, atol, uprev_combo, t, alpha0, sdt, s._consts)
        j = int(j)
        lin += j
        if j == 0 or float(lrn) <= float(atol):
            break
    u, R, rnorm, alpha = s._chunk_update_jit(
        u, x, rnorm, uprev_combo, t, alpha0, sdt, s._consts)
    rn_new = float(rnorm)
    rate = rn_new / rn if rn > 0 else float("nan")
    print(f"it {it+1:2d}  res={rn_new:.6e}  rate={rate:.3f}  "
          f"alpha={float(alpha):.4f}  lin={lin:3d}  "
          f"lrn={float(lrn):.2e} atol={float(atol):.2e}  "
          f"({time.time()-t1:.1f}s)", flush=True)
    rn = rn_new
    it += 1

print(f"done: {it} iterations, final res {rn:.3e}, "
      f"wall {time.time()-t0:.0f}s", flush=True)
