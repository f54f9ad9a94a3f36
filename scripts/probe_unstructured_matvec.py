"""Decompose the UNSTRUCTURED (forest/gmsh) Jacobian-matvec cost.

The structured-lattice path measures ~0.9 GDoF/s on the chip while the
flagship sphere O-grid runs orders of magnitude slower per FGMRES
iteration.  This probe times each piece of the unstructured Pallas
matvec on the config-#5 mesh so the optimization lands on the measured
bottleneck, not a guess:

  full      linearized residual (J.v as GMRES sees it, constraints incl.)
  resid     primal residual (kernel + gather/scatter, no linearize)
  gather    u[elem_nodes]                      (XLA gather, [E,nn,c])
  to_rows   [E,k] -> [k,Eg,S,L] pad+transpose  (row-layout adapter)
  kernel    fused Pallas tangent kernel on prebuilt rows
  fromrows  [k,Eg,S,L] -> [E,k] transpose
  assemble  assembly-map gather-sum            ([N,M] idx into E*nn+1)
  hcdist    hanging-constraint distribute + transpose
  vcycle    one preconditioner application (GMG V-cycle if configured)

Timing: host-read forces completion (block_until_ready does not block
through the axon relay).  SPH_REFINE / reps via env.

  python scripts/probe_unstructured_matvec.py            # chip
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu ...      # CPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

REPS = int(os.environ.get("PROBE_REPS", "20"))

prm = SimulationParameters.from_file(
    os.path.join(os.path.dirname(__file__), "..",
                 "examples", "sphere_re100.prm"), dim=3)
prm.simulation_control.output_frequency = 0
prm.simulation_control.number_mesh_adaptation = 0
prm.mesh.initial_refinement = int(os.environ.get("SPH_REFINE", "2"))
prm.fem.velocity_order = 1
prm.fem.pressure_order = 1
prm.forces.calculate_forces = False
prm.restart.checkpoint = False
for blk in (prm.nonlinear_solver, prm.linear_solver):
    blk.verbosity = type(blk.verbosity)("quiet")

t0 = time.time()
s = GLSNavierStokesSolver(prm)
op = s.op
pg = getattr(op, "_pallas", None)
n_dofs = s.space.n_dofs(4)
print(f"mesh: {s.space.n_elements} elements {n_dofs} dofs "
      f"backend={jax.default_backend()} pallas={pg is not None} "
      f"setup={time.time()-t0:.0f}s", flush=True)


def timeit(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(
        lambda a: np.asarray(jax.tree_util.tree_leaves(a)[0] if False
                             else a).ravel()[:1], out)  # force
    t1 = time.time()
    for _ in range(REPS):
        out = fn(*args)
    # host read forces completion of the whole chain
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf).ravel()[:1]
    dt = (time.time() - t1) / REPS
    print(f"{name:9s} {dt*1e3:9.3f} ms   "
          f"{n_dofs/dt/1e6:10.1f} MDoF/s", flush=True)
    return dt


rng = np.random.default_rng(0)
u = jnp.asarray(rng.standard_normal((s.space.n_nodes, 4)),
                op.dtype)
v = jnp.asarray(rng.standard_normal((s.space.n_nodes, 4)),
                op.dtype)
C = s._consts
uprev = s._zero_prev
fq = jnp.zeros_like(C["qpts_phys"][..., :3])
alpha0 = jnp.asarray(0.0, op.dtype)
sdt = jnp.asarray(0.0, op.dtype)

results = {}

# -- full linearized matvec (as GMRES applies it) ---------------------
constrain, residual, precond_builder, mask, fq_t = s._make_problem(
    uprev, 0.0, 0.0, 0.0, C)


@jax.jit
def full_mv(u_, v_):
    _, mv = jax.linearize(residual, u_)
    return mv(v_)


results["full"] = timeit("full", full_mv, u, v)


@jax.jit
def primal(u_):
    return residual(u_)


results["resid"] = timeit("resid", primal, u)

en = C["elem_nodes"]

results["gather"] = timeit("gather", jax.jit(lambda u_: u_[en]), u)

if pg is not None:
    ue = u[en]
    results["to_rows"] = timeit("to_rows", jax.jit(pg.to_rows), ue)
    ue2 = pg.to_rows(ue)
    up2 = pg.to_rows(uprev[en])
    fq2 = pg.to_rows(fq)
    xe2 = C.get("pg_xe") if C.get("pg_xe") is not None else pg.xe_t
    h2 = C.get("pg_h") if C.get("pg_h") is not None else pg.h_t

    @jax.jit
    def kern(due2):
        return pg._tangent(ue2, due2, up2, fq2, xe2, h2, alpha0, sdt)

    results["kernel"] = timeit("kernel", kern, ue2)
    r2 = kern(ue2)
    results["fromrows"] = timeit("fromrows", jax.jit(pg.from_rows), r2)
    r_el = pg.from_rows(r2).reshape(op.n_elements, op.nn, op.nc)
    results["assemble"] = timeit(
        "assemble", jax.jit(lambda re_: op._assemble(re_, C)), r_el)

if s.hc.n:
    results["hcdist"] = timeit(
        "hcdist",
        jax.jit(lambda u_: s.hc.distribute_transpose(
            s.hc.distribute(u_))), u)

try:
    P = jax.jit(lambda u_: precond_builder(u_)(v))
    results["vcycle"] = timeit("vcycle", P, u)
except Exception as e:
    print(f"vcycle skipped: {e!r}")

out = {"case": "unstructured_matvec_breakdown",
       "backend": jax.default_backend(),
       "n_elements": int(s.space.n_elements),
       "n_dofs": int(n_dofs),
       "hc_rows": int(s.hc.n),
       "ms": {k: round(v * 1e3, 3) for k, v in results.items()}}
print(json.dumps(out), flush=True)
path = os.path.join(os.path.dirname(__file__), "..", "docs",
                    f"matvec_breakdown_{jax.default_backend()}.json")
with open(path, "w") as fh:
    json.dump(out, fh, indent=1)
