"""North-star benchmark: sec/Newton-step at ~10M DoF (BASELINE.json).

Builds the 3D Q1 GLS system on a structured cube at BENCH_N^3 elements
(default 136 -> 10.3M DoF), runs a full jitted Newton step (residual,
GMG-preconditioned FGMRES, line search) on the TPU, and reports wall
time per Newton step plus per-GMRES-iteration cost.

    BENCH_N=136 python scripts/bench_newton.py

The reference anchor (BASELINE.md): a CPU MPI rank runs the assembled
Trilinos GMRES+ILU machinery; the ">=10x lower sec/Newton-step per chip"
target is measured against a ~36-core node-equivalent of the 2020-era
stack.
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

import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

DECK = """
subsection simulation control
  set method = bdf1
  set time step = 0.01
  set time end = 0.01
end
subsection physical properties
  set kinematic viscosity = 0.001
end
subsection mesh
  set type = dealii
  set grid type = subdivided_hyper_rectangle
  set grid arguments = {n}, {n}, {n} : 0, 0, 0 : 1, 1, 1 : true
end
subsection boundary conditions
  set number = 6
  subsection bc 0
    set id = 0
    set type = function
    subsection u
      set Function expression = y*(1-y)*z*(1-z)
    end
  end
  subsection bc 1
    set id = 1
    set type = outlet
  end
  subsection bc 2
    set id = 2
    set type = noslip
  end
  subsection bc 3
    set id = 3
    set type = noslip
  end
  subsection bc 4
    set id = 4
    set type = noslip
  end
  subsection bc 5
    set id = 5
    set type = noslip
  end
end
subsection non-linear solver
  set verbosity = quiet
  set tolerance = 1e-30
  set max iterations = 1
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-30
  set max krylov vectors = {m}
  set max iters = 400
end
"""


def main() -> int:
    n = int(os.environ.get("BENCH_N", "136"))
    sharded = os.environ.get("BENCH_SHARDED", "0") == "1"
    prm = SimulationParameters.from_text(DECK.format(n=n, m=os.environ.get("BENCH_M", "25")), dim=3)
    t0 = time.time()
    s = GLSNavierStokesSolver(prm)
    setup_s = time.time() - t0
    n_dofs = s.space.n_dofs(4)
    print(f"elements={s.space.n_elements} dofs={n_dofs} "
          f"levels={len(getattr(s, '_mg_ops', [1]))} "
          f"setup={setup_s:.1f}s", flush=True)

    import jax.numpy as jnp

    if sharded:
        # the PRODUCTION path at scale: the sharded program measured on
        # the available device(s) — on one chip this times the per-shard
        # work of a P-chip run (halo ppermutes become self-copies)
        from softx_2020_200_tpu.parallel.sharded import ShardedGLSSolver
        t0 = time.time()
        sh = ShardedGLSSolver.from_solver(s)
        part_s = time.time() - t0
        print(f"sharded setup (P={sh.n_shards}, kernel="
              f"{'pallas' if sh._pallas else 'xla'}, precond="
              f"{'gmg' if sh._mg_ops else sh.precond_kind}): "
              f"{part_s:.1f}s", flush=True)
        u0 = s.initial_condition()
        u_stack = sh.to_local(np.asarray(u0))
        combo = jnp.zeros((sh.n_shards, sh.layout.N_loc, 3),
                          sh.dtype)
        t0 = time.time()
        out_ = sh.solve_local(u_stack, combo, t=0.0, alpha0=100.0,
                              sdt=100.0)
        nlin = int(np.asarray(out_[3])[0])
        compile_s = time.time() - t0
        n_rep = 3
        t0 = time.time()
        for _ in range(n_rep):
            out_ = sh.solve_local(u_stack, combo, t=0.0, alpha0=100.0,
                                  sdt=100.0)
            nlin = int(np.asarray(out_[3])[0])
        step_s = (time.time() - t0) / n_rep
        out = {
            "metric": "sec_per_newton_step_sharded",
            "value": round(step_s, 3),
            "unit": "s",
            "n_dofs": n_dofs,
            "n_shards": sh.n_shards,
            "gmres_iters": nlin,
            "sec_per_gmres_iter": round(step_s / max(nlin, 1), 5),
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps(out))
        return 0

    u0 = s.initial_condition()
    prev = u0[:, :3]
    # one full Newton step (max iterations = 1), timed after compile
    t0 = time.time()
    res = s._solve_jit(u0, 0.0 * prev, 0.0, 100.0, 100.0, s._consts)
    nlin = int(res.linear_iters)            # forces completion
    compile_s = time.time() - t0
    t0 = time.time()
    n_rep = 3
    for _ in range(n_rep):
        res = s._solve_jit(u0, 0.0 * prev, 0.0, 100.0, 100.0, s._consts)
        nlin = int(res.linear_iters)
    step_s = (time.time() - t0) / n_rep
    out = {
        "metric": "sec_per_newton_step",
        "value": round(step_s, 3),
        "unit": "s",
        "backend": jax.default_backend(),
        "n_dofs": n_dofs,
        "gmres_iters": nlin,
        "sec_per_gmres_iter": round(step_s / max(nlin, 1), 5),
        # the north-star comparison normalizes per DoF per GMRES iter
        # so a feasible-size CPU run (JAX_PLATFORMS=cpu BENCH_N=48)
        # scales honestly against the 10M-DoF TPU run
        "ns_per_dof_per_gmres_iter": round(
            step_s / max(nlin, 1) / n_dofs * 1e9, 3),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
