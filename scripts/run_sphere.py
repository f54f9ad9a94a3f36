"""Flow past a sphere, Re = 100 (BASELINE config #5): steady GLS with
Kelly adaptation cycles, drag coefficient vs Johnson & Patel (1999)
Cd ~ 1.09.  Cd = Fx / (0.5 rho U^2 pi R^2) = Fx / (pi/8) for U=1, R=0.5.

Environment knobs: SPH_REFINE (initial), SPH_CYCLES (adaptation cycles),
SPH_ORDER (FE degree), SPH_MAXEL (element budget), SPH_SHARDS (run the
steady solves on an N-device mesh).
"""

import json
import math
import os

# one device program per Newton iteration: the axon TPU relay kills
# single programs at ~60 s (scripts/probe_tpu_fault.py)
os.environ.setdefault("SOFTX_NEWTON_CHUNK", "1")
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
from softx_2020_200_tpu.solvers import postprocessing as post

prm = SimulationParameters.from_file(
    os.path.join(os.path.dirname(__file__), "..",
                 "examples", "sphere_re100.prm"), dim=3)
prm.simulation_control.output_frequency = 0
prm.simulation_control.number_mesh_adaptation = int(
    os.environ.get("SPH_CYCLES", "3"))
prm.mesh.initial_refinement = int(os.environ.get("SPH_REFINE", "2"))
prm.fem.velocity_order = int(os.environ.get("SPH_ORDER", "1"))
prm.fem.pressure_order = prm.fem.velocity_order
prm.mesh_adaptation.max_number_elements = int(
    os.environ.get("SPH_MAXEL", "400000"))
prm.forces.calculate_forces = False          # sampled manually per cycle
prm.restart.checkpoint = False
for blk in (prm.nonlinear_solver, prm.linear_solver):
    blk.verbosity = type(blk.verbosity)("quiet")

t0 = time.time()
s = GLSNavierStokesSolver(prm)
print(f"base: elements={s.space.n_elements} "
      f"dofs={s.space.n_dofs(4)} wall={time.time()-t0:.0f}s", flush=True)

AREA = math.pi * 0.5 ** 2                    # frontal area, R = 0.5
rows = []


def on_cycle(solver, u, t):
    f = np.asarray(post.forces_on_boundary(
        solver.op, u, solver.space.boundary_faces[3]))
    cd = float(f[0]) / (0.5 * AREA)
    rows.append({"cells": solver.space.n_elements,
                 "dofs": solver.space.n_dofs(4),
                 "Fx": float(f[0]), "Cd": cd,
                 "wall_s": round(time.time() - t0, 1)})
    print(f"cycle {len(rows)}: cells={rows[-1]['cells']} "
          f"dofs={rows[-1]['dofs']} Cd={cd:.4f} "
          f"wall={rows[-1]['wall_s']}s", flush=True)


u = s.solve(on_cycle=on_cycle)
out = {"case": "sphere_re100_steady_kelly",
       "cycles": rows, "Cd_final": rows[-1]["Cd"] if rows else None,
       "ref": {"Cd": "~1.09 (Johnson & Patel 1999)"},
       "wall_s": round(time.time() - t0, 1)}
print(json.dumps(out), flush=True)
with open(os.path.join(os.path.dirname(__file__), "..",
                       "docs", "sphere_cd.json"), "w") as fh:
    json.dump(out, fh, indent=1)
