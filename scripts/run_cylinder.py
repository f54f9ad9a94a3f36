"""Cylinder Re=100 (Schaefer-Turek 2D-2) validation run: transient BDF2,
Cd/Cl time series -> mean Cd, Cl amplitude, Strouhal number.

Reference values for the confined benchmark (Um=1.5 parabolic inlet,
D=0.1, nu=0.001, Re=100): Cd_max ~ 3.22-3.24, Cl_max ~ +-1.0,
St ~ 0.295-0.305.  Coefficients: C = 2 F / (rho Umean^2 D) with
Umean = 2/3 * 1.5 = 1.0.
"""

import json
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
                 "examples", "cylinder_re100.prm"), dim=2)
prm.simulation_control.output_frequency = 0
prm.simulation_control.dt = float(os.environ.get("CYL_DT", "0.01"))
prm.simulation_control.time_end = float(os.environ.get("CYL_T", "7.0"))
prm.mesh.initial_refinement = int(os.environ.get("CYL_REFINE", "4"))
# Kelly-adaptation headroom: r4's Q2/refine-4 run self-converged at
# 22.6k cells with Cd_max 3.2171, 0.09% under the 3.22 band floor
ma = prm.mesh_adaptation
ma.max_refinement_level = int(os.environ.get(
    "CYL_MAXLEVEL", ma.max_refinement_level))
ma.fraction_refinement = float(os.environ.get(
    "CYL_FRAC", ma.fraction_refinement))
ma.max_number_elements = int(os.environ.get(
    "CYL_MAXEL", ma.max_number_elements))
prm.fem.velocity_order = int(os.environ.get("CYL_ORDER", "1"))
prm.fem.pressure_order = prm.fem.velocity_order
prm.forces.calculate_forces = False       # we sample manually
prm.restart.checkpoint = False
for blk in (prm.nonlinear_solver, prm.linear_solver):
    blk.verbosity = type(blk.verbosity)("quiet")

s = GLSNavierStokesSolver(prm)
print(f"elements={s.space.n_elements} dofs={s.space.n_dofs(3)}", flush=True)

series = []
t0 = time.time()


def on_step(solver, u, t):
    f = np.asarray(post.forces_on_boundary(
        solver.op, u, solver.space.boundary_faces[3]))
    series.append((t, f[0], f[1]))
    if len(series) % 50 == 0:
        cd, cl = 2 * f[0] / 0.1, 2 * f[1] / 0.1
        print(f"t={t:.2f} Cd={cd:.3f} Cl={cl:.3f} "
              f"wall={time.time()-t0:.0f}s", flush=True)
        arr = np.array(series)
        np.savetxt("/root/repo/docs/cylinder_forces.dat", arr,
                   header="t Fx Fy")


u = s.run_transient(on_step=on_step, verbose=False)
arr = np.array(series)
np.savetxt("/root/repo/docs/cylinder_forces.dat", arr, header="t Fx Fy")
# analysis over the last 40% (shedding developed)
tail = arr[int(0.6 * len(arr)):]
cd = 2 * tail[:, 1] / 0.1
cl = 2 * tail[:, 2] / 0.1
# Strouhal via zero crossings of Cl
sign = np.sign(cl - cl.mean())
crossings = tail[:-1, 0][np.diff(sign) > 0]
st = np.nan
if len(crossings) >= 2:
    period = np.mean(np.diff(crossings))
    st = 0.1 / period          # f * D / Umean, Umean = 1
print(json.dumps({
    "Cd_mean": float(cd.mean()), "Cd_max": float(cd.max()),
    "Cl_amp": float((cl.max() - cl.min()) / 2), "St": float(st),
    "ref": {"Cd_max": "3.22-3.24", "Cl_max": "~1.0", "St": "0.295-0.305"},
    "wall_s": time.time() - t0}), flush=True)
