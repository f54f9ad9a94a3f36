"""Taylor-Green vortex Re=1600 (BASELINE config #4): KE-dissipation
curve vs the 512^3 spectral DNS (peak -dE/dt ~ 0.0122 near t ~ 9).

    TGV_N=64 TGV_DT=0.04 TGV_T=12 python scripts/run_tgv.py

Writes docs/tgv{N}_series.dat (t, KE, eps_total, eps_resolved) and
prints a summary JSON.  eps_total = -dE/dt (finite difference of the
KE series — what the DNS reference reports); eps_resolved =
nu * <grad u : grad u> (the resolved viscous dissipation).
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

N = int(os.environ.get("TGV_N", "64"))
DT = float(os.environ.get("TGV_DT", "0.04"))
T = float(os.environ.get("TGV_T", "12.0"))

prm = SimulationParameters.from_file(
    os.path.join(os.path.dirname(__file__), "..",
                 "examples", "tgv3d_re1600.prm"), dim=3)
prm.simulation_control.output_frequency = 0
prm.simulation_control.dt = DT
prm.simulation_control.time_end = T
L = 6.283185307179586
prm.mesh.grid_arguments = (f"{N}, {N}, {N} : 0, 0, 0 : "
                           f"{L}, {L}, {L} : true")
prm.restart.checkpoint = False
for blk in (prm.nonlinear_solver, prm.linear_solver):
    blk.verbosity = type(blk.verbosity)("quiet")
# >= 96^3 the GMG level temps/literals blow HBM (SoA [q,c,d,E] arrays
# tile-pad 42x on TPU — docs/tgv96_run.log); BDF2 at CFL<1 is
# mass-dominated, so block-Jacobi converges in similar iterations
prm.linear_solver.preconditioner = os.environ.get(
    "TGV_PRECOND", "block_jacobi" if N >= 96 else "auto")

s = GLSNavierStokesSolver(prm)
print(f"elements={s.space.n_elements} dofs={s.space.n_dofs(4)} "
      f"pallas={s.op._pallas is not None} "
      f"levels={len(getattr(s, '_mg_ops', [1]))}", flush=True)

series = []
t0 = time.time()


def on_step(solver, u, t):
    ke = float(post.kinetic_energy(solver.op, u))
    eps = float(post.ke_dissipation_rate(solver.op, u))
    series.append((t, ke, eps))
    n = len(series)
    if n % max(1, int(round(0.5 / DT))) == 0:
        print(f"t={t:.2f} KE={ke:.5f} eps={eps:.5f} "
              f"wall={time.time()-t0:.0f}s", flush=True)
        arr = np.array(series)
        dE = -np.gradient(arr[:, 1], arr[:, 0])
        np.savetxt(f"/root/repo/docs/tgv{N}_series.dat",
                   np.column_stack([arr, dE]),
                   header="t KE eps_resolved eps_total")


u = s.run_transient(on_step=on_step, verbose=False)
arr = np.array(series)
dE = -np.gradient(arr[:, 1], arr[:, 0])
np.savetxt(f"/root/repo/docs/tgv{N}_series.dat",
           np.column_stack([arr, dE]),
           header="t KE eps_resolved eps_total")
k = int(np.argmax(dE))
print(json.dumps({
    "n": N, "dt": DT,
    "peak_dissipation": float(dE[k]), "t_peak": float(arr[k, 0]),
    "peak_resolved": float(arr[:, 2].max()),
    "t_peak_resolved": float(arr[np.argmax(arr[:, 2]), 0]),
    "reference": 0.0122, "t_reference": 9.0,
    "wall_s": time.time() - t0}), flush=True)
