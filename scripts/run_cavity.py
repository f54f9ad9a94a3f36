"""Lid-driven cavity Re=400 (BASELINE config #1): centerline velocity
profiles vs Ghia, Ghia & Shin (1982).

    CAV_N=256 python scripts/run_cavity.py

Writes docs/cavity{N}_centerline.dat and prints a summary JSON with the
min-u comparison (Ghia: u_min ~ -0.3273 on the vertical centerline).
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

N = int(os.environ.get("CAV_N", "256"))

# Ghia, Ghia & Shin (1982), Re=400, u on the vertical centerline
GHIA_Y = [0.0, 0.0547, 0.0625, 0.0703, 0.1016, 0.1719, 0.2813, 0.4531,
          0.5, 0.6172, 0.7344, 0.8516, 0.9531, 0.9609, 0.9688, 0.9766,
          1.0]
GHIA_U = [0.0, -0.08186, -0.09266, -0.10338, -0.14612, -0.24299,
          -0.32726, -0.17119, -0.11477, 0.02135, 0.16256, 0.29093,
          0.55892, 0.61756, 0.68439, 0.75837, 1.0]

DECK = """
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
  set max iterations = 20
end
subsection linear solver
  set verbosity = quiet
  set relative residual = 1e-4
  set minimum residual = 1e-11
  set max krylov vectors = 60
  set max iters = 6000
end
"""

prm = SimulationParameters.from_text(DECK.format(n=N), dim=2)
# CAV_PRECOND=block_jacobi works around a TPU-runtime fault observed
# with the 2D GMG program at >= 256^2 (docs/VALIDATION.md)
prm.linear_solver.preconditioner = os.environ.get("CAV_PRECOND", "auto")
ORDER = int(os.environ.get("CAV_ORDER", "1"))
prm.fem.velocity_order = ORDER
prm.fem.pressure_order = ORDER
t0 = time.time()
s = GLSNavierStokesSolver(prm)
print(f"elements={s.space.n_elements} dofs={s.space.n_dofs(3)} "
      f"levels={len(getattr(s, '_mg_ops', [1]))}", flush=True)
u, res = s.solve_steady(verbose=False)
wall = time.time() - t0
un = np.asarray(u)

# vertical centerline x = 0.5: structured lattice nodes
nodes = s.space.nodes
sel = np.nonzero(np.abs(nodes[:, 0] - 0.5) < 1e-12)[0]
order = np.argsort(nodes[sel, 1])
y = nodes[sel[order], 1]
ux = un[sel[order], 0]
tag = f"{N}" if ORDER == 1 else f"{N}q{ORDER}"
np.savetxt(f"/root/repo/docs/cavity{tag}_centerline.dat",
           np.column_stack([y, ux]), header="y u")

u_at_ghia = np.interp(GHIA_Y, y, ux)
err = np.abs(u_at_ghia - np.asarray(GHIA_U))[1:-1]
print(json.dumps({
    "n": N, "dofs": int(s.space.n_dofs(3)),
    "newton_iters": int(res.n_iterations),
    "linear_iters": int(res.linear_iters),
    "u_min": float(ux.min()),
    "ghia_u_min": -0.32726,
    "max_profile_err": float(err.max()),
    "rms_profile_err": float(np.sqrt((err ** 2).mean())),
    "wall_s": wall}), flush=True)
