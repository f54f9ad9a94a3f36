"""cProfile the budget-CAPPED adaptation step (kelly_estimate jumped
9.6 s -> 65 s between the uncapped 578k-cell step and the capped 600k
step in docs/adapt_cost.json — this isolates what scales with the
hanging-face count rather than the cell count).

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/profile_adapt_capped.py
"""

import cProfile
import io
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

MAXEL = int(os.environ.get("ADAPT_MAXEL", "600000"))

DECK = f"""
subsection simulation control
  set method = steady
  set output frequency = 0
end
subsection physical properties
  set kinematic viscosity = 0.05
end
subsection mesh
  set type = dealii
  set grid type = hyper_cube
  set grid arguments = 0 : 1 : true
  set initial refinement = 4
end
subsection mesh adaptation
  set type = kelly
  set fraction type = number
  set fraction refinement = 0.35
  set max refinement level = 12
  set max number elements = {MAXEL}
end
subsection boundary conditions
  set number = 6
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
    set type = noslip
  end
  subsection bc 4
    set id = 4
    set type = noslip
  end
  subsection bc 5
    set id = 5
    set type = function
    subsection u
      set Function expression = 1
    end
  end
end
subsection linear solver
  set verbosity = quiet
  set preconditioner = gmg
end
subsection test
  set enable = true
end
"""

prm = SimulationParameters.from_text(DECK, dim=3)
s = GLSNavierStokesSolver(prm)
nodes = np.asarray(s.space.nodes)
u = np.zeros((s.space.n_nodes, 4), dtype=np.float32)
u[:, 0] = np.sin(3 * nodes[:, 0]) * np.cos(2 * nodes[:, 1])
u[:, 1] = np.cos(5 * nodes[:, 2]) * nodes[:, 0]
u[:, 2] = nodes[:, 1] * nodes[:, 2]

# ladder up to the capped state WITHOUT profiling
while True:
    before = s.space.n_elements
    t0 = time.time()
    out = s.refine_mesh_kelly([jax.numpy.asarray(u)])
    u = np.asarray(out[0])
    print(f"ladder: {before} -> {s.space.n_elements} "
          f"({time.time()-t0:.1f}s, nc={len(s._nc_faces or [])})",
          flush=True)
    if s.space.n_elements >= int(0.95 * MAXEL) \
            or s.space.n_elements == before:
        break

# profile ONE capped adapt
pr = cProfile.Profile()
pr.enable()
out = s.refine_mesh_kelly([jax.numpy.asarray(u)])
pr.disable()
buf = io.StringIO()
ps = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
ps.print_stats(40)
print(buf.getvalue())
