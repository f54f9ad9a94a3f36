"""Profile the FULL production adaptation step at scale (VERDICT r4
missing #6 / next-round #8): the flagship's `adapt N (810s)` at 1.6M
cells is refine_mesh_kelly = kelly_estimate + forest ops + build_mesh
+ setup() (constraints, FESpace, GMG hierarchy rebuild) + transfer.
docs/forest_cost.json covers only the forest slice (~70 s there), so
this script times the whole pipeline per cycle via the solver timer
sections and prints one JSON line per adapt.

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu X64=0 \
        ADAPT_MAXEL=1600000 python scripts/profile_adapt.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("X64", "0") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

MAXEL = int(os.environ.get("ADAPT_MAXEL", "1600000"))
REF = int(os.environ.get("ADAPT_REF", "4"))

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
  set initial refinement = {REF}
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
print(json.dumps({"base_elements": s.space.n_elements}), flush=True)

rows = []
# a smooth, corner-weighted fake solution: enough spatial structure
# for Kelly to mark a realistic spread of cells
nodes = np.asarray(s.space.nodes)
u = np.zeros((s.space.n_nodes, 4), dtype=np.float32)
u[:, 0] = np.sin(3 * nodes[:, 0]) * np.cos(2 * nodes[:, 1])
u[:, 1] = np.cos(5 * nodes[:, 2]) * nodes[:, 0]
u[:, 2] = nodes[:, 1] * nodes[:, 2]

while s.space.n_elements < MAXEL:
    before = s.space.n_elements
    t0 = time.time()
    out = s.refine_mesh_kelly([jax.numpy.asarray(u)])
    total = time.time() - t0
    u = np.asarray(out[0])
    sec = {k: round(v[0], 2) for k, v in s.timer.sections.items()
           if k in ("kelly_estimate", "refine", "setup", "transfer")}
    s.timer.reset()
    row = {"cells_before": before, "cells_after": s.space.n_elements,
           "dofs": s.space.n_dofs(4), "total_s": round(total, 1),
           "sections_s": sec,
           "mg_levels": len(getattr(s, "_mg_ops", []) or [])}
    rows.append(row)
    print(json.dumps(row), flush=True)
    if s.space.n_elements == before:
        break

with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                       "adapt_cost.json"), "w") as fh:
    json.dump(rows, fh, indent=1)
