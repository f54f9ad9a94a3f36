"""cProfile ONE refine_mesh_kelly cycle at ~200k->700k cells: names the
host functions behind the section costs docs/adapt_profile_r5.log
measured at 2M cells (transfer 514 s, setup 416 s, refine 178 s,
kelly 150 s — contended).  Usage:

    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/profile_adapt_cprof.py
"""

import cProfile
import io
import os
import pstats
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

# same deck as profile_adapt.py (inlined: that module runs its ladder at
# import time)
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "profile_adapt.py")) as fh:
    _src = fh.read()
DECK = _src.split('DECK = f"""', 1)[1].split('"""', 1)[0].format(
    MAXEL=3_000_000, REF=4)

PROFILE_AT = int(os.environ.get("CPROF_AT", "150000"))

prm = SimulationParameters.from_text(DECK, dim=3)
s = GLSNavierStokesSolver(prm)

nodes = np.asarray(s.space.nodes)
u = np.zeros((s.space.n_nodes, 4), dtype=np.float32)
u[:, 0] = np.sin(3 * nodes[:, 0]) * np.cos(2 * nodes[:, 1])
u[:, 1] = np.cos(5 * nodes[:, 2]) * nodes[:, 0]
u[:, 2] = nodes[:, 1] * nodes[:, 2]

while s.space.n_elements < PROFILE_AT:
    u = np.asarray(s.refine_mesh_kelly([jax.numpy.asarray(u)])[0])
    print("cells:", s.space.n_elements, flush=True)

print("profiling the next cycle from", s.space.n_elements, flush=True)
pr = cProfile.Profile()
pr.enable()
out = s.refine_mesh_kelly([jax.numpy.asarray(u)])
pr.disable()
print("cells after:", s.space.n_elements, flush=True)

buf = io.StringIO()
ps = pstats.Stats(pr, stream=buf).sort_stats("cumulative")
ps.print_stats(45)
print(buf.getvalue())
