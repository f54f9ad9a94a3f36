"""Localize the forest-hierarchy prolongation error found by
diag_sphere_gmg.py (linear field not reproduced, err ~0.63).

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python scripts/diag_transfer.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

import jax.numpy as jnp
import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

ROOT = os.path.join(os.path.dirname(__file__), "..")
prm = SimulationParameters.from_file(
    os.path.join(ROOT, "examples", "sphere_re100.prm"), dim=3)
prm.mesh.initial_refinement = int(os.environ.get("REF", "1"))
prm.simulation_control.output_frequency = 0
prm.forces.calculate_forces = False
s = GLSNavierStokesSolver(prm)
mg = s._mg_consts
cop = s._mg_ops[1]
cn = np.asarray(cop.space.nodes)
fn = np.asarray(s.space.nodes)
coef = np.arange(1, s.dim + 1, dtype=float)

lin_c = jnp.asarray(cn @ coef + 0.5)[:, None] * jnp.ones((1, 1))
lin_f = fn @ coef + 0.5
Pv = np.asarray(jnp.einsum("fm,fmc->fc", mg[1]["weights"],
                           lin_c[mg[1]["masters"]]))[:, 0]
err = np.abs(Pv - lin_f)
print(f"prolong: max={err.max():.3e} mean={err.mean():.3e} "
      f"n>1e-8: {(err > 1e-8).sum()}/{len(err)}")
bad = np.argsort(-err)[:10]
center = np.array([5.0, 0.0, 0.0])
for i in bad:
    r = np.linalg.norm(fn[i] - center)
    print(f"  node {i} at {np.round(fn[i], 3)} r={r:.3f} err={err[i]:.3e}")

# how many bad nodes are near the sphere (curved manifold region)?
r_all = np.linalg.norm(fn - center, axis=1)
bad_mask = err > 1e-8
print(f"bad nodes with r<1.05: {(bad_mask & (r_all < 1.05)).sum()}, "
      f"1.05<=r<2.0: {(bad_mask & (r_all >= 1.05) & (r_all < 2.0)).sum()}, "
      f"r>=2.0: {(bad_mask & (r_all >= 2.0)).sum()}")

# same for the state-restriction map (coarse nodes in fine forest)
iw, im = np.asarray(mg[1]["inj_weights"]), np.asarray(mg[1]["inj_masters"])
lin_fv = jnp.asarray(lin_f)[:, None]
Rv = np.asarray(jnp.einsum("nm,nmc->nc", jnp.asarray(iw),
                           lin_fv[im]))[:, 0]
lin_cv = cn @ coef + 0.5
errR = np.abs(Rv - lin_cv)
print(f"state-inject: max={errR.max():.3e} n>1e-8: "
      f"{(errR > 1e-8).sum()}/{len(errR)}")
rc_all = np.linalg.norm(cn - center, axis=1)
badR = errR > 1e-8
print(f"bad coarse nodes r<1.05: {(badR & (rc_all < 1.05)).sum()}, "
      f"r>=2: {(badR & (rc_all >= 2.0)).sum()}")
