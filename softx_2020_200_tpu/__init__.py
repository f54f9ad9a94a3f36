"""softx_2020_200_tpu — TPU-native incompressible Navier-Stokes framework.

A brand-new JAX/XLA/Pallas implementation with the capabilities of the
reference ``LMNS3d/SOFTX_2020_200`` (the SoftwareX-2020 snapshot of Lethe,
a deal.II/Trilinos GLS-stabilized incompressible Navier-Stokes solver).

Layer map (mirrors SURVEY.md §1, re-designed TPU-first):

- ``core``     — .prm deck parser, expression language, typed parameters,
                 simulation control, BDF/SDIRK coefficients, PVD handler.
- ``fem``      — tensor-product Lagrange bases, Gauss quadrature, meshes,
                 DoF numbering, constraints, geometric mappings.
- ``ops``      — matrix-free element operators (gather/compute/scatter),
                 Pallas kernels, Krylov solvers, preconditioners.
- ``solvers``  — the GLS Navier-Stokes solver (Newton + matrix-free GMRES),
                 analytical solutions, initial conditions, post-processing.
- ``parallel`` — slab/Morton domain decomposition over a jax device Mesh,
                 halo exchange via ppermute inside shard_map.
- ``utils``    — VTU/PVTU/PVD writers, text tables.
- ``apps``     — CLI applications (gls_navier_stokes_2d/3d, ...).
"""

__version__ = "0.1.0"
