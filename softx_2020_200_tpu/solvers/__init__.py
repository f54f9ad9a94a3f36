"""Physics solvers: GLS Navier-Stokes, Newton drivers, post-processing.

TPU-native equivalent of the reference's ``include/solvers`` layer
(SURVEY.md §2.2): ``GLSNavierStokesSolver`` becomes a matrix-free batched
element kernel + jvp Jacobian + jitted Newton-Krylov; ``NavierStokesBase``
becomes the host-side engine in :mod:`.base`.
"""
