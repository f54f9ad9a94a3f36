"""CLI applications (reference L3 layer — SURVEY.md §2.3).

Each executable mirrors a reference application: one thin ``main`` that
parses a ``.prm`` deck and calls ``solve()``:

    python -m softx_2020_200_tpu.apps.gls_navier_stokes_2d case.prm

Distribution note: where the reference is launched as
``mpirun -np N ./gls_navier_stokes_2d case.prm``, the TPU build runs ONE
process per host and shards over the local device mesh automatically
(SPMD under jit) — see ``softx_2020_200_tpu.parallel``.
"""
