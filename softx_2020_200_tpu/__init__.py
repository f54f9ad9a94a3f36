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

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache, on by default.

    The single-core host in the target environment compiles even
    trivial eager ops in ~10 s; caching across processes cuts repeat
    CLI/test startup by an order of magnitude.  Opt out with
    ``SOFTX_NO_COMPILE_CACHE=1`` or point ``JAX_COMPILATION_CACHE_DIR``
    elsewhere (jax's own env var wins if the user set it).
    """
    if _os.environ.get("SOFTX_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
            return  # user already configured jax directly
        cache = _os.path.join(
            _os.path.expanduser("~"), ".cache", "softx_2020_200_tpu",
            "xla_cache")
        _os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()


def _set_matmul_precision():
    """f32 means f32: JAX's default TPU matmul precision feeds bf16
    inputs to the MXU, which floors the GLS element-contraction
    accuracy ~7x above true f32 (MMS golden deck: L2 velocity error
    8.3e-4 on TPU vs 1.18e-4 on the CPU path) — and the physics
    acceptance bands (Ghia / Schafer-Turek / TGV) sit exactly in that
    error range.  Default to full-f32 contractions; override with
    ``SOFTX_MATMUL_PRECISION=default|high|highest`` (jax's own env var
    wins if set)."""
    lvl = _os.environ.get("SOFTX_MATMUL_PRECISION", "highest")
    if lvl == "default":
        return
    try:
        import jax
        if _os.environ.get("JAX_DEFAULT_MATMUL_PRECISION"):
            return  # user already configured jax directly
        jax.config.update("jax_default_matmul_precision", lvl)
    except Exception:  # pragma: no cover - best-effort
        pass


_set_matmul_precision()
