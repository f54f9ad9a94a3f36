"""Native meshkit (C++ host runtime) parity tests: the ctypes path must
reproduce the NumPy reference numbering exactly (the structured fast
path depends on the lexicographic ordering)."""

import numpy as np
import pytest

from softx_2020_200_tpu import native


def test_library_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of meshkit failed"


def test_dedup_matches_numpy_unique():
    rng = np.random.default_rng(0)
    base = rng.integers(0, 50, size=(200, 3))
    keys = np.concatenate([base, base[::3]], axis=0)   # duplicates
    first, inverse = native.dedup_rows(keys)
    uq, first_np, inv_np = np.unique(keys, axis=0, return_index=True,
                                     return_inverse=True)
    np.testing.assert_array_equal(inverse, inv_np)
    np.testing.assert_array_equal(keys[first], uq)


def test_morton_codes_match_python():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 2 ** 16, size=(128, 2)).astype(np.uint64)
    codes = native.morton_codes(q, bits=16)
    ref = np.zeros(128, dtype=np.uint64)
    for b in range(16):
        for d in range(2):
            ref |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << \
                np.uint64(b * 2 + d)
    np.testing.assert_array_equal(codes, ref)


def test_assembly_map_matches_python():
    from softx_2020_200_tpu.fem.mesh import hyper_cube
    from softx_2020_200_tpu.fem.dof import FESpace
    from softx_2020_200_tpu.ops import operators as ops
    m = hyper_cube(0.0, 1.0, colorize=True, dim=2).refine_uniform(3)
    sp = FESpace(m, 2)
    amap = ops.build_assembly_map(sp.elem_nodes, sp.n_nodes)
    # reconstruct with pure numpy (fallback branch) and compare sums
    import jax.numpy as jnp
    rng = np.random.default_rng(2)
    r_el = jnp.asarray(rng.standard_normal(
        (sp.n_elements, sp.basis.n_nodes, 3)))
    out_gather = ops.scatter_add_elements(r_el, jnp.asarray(sp.elem_nodes),
                                          sp.n_nodes, amap=amap)
    out_scatter = ops.scatter_add_elements(r_el, jnp.asarray(sp.elem_nodes),
                                           sp.n_nodes, amap=None)
    np.testing.assert_allclose(np.asarray(out_gather),
                               np.asarray(out_scatter), atol=1e-12)
