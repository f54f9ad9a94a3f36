"""Affine-lattice MXU kernel (ops/pallas_lattice.py) vs the XLA path.

The lattice kernel folds the (globally constant) element geometry of
generator lattices into constant interpolation/projection matrices and
runs them as MXU matmuls.  It must reproduce the batched XLA kernel at
machine precision: primal residual (full tau), frozen-tau tangent, and
the node-block probes (which match the frozen-tau convention of
PallasGLS, not the exact-tau jvp of GLSOperator.node_blocks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
from softx_2020_200_tpu.fem.dof import FESpace
from softx_2020_200_tpu.solvers.gls import GLSOperator, StabFlags
from softx_2020_200_tpu.ops.pallas_lattice import PallasLatticeGLS


def _setup(dim, degree, n, dtype=jnp.float64, state_dtype=None):
    mesh = subdivided_hyper_rectangle([0.0] * dim, [1.0] * dim, n,
                                      colorize=True, dim=dim)
    space = FESpace(mesh, degree)
    op = GLSOperator(space, nu=0.1, dtype=dtype)
    op.enable_pallas(interpret=True, structured=True,
                     state_dtype=state_dtype)
    assert isinstance(op._pallas, PallasLatticeGLS)
    rng = np.random.default_rng(11)
    N, c, E = space.n_nodes, dim + 1, space.n_elements
    u = jnp.asarray(rng.standard_normal((N, c)) * 0.2, dtype)
    v = jnp.asarray(rng.standard_normal((N, c)), dtype)
    prev = jnp.asarray(rng.standard_normal((N, dim)) * 0.1, dtype)
    fq = jnp.asarray(rng.standard_normal((E, op.n_q, dim)), dtype)
    return space, op, u, v, prev, fq


@pytest.mark.parametrize("dim,degree,n", [
    (2, 1, 4),
    pytest.param(2, 2, 2, marks=pytest.mark.slow),
    pytest.param(3, 1, 2, marks=pytest.mark.slow),
    pytest.param(3, 2, 2, marks=pytest.mark.slow),
])
def test_lattice_matches_xla(dim, degree, n):
    space, op, u, v, prev, fq = _setup(dim, degree, n)
    op_ref = GLSOperator(space, nu=0.1, dtype=jnp.float64)
    op_fr = GLSOperator(space, nu=0.1,
                        stab=StabFlags(frozen_tau=True),
                        dtype=jnp.float64)
    C = op.consts()
    r_ref = op_ref.residual_free(u, prev, fq, 1.0, 2.0)
    r_lat = op.residual_free(u, prev, fq, 1.0, 2.0, C=C)
    scale = float(jnp.abs(r_ref).max())
    assert float(jnp.abs(r_lat - r_ref).max()) / scale < 1e-12

    f_ref = lambda w: op_fr.residual_free(w, prev, fq, 1.0, 2.0)
    f_lat = lambda w: op.residual_free(w, prev, fq, 1.0, 2.0, C=C)
    d_ref = jax.jvp(f_ref, (u,), (v,))[1]
    d_lat = jax.jvp(f_lat, (u,), (v,))[1]
    scale = float(jnp.abs(d_ref).max())
    assert float(jnp.abs(d_lat - d_ref).max()) / scale < 1e-12


def test_lattice_rejects_nonuniform():
    """Non-translate element batches must raise (enable_pallas catches
    the ValueError and falls back to PallasGLS; in practice
    StructuredLayout already rejects graded lattices upstream, so the
    guard is belt-and-braces)."""
    mesh = subdivided_hyper_rectangle([0.0, 0.0], [1.0, 1.0], 4,
                                      colorize=True, dim=2)
    space = FESpace(mesh, 1)
    xe = space.element_coords().copy()
    xe[3] *= 1.5                       # one element is no translate
    with pytest.raises(ValueError):
        PallasLatticeGLS(space, 0.1, xe, interpret=True)


@pytest.mark.slow
def test_lattice_node_blocks_match_pallas_gls():
    """Lattice probes == row-layout PallasGLS probes (frozen tau)."""
    from softx_2020_200_tpu.ops.pallas_gls import PallasGLS
    from softx_2020_200_tpu.ops.operators import gather_elements
    dim, degree, n = 3, 1, 2
    space, op, u, v, prev, fq = _setup(dim, degree, n)
    pg = op._pallas
    sl = op._structured
    nn, nc, nq = op.nn, op.nc, op.n_q
    C = op.consts()
    E = space.n_elements
    ue2 = pg.rows_from_list(sl.gather_rows_list(u), (nn, nc))
    up2 = pg.rows_from_list(sl.gather_rows_list(prev), (nn, dim))
    fqg = fq[C["sl_perm"]]
    fq2 = pg.rows_from_list(
        [fqg[:, q, i] for q in range(nq) for i in range(dim)], (nq, dim))
    br = pg.node_block_rows(ue2, up2, fq2, 1.0, 2.0)[:, :, :E]

    perm = np.asarray(C["sl_perm"])
    en = jnp.asarray(np.asarray(space.elem_nodes)[perm])
    pgg = PallasGLS(space, nu=0.1, dtype=jnp.float64, interpret=True,
                    elem_coords=space.element_coords()[perm])
    bo = pgg.node_block_rows(
        pgg.to_rows(gather_elements(u, en)),
        pgg.to_rows(gather_elements(prev, en)),
        pgg.to_rows(fq[perm]), 1.0, 2.0)
    bo = bo.reshape(nn, nc * nc, pgg.Ep)[:, :, :E]
    scale = float(jnp.abs(bo).max())
    assert float(jnp.abs(br - bo).max()) / scale < 1e-12


def test_lattice_all_bf16_build():
    """All-bf16 operand build (the roofline's lever-2 measurement):
    refs and T-tables in bf16, f32 MXU accumulate inside the kernel.
    Mosaic requires a 32-bit matmul acc, so the kernel must request
    preferred_element_type=f32 and DEFAULT precision for bf16 dots —
    this build previously failed to lower ('Expected matmul acc to be
    32-bit').  Parity vs f32 at bf16 operand rounding."""
    dim, degree, n = 2, 1, 4
    space, op16, u, v, prev, fq = _setup(dim, degree, n,
                                         dtype=jnp.bfloat16)
    op32 = GLSOperator(space, nu=0.1, dtype=jnp.float32)
    op32.enable_pallas(interpret=True, structured=True)
    C16, C32 = op16.consts(), op32.consts()
    u32, v32 = u.astype(jnp.float32), v.astype(jnp.float32)
    prev32, fq32 = prev.astype(jnp.float32), fq.astype(jnp.float32)

    r16 = op16.residual_free(u, prev, fq, 1.0, 2.0, C=C16)
    r32 = op32.residual_free(u32, prev32, fq32, 1.0, 2.0, C=C32)
    scale = float(jnp.abs(r32).max())
    rel = float(jnp.abs(r16.astype(jnp.float32) - r32).max()) / scale
    assert rel < 3e-2, rel

    f16 = lambda w: op16.residual_free(w, prev, fq, 1.0, 2.0, C=C16)
    f32f = lambda w: op32.residual_free(w, prev32, fq32, 1.0, 2.0,
                                        C=C32)
    d16 = jax.jvp(f16, (u,), (v,))[1]
    d32 = jax.jvp(f32f, (u32,), (v32,))[1]
    scale = float(jnp.abs(d32).max())
    rel = float(jnp.abs(d16.astype(jnp.float32) - d32).max()) / scale
    assert rel < 3e-2, rel


@pytest.mark.slow
def test_lattice_bf16_state_tangent():
    """bf16 Jacobian-state: primal bitwise-identical, tangent within
    bf16 coefficient rounding (mirrors test_pallas_tangent_bf16_state
    for the lattice kernel; on TPU this ALSO flips the tangent dots to
    the MXU's native bf16-input rate — same rounding class)."""
    dim, degree, n = 2, 1, 4
    space, op32, u, v, prev, fq = _setup(dim, degree, n,
                                         dtype=jnp.float32)
    op16 = GLSOperator(space, nu=0.1, dtype=jnp.float32)
    op16.enable_pallas(interpret=True, structured=True,
                       state_dtype=jnp.bfloat16)
    C32, C16 = op32.consts(), op16.consts()
    u, v = u.astype(jnp.float32), v.astype(jnp.float32)
    prev, fq = prev.astype(jnp.float32), fq.astype(jnp.float32)

    r32 = op32.residual_free(u, prev, fq, 1.0, 2.0, C=C32)
    r16 = op16.residual_free(u, prev, fq, 1.0, 2.0, C=C16)
    np.testing.assert_array_equal(np.asarray(r32), np.asarray(r16))

    f32 = lambda w: op32.residual_free(w, prev, fq, 1.0, 2.0, C=C32)
    f16 = lambda w: op16.residual_free(w, prev, fq, 1.0, 2.0, C=C16)
    d32 = jax.jvp(f32, (u,), (v,))[1]
    d16 = jax.jvp(f16, (u,), (v,))[1]
    scale = float(jnp.abs(d32).max())
    rel = float(jnp.abs(d16 - d32).max()) / scale
    assert rel < 2e-2, rel
    assert rel > 1e-7, rel
