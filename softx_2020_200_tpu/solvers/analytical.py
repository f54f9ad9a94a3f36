"""Analytical solutions and L2-error computation (MMS machinery).

Rebuild of the reference's ``AnalyticalSolutions::NSAnalyticalSolution`` +
``calculate_L2_error`` (SURVEY.md §2.2): the exact (u, p) comes from deck
expressions; the L2 error is a quadrature reduce over elements, with the
pressure mean-shifted before comparison (pressure is defined up to a
constant in enclosed flows).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.expressions import VectorExpression
from ..fem.geometry import det_and_inv
from ..ops.operators import gather_elements


def l2_error(op, u, exact: VectorExpression, t=0.0):
    """Return (err_velocity, err_pressure) vs the exact expression.

    op: GLSOperator (provides tabulations/geometry); u: [N, d+1].
    """
    d = op.dim
    ue = gather_elements(u, op.elem_nodes)
    uq = jnp.einsum("qn,enc->eqc", op.B, ue)          # [E, nq, c]
    J = jnp.einsum("eni,qnj->eqij", op.xe, op.G)
    detJ, _ = det_and_inv(J)
    wdet = detJ * op.w[None, :]                        # [E, nq]

    exq = exact.spatial(op.qpts_phys, t)               # [E, nq, >=d+1]
    vol = jnp.sum(wdet)

    # velocity error
    dv = uq[..., :d] - exq[..., :d]
    err_v = jnp.sqrt(jnp.sum(wdet[..., None] * dv * dv))

    # pressure error, mean-shifted
    dp = uq[..., d] - exq[..., d]
    mean = jnp.sum(wdet * dp) / vol
    dp = dp - mean
    err_p = jnp.sqrt(jnp.sum(wdet * dp * dp))
    return err_v, err_p


def mms_source(exact: VectorExpression, nu: float, dim: int):
    """Build the MMS body force from an exact (u, p) by automatic
    differentiation:  f = du/dt + (u.grad)u + grad p - nu lap u.

    The reference requires the user to hand-derive the forcing expression
    for each manufactured solution; here jax does it exactly from the
    same deck expression.  Returns ``f(points[..., dim], t) -> [..., dim]``
    traceable under jit.
    """
    comps = exact.components

    def u_point(x, t):
        pt = x[None, :]
        return jnp.stack([comps[i].spatial(pt, t)[0] for i in range(dim)])

    def p_point(x, t):
        return comps[dim].spatial(x[None, :], t)[0]

    def f_point(x, t):
        dudt = jax.jacfwd(u_point, argnums=1)(x, t)
        gradu = jax.jacfwd(u_point, argnums=0)(x, t)        # [i, j]
        u = u_point(x, t)
        conv = gradu @ u
        gradp = jax.grad(p_point, argnums=0)(x, t)
        hess = jax.jacfwd(jax.jacfwd(u_point, argnums=0), argnums=0)(x, t)
        lap = jnp.trace(hess, axis1=1, axis2=2)
        return dudt + conv + gradp - nu * lap

    def source(points, t=0.0):
        flat = points.reshape(-1, dim)
        t_arr = jnp.asarray(t, dtype=points.dtype)
        out = jax.vmap(lambda x: f_point(x, t_arr))(flat)
        return out.reshape(points.shape[:-1] + (dim,))

    return source
