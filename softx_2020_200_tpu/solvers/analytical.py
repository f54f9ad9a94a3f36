"""Analytical solutions and L2-error computation (MMS machinery).

Rebuild of the reference's ``AnalyticalSolutions::NSAnalyticalSolution`` +
``calculate_L2_error`` (SURVEY.md §2.2): the exact (u, p) comes from deck
expressions; the L2 error is a quadrature reduce over elements, with the
pressure mean-shifted before comparison (pressure is defined up to a
constant in enclosed flows).
"""

from __future__ import annotations

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
