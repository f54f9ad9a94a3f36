"""Boundary-condition application as device masks + value fields.

Rebuild of the reference's ``NSBoundaryConditions`` + deal.II
``AffineConstraints`` Dirichlet handling (SURVEY.md §2.1): instead of
constraint matrices, each Dirichlet DoF carries a boolean mask entry and
a (possibly time-dependent) value.  The residual is zeroed on masked DoFs
and the Jacobian acts as identity there (see ``GLSOperator.residual`` and
``element_matrices``), which reproduces the reference's
nonzero_constraints / zero_constraints Newton semantics.

- noslip:   velocity components masked, value 0
- function: velocity components masked, values from deck expressions
- slip:     normal component masked on axis-aligned boundaries
- periodic: handled topologically by FESpace node fusion (no runtime work)
- outlet:   natural (do-nothing)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.expressions import Expression
from ..core.parameters import BoundaryConditionsParams, BoundaryType
from ..fem.dof import FESpace
from ..fem.geometry import mapping_jacobian, face_measure_and_normal


class BoundaryHandler:
    def __init__(self, space: FESpace, bcs: BoundaryConditionsParams):
        self.space = space
        dim = space.dim
        nc = dim + 1
        N = space.n_nodes
        mask = np.zeros((N, nc), dtype=bool)
        # list of (node_indices, [Expression per velocity component])
        self.function_entries: list[tuple[np.ndarray, list[Expression]]] = []

        for bc in bcs.bcs:
            if bc.type == BoundaryType.periodic:
                continue  # fused at FESpace build
            nodes = space.boundary_nodes.get(bc.id)
            if nodes is None or nodes.size == 0:
                continue
            if bc.type in (BoundaryType.noslip, BoundaryType.function):
                mask[nodes, :dim] = True
                if bc.type == BoundaryType.function:
                    exprs = [Expression(bc.u), Expression(bc.v)]
                    if dim == 3:
                        exprs.append(Expression(bc.w))
                    self.function_entries.append((nodes, exprs))
            elif bc.type == BoundaryType.slip:
                axis = self._slip_axis(bc.id)
                mask[nodes, axis] = True
            elif bc.type == BoundaryType.outlet:
                pass
            else:
                raise ValueError(f"unhandled boundary type {bc.type}")

        self.mask_np = mask
        self.mask = jnp.asarray(mask)
        self.node_coords = jnp.asarray(space.nodes)

    # ------------------------------------------------------------------
    def _slip_axis(self, bid: int) -> int:
        """Normal axis of an axis-aligned slip boundary.

        The local-face-index heuristic alone is insufficient: a curved
        boundary (O-grid cylinder surface) can present every face on one
        local axis while the physical normals rotate — so we ALSO verify
        geometrically that each face is a level set of the inferred axis.
        """
        faces = self.space.boundary_faces.get(bid)
        if faces is None or len(faces) == 0:
            raise ValueError(f"slip bc {bid}: no faces")
        axes = {int(lf) // 2 for (_, lf) in faces}
        if len(axes) != 1:
            raise NotImplementedError(
                "slip on non-axis-aligned boundaries requires rotated "
                "constraints (not yet implemented)")
        axis = axes.pop()
        space = self.space
        basis = space.basis
        xe = space.element_coords()
        for (e, lf) in faces:
            fx = xe[int(e), basis.face_nodes(int(lf))]      # [nfn, dim]
            size = max(np.ptp(fx, axis=0).max(), 1e-30)
            if np.ptp(fx[:, axis]) > 1e-8 * size:
                raise NotImplementedError(
                    f"slip bc {bid}: boundary face is not axis-aligned "
                    f"(normal rotates away from axis {axis}); rotated "
                    "slip constraints are not yet implemented")
        return axis

    # ------------------------------------------------------------------
    def values(self, t=0.0, node_coords=None):
        """Dirichlet value field [N, c] at time t (traceable).

        ``node_coords`` lets jitted callers pass the coordinates as an
        argument instead of a closure constant (compile-size hygiene).
        """
        dim = self.space.dim
        coords = node_coords if node_coords is not None else self.node_coords
        vals = jnp.zeros((self.space.n_nodes, dim + 1),
                         dtype=coords.dtype)
        for nodes, exprs in self.function_entries:
            pts = coords[nodes]
            for c, e in enumerate(exprs):
                vals = vals.at[nodes, c].set(
                    e.spatial(pts, t).astype(vals.dtype))
        return vals

    def constrain(self, u, t=0.0, mask=None, node_coords=None):
        """Impose Dirichlet values on the solution (nonzero constraints)."""
        mask = mask if mask is not None else self.mask
        return jnp.where(mask, self.values(t, node_coords), u)
