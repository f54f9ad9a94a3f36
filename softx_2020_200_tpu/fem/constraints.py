"""Hanging-node constraints for non-conforming (adaptive) meshes.

Replaces deal.II ``AffineConstraints`` hanging-node rows (SURVEY.md
§2.5): on a 2:1-balanced forest, every fine-face node that does not
coincide with a coarse node is constrained to the coarse face's basis:

    u[hanging] = sum_m w_m u[master_m]

Application is two dense index ops (TPU-friendly, tiny H):
- ``distribute(u)``     sets constrained values (before element gather);
- ``distribute_transpose(R)`` accumulates constrained-row residuals into
  the master rows and zeroes them (after scatter-add).

The Newton system then acts on the constrained subspace exactly as the
reference's condensed matrix does.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp


@dataclass
class HangingConstraints:
    ids: object        # [H] i32 (global hanging node ids)
    masters: object    # [H, M] i32
    weights: object    # [H, M] dtype

    @property
    def n(self) -> int:
        return int(self.ids.shape[0])

    def distribute(self, u):
        """u[N, c] with constrained slots overwritten by master combos."""
        if self.n == 0:
            return u
        vals = jnp.einsum("hm,hmc->hc", self.weights, u[self.masters])
        return u.at[self.ids].set(vals)

    def distribute_transpose(self, R):
        """Move constrained-row residuals onto masters; zero them."""
        if self.n == 0:
            return R
        rh = R[self.ids]                                   # [H, c]
        R = R.at[self.masters].add(
            self.weights[:, :, None] * rh[:, None, :])
        return R.at[self.ids].set(0.0)


def build_hanging_constraints(space, nc_faces, dtype=None) -> HangingConstraints:
    """Derive constraint rows from the forest's non-conforming faces."""
    basis = space.basis
    dim = space.dim
    k = space.degree
    n1d = k + 1
    pts_1d = basis.b1.points                                # [n1d]

    rows: dict[int, tuple[np.ndarray, np.ndarray]] = {}
    for f in nc_faces:
        axis = f.fine_face // 2
        taxes = [a for a in range(dim) if a != axis]
        fine_nodes_l = basis.face_nodes(f.fine_face)        # local ids
        coarse_nodes_l = basis.face_nodes(f.coarse_face)
        fine_g = space.elem_nodes[f.fine_elem, fine_nodes_l]
        coarse_g = space.elem_nodes[f.coarse_elem, coarse_nodes_l]
        coarse_set = set(int(g) for g in coarse_g)

        # lattice coords of face nodes along tangent axes
        ij = basis.node_ij
        for loc, g in zip(fine_nodes_l, fine_g):
            g = int(g)
            if g in coarse_set or g in rows:
                continue
            # position on the coarse face per fine tangent axis, mapped
            # through the (possibly rotated/flipped) face frame
            w = np.ones(len(coarse_nodes_l))
            for t_i, a in enumerate(taxes):
                a2, flip, bit = f.tmap[t_i]
                x_fine = pts_1d[ij[loc, a]]
                x2 = 1.0 - x_fine if flip else x_fine
                x_coarse = (bit + x2) / 2.0
                l1d = basis.b1.eval(np.array([x_coarse]))[0]  # [n1d]
                w = w * l1d[ij[coarse_nodes_l, a2]]
            rows[g] = (coarse_g.astype(np.int64), w)

    if not rows:
        return HangingConstraints(
            ids=jnp.zeros(0, jnp.int32),
            masters=jnp.zeros((0, 1), jnp.int32),
            weights=jnp.zeros((0, 1)))
    H = len(rows)
    M = len(next(iter(rows.values()))[0])
    ids = np.zeros(H, np.int64)
    masters = np.zeros((H, M), np.int64)
    weights = np.zeros((H, M))
    for i, (g, (mg, w)) in enumerate(sorted(rows.items())):
        ids[i] = g
        masters[i] = mg
        weights[i] = w
    return HangingConstraints(
        ids=jnp.asarray(ids.astype(np.int32)),
        masters=jnp.asarray(masters.astype(np.int32)),
        weights=jnp.asarray(weights, dtype))
