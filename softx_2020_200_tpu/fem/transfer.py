"""Solution transfer between forest meshes (SolutionTransfer equivalent).

The reference carries the present solution AND the BDF history across
every mesh adaptation via deal.II's ``SolutionTransfer`` (SURVEY.md §2.2,
hard part #4).  Here: every node of the NEW space has a known position in
its base cell's reference coordinates; walking the OLD forest down to the
containing old leaf gives (old element, local reference coords); the old
FE field is then evaluated there.  Interpolation is exact for fields in
the FE space (refinement) and is the standard injection for coarsening.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _new_node_base_positions(space, forest, elem_of):
    """For each new global node: (base_cell, ref position in base cell).

    Uses one owning element per node (continuity makes any choice valid).
    """
    order = forest.all_leaves()
    basis = space.basis
    N = space.n_nodes
    base_cell = np.full(N, -1, dtype=np.int64)
    base_pos = np.zeros((N, space.dim))
    for i, (b, leaf) in enumerate(order):
        lvl = leaf[0]
        h = 1.0 / (1 << lvl)
        lo = np.array(leaf[1:], dtype=np.float64) * h
        ref = lo[None, :] + basis.nodes * h            # [nn, d] in base ref
        gids = space.elem_nodes[i]
        newmask = base_cell[gids] < 0
        base_cell[gids[newmask]] = b
        base_pos[gids[newmask]] = ref[newmask]
    return base_cell, base_pos


def locate_in_forest(base_cell, base_pos, forest, elem_of, dim):
    """Walk a forest down to the leaf containing each (base cell,
    base-ref position); returns (elem [N], ref_in_leaf [N, dim])."""
    N = base_cell.shape[0]
    elem = np.zeros(N, dtype=np.int64)
    ref = np.zeros((N, dim))
    for nid in range(N):
        b = int(base_cell[nid])
        pos = base_pos[nid]
        leaf = (0,) + (0,) * dim
        while leaf not in forest.leaves[b]:
            lvl, idx = leaf[0], leaf[1:]
            h = 1.0 / (1 << lvl)
            child_bits = 0
            for a in range(dim):
                local = pos[a] / h - idx[a]
                if local >= 0.5:
                    child_bits |= (1 << a)
            leaf = (lvl + 1,) + tuple(
                2 * idx[a] + ((child_bits >> a) & 1) for a in range(dim))
            if leaf[0] > 30:
                raise RuntimeError("forest walk failed")
        elem[nid] = elem_of[(b, leaf)]
        lvl, idx = leaf[0], leaf[1:]
        h = 1.0 / (1 << lvl)
        ref[nid] = np.clip(
            (pos - np.array(idx, dtype=np.float64) * h) / h, 0.0, 1.0)
    return elem, ref


def transfer_solution(old_space, old_forest, old_elem_of,
                      new_space, new_forest, new_elem_of, fields):
    """Interpolate [N_old, c] fields onto the new space: list -> list."""
    dim = new_space.dim
    base_cell, base_pos = _new_node_base_positions(
        new_space, new_forest, new_elem_of)
    old_elem, ref_in_old = locate_in_forest(
        base_cell, base_pos, old_forest, old_elem_of, dim)

    # evaluate the old basis at each node's reference coords
    Bpt, _, _ = old_space.basis.tabulate(ref_in_old)       # [N, nn_old]
    conn = old_space.elem_nodes[old_elem]                  # [N, nn_old]
    out = []
    for f in fields:
        f = np.asarray(f)
        vals = np.einsum("nk,nkc->nc", Bpt, f[conn])
        out.append(jnp.asarray(vals))
    return out
