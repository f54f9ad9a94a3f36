"""Element gather/scatter primitives.

The reference's ``constraints.distribute_local_to_global`` + Trilinos
``compress(add)`` (SURVEY.md §3.1 inner hot loop) become pure XLA ops
that keep the whole Newton step on device.

TPU note: XLA's generic scatter-add serializes badly on TPU, so the
assembly direction is reformulated as GATHER + sum: the mesh is static,
so for every node the (element, local-node) pairs contributing to it are
precomputed once (``AssemblyMap``) and assembly becomes a dense gather of
at most ``max_multiplicity`` contributions followed by a small-axis
reduce — both TPU-fast.  The ``.at[].add`` path remains as a fallback.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


def gather_elements(u, elem_nodes):
    """u[N, c], elem_nodes[E, nn] -> [E, nn, c]."""
    return u[elem_nodes]


@dataclass(frozen=True)
class AssemblyMap:
    """Static inverse-connectivity: which (elem, local-node) slots feed
    each global node.  ``idx[N, M]`` indexes the FLATTENED [E*nn (+1)]
    contribution array; padding entries point at the trailing zero slot.
    """
    idx: object           # jnp [N, M] int32
    n_flat: int           # E*nn (the zero-pad slot is n_flat)
    max_multiplicity: int


def build_assembly_map(elem_nodes: np.ndarray, n_nodes: int,
                       exclude_node: int | None = None) -> AssemblyMap:
    """Host-side construction of the gather-based assembly map.

    ``exclude_node``: drop contributions targeting this node (used for
    the sharded layouts' trash slot, which padding elements point at).
    """
    E, nn = elem_nodes.shape
    flat_nodes = elem_nodes.reshape(-1).astype(np.int64)
    if exclude_node is not None:
        flat_nodes = np.where(flat_nodes == exclude_node, n_nodes,
                              flat_nodes)
    counts = np.bincount(flat_nodes[flat_nodes < n_nodes],
                         minlength=n_nodes)
    M = int(counts.max()) if counts.size else 0

    from ..native import assembly_map as native_amap
    nat = native_amap(elem_nodes, n_nodes,
                      exclude_node, max(M, 1), E * nn)
    if nat is not None:
        idx, used = nat
        return AssemblyMap(idx=jnp.asarray(idx.astype(np.int32)),
                           n_flat=E * nn, max_multiplicity=used)

    order = np.argsort(flat_nodes, kind="stable")
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    idx = np.full((n_nodes, M), E * nn, dtype=np.int64)  # pad -> zero slot
    for m in range(M):
        has = counts > m
        idx[has, m] = order[starts[has] + m]
    return AssemblyMap(idx=jnp.asarray(idx.astype(np.int32)),
                       n_flat=E * nn, max_multiplicity=M)


def scatter_add_elements(r_local, elem_nodes, n_nodes: int,
                         amap: AssemblyMap | None = None):
    """r_local[E, nn, c] -> [N, c] with duplicate-node summation."""
    c = r_local.shape[-1]
    if amap is not None:
        flat = r_local.reshape(-1, c)
        flat = jnp.concatenate(
            [flat, jnp.zeros((1, c), dtype=r_local.dtype)], axis=0)
        return jnp.sum(flat[amap.idx], axis=1)
    out = jnp.zeros((n_nodes, c), dtype=r_local.dtype)
    return out.at[elem_nodes].add(r_local)


def node_multiplicity(elem_nodes: np.ndarray, n_nodes: int) -> np.ndarray:
    """Number of elements touching each node (host-side, for RAS weights)."""
    mult = np.zeros(n_nodes, dtype=np.float64)
    np.add.at(mult, elem_nodes.reshape(-1), 1.0)
    return mult
