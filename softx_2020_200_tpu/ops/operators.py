"""Element gather/scatter primitives.

The reference's ``constraints.distribute_local_to_global`` + Trilinos
``compress(add)`` (SURVEY.md §3.1 inner hot loop) become two XLA ops:
a batched gather of element-local DoFs and a scatter-add back to the
global node vector.  Both keep the whole Newton step on device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gather_elements(u, elem_nodes):
    """u[N, c], elem_nodes[E, nn] -> [E, nn, c]."""
    return u[elem_nodes]


def scatter_add_elements(r_local, elem_nodes, n_nodes: int):
    """r_local[E, nn, c] -> [N, c] with duplicate-node summation."""
    c = r_local.shape[-1]
    out = jnp.zeros((n_nodes, c), dtype=r_local.dtype)
    return out.at[elem_nodes].add(r_local)


def node_multiplicity(elem_nodes: np.ndarray, n_nodes: int) -> np.ndarray:
    """Number of elements touching each node (host-side, for RAS weights)."""
    mult = np.zeros(n_nodes, dtype=np.float64)
    np.add.at(mult, elem_nodes.reshape(-1), 1.0)
    return mult
