"""Batched preconditioners for the matrix-free Newton-Krylov solves.

The reference preconditions GMRES with Ifpack ILU(k) or ML AMG
(SURVEY.md §3.3).  Neither maps to TPU; the TPU-native replacements are
built from per-element dense Jacobian blocks (``GLSOperator.
element_matrices``) and applied as batched small-dense algebra:

- ``jacobi``          — pointwise diagonal scaling.
- ``block_jacobi``    — per-node (d+1)x(d+1) blocks: couples the velocity
                        components and pressure at each node (ILU(0)-class
                        strength for equal-order GLS at low cost).
- ``additive_schwarz``— restricted additive Schwarz with per-element
                        overlapping blocks: batched LU inverses of the
                        nn*(d+1) local matrices, applied as one batched
                        matmul per GMRES iteration.  This is the strongest
                        option and the default for ilu fill >= 1 decks.

All builders/appliers are pure jnp and shard trivially (blocks are local
to elements/nodes; only the gather/scatter touch partition boundaries).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from .operators import gather_elements, scatter_add_elements


@dataclass(frozen=True)
class Preconditioner:
    apply: Callable      # v[N, c] -> M^{-1} v  [N, c]


def _invert_blocks(blocks, eye):
    """Closed-form batched inverse of [N, c, c] blocks (degenerate ->
    identity).  NEVER use jnp.linalg.inv here: its TPU LU custom call
    SEGFAULTS the TPU runtime when executed inside nested lax loops at
    large N (worker 'crashed or restarted'); the cofactor inverse in
    batch-minor layout is also faster for c <= 4."""
    from .smallmat import det_bm, inv_bm
    bm = jnp.transpose(blocks, (1, 2, 0))
    deg = jnp.abs(det_bm(bm)) < 1e-300
    bm = jnp.where(deg[None, None, :], eye[:, :, None], bm)
    return jnp.transpose(inv_bm(bm), (2, 0, 1))


def build_jacobi(A_e, elem_nodes, n_nodes: int, nn: int, nc: int,
                 bc_mask=None, amap=None) -> Preconditioner:
    """Pointwise diagonal: scatter-add local diagonals, invert."""
    E = A_e.shape[0]
    diag_local = jnp.diagonal(A_e, axis1=1, axis2=2).reshape(E, nn, nc)
    diag = scatter_add_elements(diag_local, elem_nodes, n_nodes, amap=amap)
    if bc_mask is not None:
        # constrained rows accumulated one identity per adjacent element;
        # reset to exactly 1 so the preconditioner is the identity there
        diag = jnp.where(bc_mask, 1.0, diag)
    diag = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)

    def apply(v):
        return v / diag

    return Preconditioner(apply=apply)


def build_block_jacobi(A_e, elem_nodes, n_nodes: int, nn: int, nc: int,
                       bc_mask=None, amap=None) -> Preconditioner:
    """Per-node (d+1)x(d+1) diagonal blocks, batched-inverted."""
    E = A_e.shape[0]
    A4 = A_e.reshape(E, nn, nc, nn, nc)
    blocks_local = _node_diag_blocks(A4)            # [E, nn, c, c]
    blocks = scatter_add_elements(
        blocks_local.reshape(E, nn, nc * nc), elem_nodes, n_nodes,
        amap=amap).reshape(n_nodes, nc, nc)
    if bc_mask is not None:
        # normalize constrained rows/cols to identity
        mrow = bc_mask.astype(A_e.dtype)
        keep = 1.0 - mrow
        blocks = blocks * keep[:, :, None] * keep[:, None, :]
        blocks = blocks + jnp.einsum("ni,ij->nij", mrow,
                                     jnp.eye(nc, dtype=A_e.dtype))
    # regularize empty blocks
    eye = jnp.eye(nc, dtype=A_e.dtype)
    binv = _invert_blocks(blocks, eye)

    def apply(v):
        return jnp.einsum("nij,nj->ni", binv, v)

    return Preconditioner(apply=apply)


def _node_diag_blocks(A4):
    """[E, nn, c, nn, c] -> node-diagonal blocks A4[e,n,i,n,j] = [E,nn,c,c]."""
    # jnp.diagonal over (axis1=1, axis2=3) appends the diagonal axis last:
    # [E, c, c, nn] -> transpose to [E, nn, c, c]
    return jnp.diagonal(A4, axis1=1, axis2=3).transpose(0, 3, 1, 2)


def build_additive_schwarz(A_e, elem_nodes, n_nodes: int, nn: int, nc: int,
                           inv_mult, bc_mask=None) -> Preconditioner:
    """Restricted additive Schwarz with element blocks.

    z = sum_e R_e^T W_e A_e^{+} R_e v, with W_e = diag(1/multiplicity)
    so overlapping contributions average rather than accumulate.

    Local element blocks of the steady GLS operator carry exact null
    modes (constant pressure / rigid modes of the floating local
    problem); a relative diagonal shift makes every block invertible
    while leaving the well-conditioned directions essentially exact.
    """
    nloc = A_e.shape[-1]
    dmax = jnp.max(jnp.abs(jnp.diagonal(A_e, axis1=1, axis2=2)),
                   axis=-1, keepdims=True)
    shift = 1e-3 * dmax[..., None] * jnp.eye(nloc, dtype=A_e.dtype)
    Ainv = jnp.linalg.inv(A_e + shift)              # [E, nn*c, nn*c]
    E = A_e.shape[0]

    def apply(v):
        ve = gather_elements(v, elem_nodes).reshape(E, nn * nc)
        ze = jnp.einsum("eab,eb->ea", Ainv, ve).reshape(E, nn, nc)
        ze = ze * inv_mult[elem_nodes][:, :, None]
        z = scatter_add_elements(ze, elem_nodes, n_nodes)
        if bc_mask is not None:
            z = jnp.where(bc_mask, v, z)
        return z

    return Preconditioner(apply=apply)


def build_from_node_blocks(kind: str, blocks, bc_mask) -> Preconditioner:
    """Jacobi / block-Jacobi from pre-assembled node-diagonal blocks
    [N, c, c] (the batch-minor fast path: GLSOperator.node_blocks).
    Constrained rows/cols arrive zeroed; they become identity here."""
    nc = blocks.shape[-1]
    eye = jnp.eye(nc, dtype=blocks.dtype)
    if bc_mask is not None:
        mrow = bc_mask.astype(blocks.dtype)
        blocks = blocks + jnp.einsum("ni,ij->nij", mrow, eye)
    if kind == "jacobi":
        diag = jnp.diagonal(blocks, axis1=1, axis2=2)
        diag = jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
        return Preconditioner(apply=lambda v: v / diag)
    binv = _invert_blocks(blocks, eye)
    return Preconditioner(
        apply=lambda v: jnp.einsum("nij,nj->ni", binv, v))


def node_blocks_to_state(kind: str, blocks, bc_mask):
    """Pure-array preconditioner state (for skip-Newton carrying):
    jacobi -> inverse diagonal [N, c]; block_jacobi -> block inverses
    [N, c, c]."""
    nc = blocks.shape[-1]
    eye = jnp.eye(nc, dtype=blocks.dtype)
    if bc_mask is not None:
        blocks = blocks + jnp.einsum(
            "ni,ij->nij", bc_mask.astype(blocks.dtype), eye)
    if kind == "jacobi":
        diag = jnp.diagonal(blocks, axis1=1, axis2=2)
        return 1.0 / jnp.where(jnp.abs(diag) > 1e-300, diag, 1.0)
    return _invert_blocks(blocks, eye)


def apply_node_block_state(state, v):
    if state.ndim == 2:           # jacobi inverse diagonal
        return v * state
    return jnp.einsum("nij,nj->ni", state, v)


def build_preconditioner(kind: str, A_e, elem_nodes, n_nodes, nn, nc,
                         inv_mult=None, bc_mask=None,
                         amap=None) -> Preconditioner:
    if kind == "jacobi":
        return build_jacobi(A_e, elem_nodes, n_nodes, nn, nc, bc_mask,
                            amap=amap)
    if kind == "block_jacobi":
        return build_block_jacobi(A_e, elem_nodes, n_nodes, nn, nc, bc_mask,
                                  amap=amap)
    if kind == "additive_schwarz":
        return build_additive_schwarz(A_e, elem_nodes, n_nodes, nn, nc,
                                      inv_mult, bc_mask)
    if kind in ("none", "identity"):
        return Preconditioner(apply=lambda v: v)
    raise ValueError(f"unknown preconditioner {kind!r}")
