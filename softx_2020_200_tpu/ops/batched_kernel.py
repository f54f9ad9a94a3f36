"""Batch-minor (SoA) GLS element kernel — the TPU-fast compute path.

The straightforward vmap of the per-element kernel (solvers/gls.py) puts
the tiny tensor-product dims (nn, nq, c <= 27) in the minor axes, leaving
the 8x128 VPU lanes and the MXU almost idle.  This module evaluates the
SAME physics with the element batch E as the trailing (minor) axis:

    every contraction is  [small, small] @ [small, c*E]   (MXU-streamed)
    every physics op is elementwise over [q, E]           (full VPU lanes)

Layouts: ue[nn, c, E], xe[nn, d, E], J[q, i, j, E], fields [q, ..., E].
The gather/assembly boundary transposes between the natural [E, nn, c]
index order and this layout — two streaming transposes per application,
negligible against the kernel itself.

Element Jacobian blocks for the preconditioner come from nn*c jvp probes
of this batched kernel (each probe differentiates ALL elements at once),
instead of vmapping jacfwd element-by-element.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import numpy as np
import jax.numpy as jnp

from ..solvers.gls import StabFlags


def _det_inv_soa(J):
    """J[q, d, d, E] -> (det[q, E], Jinv[q, d, d, E]) closed-form."""
    d = J.shape[1]
    if d == 2:
        a, b = J[:, 0, 0], J[:, 0, 1]
        c, e = J[:, 1, 0], J[:, 1, 1]
        det = a * e - b * c
        i = 1.0 / det
        inv = jnp.stack([
            jnp.stack([e * i, -b * i], axis=1),
            jnp.stack([-c * i, a * i], axis=1)], axis=1)
        return det, inv
    m = J
    c00 = m[:, 1, 1] * m[:, 2, 2] - m[:, 1, 2] * m[:, 2, 1]
    c01 = m[:, 1, 2] * m[:, 2, 0] - m[:, 1, 0] * m[:, 2, 2]
    c02 = m[:, 1, 0] * m[:, 2, 1] - m[:, 1, 1] * m[:, 2, 0]
    c10 = m[:, 0, 2] * m[:, 2, 1] - m[:, 0, 1] * m[:, 2, 2]
    c11 = m[:, 0, 0] * m[:, 2, 2] - m[:, 0, 2] * m[:, 2, 0]
    c12 = m[:, 0, 1] * m[:, 2, 0] - m[:, 0, 0] * m[:, 2, 1]
    c20 = m[:, 0, 1] * m[:, 1, 2] - m[:, 0, 2] * m[:, 1, 1]
    c21 = m[:, 0, 2] * m[:, 1, 0] - m[:, 0, 0] * m[:, 1, 2]
    c22 = m[:, 0, 0] * m[:, 1, 1] - m[:, 0, 1] * m[:, 1, 0]
    det = m[:, 0, 0] * c00 + m[:, 0, 1] * c01 + m[:, 0, 2] * c02
    i = 1.0 / det
    inv = jnp.stack([
        jnp.stack([c00 * i, c10 * i, c20 * i], axis=1),
        jnp.stack([c01 * i, c11 * i, c21 * i], axis=1),
        jnp.stack([c02 * i, c12 * i, c22 * i], axis=1)], axis=1)
    return det, inv


def make_batched_kernel(*, dim: int, degree: int, B, G, H, w, nu: float,
                        stab: StabFlags, dtype):
    """Returns r(ue, xe, uprev, fq, alpha0, sdt) in SoA layout:

    ue[nn, c, E], xe[nn, d, E], uprev[nn, d, E], fq[q, d, E] ->
    r[nn, c, E].  Same physics as solvers.gls.make_element_kernel.
    """
    d = dim
    B = jnp.asarray(B, dtype)          # [q, n]
    G = jnp.asarray(G, dtype)          # [q, n, a]
    H = jnp.asarray(H, dtype)          # [q, n, a, b]
    w = jnp.asarray(w, dtype)          # [q]

    def kernel(ue, xe, uprev, fq, alpha0, sdt):
        E = ue.shape[-1]
        c = ue.shape[1]
        # geometry: J[q, i, j, E]
        J = jnp.einsum("niE,qnj->qijE", xe, G)
        detJ, Jinv = _det_inv_soa(J)                 # [q,E], [q,i,j,E]
        scale = detJ * w[:, None]                    # [q, E]

        uq = jnp.einsum("qn,ncE->qcE", B, ue)
        du_dxi = jnp.einsum("qna,ncE->qcaE", G, ue)
        grad = jnp.einsum("qcaE,qaiE->qciE", du_dxi, Jinv)
        vel = uq[:, :d]                              # [q, d, E]
        gvel = grad[:, :d]                           # [q, i, j, E]
        p = uq[:, d]                                 # [q, E]
        gp = grad[:, d]                              # [q, j, E]

        K = jnp.einsum("qaiE,qbiE->qabE", Jinv, Jinv)
        # lap_phi[q, n, E] = H[q,n,a,b] K[q,a,b,E]; lap u = lap_phi . ue
        lap_phi = jnp.einsum("qnab,qabE->qnE", H, K)
        lap = jnp.einsum("qnE,ncE->qcE", lap_phi, ue[:, :d])

        udot = alpha0 * vel + jnp.einsum("qn,ndE->qdE", B, uprev)
        conv = jnp.einsum("qijE,qjE->qiE", gvel, vel)
        r_m = udot + conv + gp - nu * lap - fq
        div = jnp.einsum("qiiE->qE", gvel)

        vol = jnp.sum(scale, axis=0)                 # [E]
        if d == 2:
            h = jnp.sqrt(4.0 * vol / math.pi) / degree
        else:
            h = jnp.cbrt(6.0 * vol / math.pi) / degree
        umag2 = jnp.sum(vel * vel, axis=1)           # [q, E]
        h2 = h * h
        tau = 1.0 / jnp.sqrt(sdt * sdt + 4.0 * umag2 / h2
                             + 9.0 * (4.0 * nu / h2) ** 2)
        if stab.frozen_tau:
            tau = jax.lax.stop_gradient(tau)

        a_v = scale[:, None] * (udot + conv - fq)            # [q, d, E]
        eye = jnp.eye(d, dtype=dtype)
        a_g = scale[:, None, None] * (
            nu * gvel - p[:, None, None] * eye[None, :, :, None])
        a_p = scale * div
        a_pg = jnp.zeros_like(gp)
        if stab.pspg:
            a_pg = a_pg + (scale * tau)[:, None] * r_m
        if stab.supg:
            a_g = a_g + (scale * tau)[:, None, None] * \
                jnp.einsum("qiE,qjE->qijE", r_m, vel)
        if stab.lsic:
            tau_l = 0.5 * jnp.sqrt(umag2) * h
            a_g = a_g + (scale * tau_l * div)[:, None, None] * \
                eye[None, :, :, None]
        a_lap = None
        if stab.gls_viscous_adjoint:
            a_lap = -(scale * tau * nu)[:, None] * r_m       # [q, d, E]

        Rv = jnp.einsum("qn,qiE->niE", B, a_v)
        ag_ref = jnp.einsum("qijE,qajE->qiaE", a_g, Jinv)
        Rv = Rv + jnp.einsum("qna,qiaE->niE", G, ag_ref)
        if a_lap is not None:
            Rv = Rv + jnp.einsum("qnE,qiE->niE", lap_phi, a_lap)
        Rp = jnp.einsum("qn,qE->nE", B, a_p)
        apg_ref = jnp.einsum("qjE,qajE->qaE", a_pg, Jinv)
        Rp = Rp + jnp.einsum("qna,qaE->nE", G, apg_ref)
        return jnp.concatenate([Rv, Rp[:, None]], axis=1)    # [n, c, E]

    return kernel


def apply_batched(kernel, ue_aos, xe_soa, uprev_aos, fq_aos, alpha0, sdt):
    """Adapter: [E, nn, c] AoS in/out around the SoA kernel."""
    ue = jnp.transpose(ue_aos, (1, 2, 0))
    up = jnp.transpose(uprev_aos, (1, 2, 0))
    fq = jnp.transpose(fq_aos, (1, 2, 0))
    r = kernel(ue, xe_soa, up, fq, alpha0, sdt)
    return jnp.transpose(r, (2, 0, 1))


def element_matrices_batched(kernel, ue_soa, xe_soa, uprev_soa, fq_soa,
                             alpha0, sdt):
    """Element Jacobian blocks via jvp probes of the batched kernel.

    Returns [E, nn*c, nn*c]: column (n0, c0) = d r / d ue[n0, c0] for all
    elements at once.  ``lax.map`` over the nn*c probes keeps one kernel
    evaluation live at a time (vmapping them would multiply the kernel's
    intermediate buffers by nn*c).
    """
    nn, c, E = ue_soa.shape
    eye = jnp.eye(nn * c, dtype=ue_soa.dtype).reshape(nn * c, nn, c)

    def jvp_col(e_k):
        tangent = e_k[..., None] * jnp.ones((1, 1, E), ue_soa.dtype)
        f = lambda u: kernel(u, xe_soa, uprev_soa, fq_soa, alpha0, sdt)
        out = jax.jvp(f, (ue_soa,), (tangent,))[1]       # [nn, c, E]
        return out.reshape(nn * c, E)

    cols = jax.lax.map(jvp_col, eye)                     # [nn*c, nn*c, E]
    return jnp.transpose(cols, (2, 1, 0))                # [E, row, col]


def node_blocks_batched(kernel, ue_soa, xe_soa, uprev_soa, fq_soa,
                        alpha0, sdt, target_chunk: int = 65536):
    """Node-diagonal Jacobian blocks only: [E, nn, c*c] (row-major
    (i, j) pairs in the last axis).

    blocks[e, n, i*c+j] = d r[n, i] / d ue[n, j] — all that block-Jacobi
    needs, at a fraction of the memory of the full element matrices.
    The element batch is processed in chunks (lax.map over E-blocks) so
    the jvp's kernel intermediates stay bounded at large E.

    Layout note: the output keeps nn*c*c flattened in the MINOR axes (a
    [E, nn, c, c] result tempts XLA into a (…, nn, c, c) layout whose
    8x128 tiling pads the c=4 lane dim 32x — a 20 GB copy at 2.5M
    elements).
    """
    nn, c, E = ue_soa.shape

    n_chunks = max(1, int(np.ceil(E / target_chunk)))
    Ec = int(np.ceil(E / n_chunks))
    Ep = n_chunks * Ec

    def padE(a):
        pad = Ep - a.shape[-1]
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)
        return a.reshape(a.shape[:-1] + (n_chunks, Ec))

    ue_c = jnp.moveaxis(padE(ue_soa), -2, 0)       # [K, nn, c, Ec]
    xe_c = jnp.moveaxis(padE(xe_soa), -2, 0)
    up_c = jnp.moveaxis(padE(uprev_soa), -2, 0)
    fq_c = jnp.moveaxis(padE(fq_soa), -2, 0)
    if Ep != E:
        # zero-padded geometry would make J singular: fill the padded
        # tail with copies of element 0 (results there are discarded)
        tail = jnp.broadcast_to(
            xe_soa[:, :, :1],
            (xe_soa.shape[0], xe_soa.shape[1], Ep - E))
        last = jnp.concatenate(
            [xe_soa[:, :, (n_chunks - 1) * Ec:], tail], axis=-1)
        xe_c = xe_c.at[-1].set(last)

    def chunk_blocks(args):
        ue_k, xe_k, up_k, fq_k = args

        # STATIC probe unroll: a lax.map over probes needs a dynamic
        # row gather (out[n0] with traced n0) whose combination with
        # the surrounding solver loops segfaulted the TPU runtime at
        # 2D >= 256^2; static indices also linearize once
        f = lambda u: kernel(u, xe_k, up_k, fq_k, alpha0, sdt)
        _, f_lin = jax.linearize(f, ue_k)
        cols = []
        for k in range(nn * c):
            n0, j = k // c, k % c
            # broadcast-of-small probe direction: a static-index scatter
            # times ones() is CONSTANT-FOLDED by XLA into an [nn, c, Ec]
            # literal per probe (~268 MB of executable at the 65536
            # chunk); broadcasts are never folded (diag_hlo_size.py)
            tangent = jnp.broadcast_to(
                jnp.zeros((nn, c, 1), ue_soa.dtype)
                .at[n0, j, 0].set(1.0), (nn, c, Ec))
            cols.append(f_lin(tangent)[n0])              # [c, Ec]
        blocks = jnp.stack(cols).reshape(nn, c, c, Ec)   # [n, j, i, Ec]
        blocks = jnp.transpose(blocks, (3, 0, 2, 1))     # [Ec, n, i, j]
        return blocks.reshape(Ec, nn * c * c)

    out = jax.lax.map(chunk_blocks, (ue_c, xe_c, up_c, fq_c))
    return out.reshape(Ep, nn, c * c)[:E]


def node_blocks_batched_bm(kernel, ue_soa, xe_soa, uprev_soa, fq_soa,
                           alpha0, sdt, target_chunk: int = 65536):
    """Node-diagonal Jacobian blocks, BATCH-MINOR: [c*c, nn, E] with the
    (i, j) pair row-major in the leading axis.

    Same probes as :func:`node_blocks_batched`; this layout keeps the
    element axis minor end-to-end so no [., ., c, c] tensor (whose tiny
    minor dims tile-pad up to 32x) ever materializes.
    """
    nn, c, E = ue_soa.shape

    n_chunks = max(1, int(np.ceil(E / target_chunk)))
    Ec = int(np.ceil(E / n_chunks))
    Ep = n_chunks * Ec

    def padE(a):
        pad = Ep - a.shape[-1]
        if pad:
            a = jnp.concatenate(
                [a, jnp.zeros(a.shape[:-1] + (pad,), a.dtype)], axis=-1)
        return a.reshape(a.shape[:-1] + (n_chunks, Ec))

    ue_c = jnp.moveaxis(padE(ue_soa), -2, 0)       # [K, nn, c, Ec]
    xe_c = jnp.moveaxis(padE(xe_soa), -2, 0)
    up_c = jnp.moveaxis(padE(uprev_soa), -2, 0)
    fq_c = jnp.moveaxis(padE(fq_soa), -2, 0)
    if Ep != E:
        tail = jnp.broadcast_to(
            xe_soa[:, :, :1],
            (xe_soa.shape[0], xe_soa.shape[1], Ep - E))
        last = jnp.concatenate(
            [xe_soa[:, :, (n_chunks - 1) * Ec:], tail], axis=-1)
        xe_c = xe_c.at[-1].set(last)

    def chunk_blocks(args):
        ue_k, xe_k, up_k, fq_k = args

        # static probe unroll (see node_blocks_batched for why)
        f = lambda u: kernel(u, xe_k, up_k, fq_k, alpha0, sdt)
        _, f_lin = jax.linearize(f, ue_k)
        cols_l = []
        for k in range(nn * c):
            n0, j = k // c, k % c
            # broadcast-of-small (see node_blocks_batched): never folded
            tangent = jnp.broadcast_to(
                jnp.zeros((nn, c, 1), ue_soa.dtype)
                .at[n0, j, 0].set(1.0), (nn, c, Ec))
            cols_l.append(f_lin(tangent)[n0])            # [c(i), Ec]
        cols = jnp.stack(cols_l)                         # [(n,j), i, Ec]
        blk = cols.reshape(nn, c, c, Ec)                 # [n, j, i, Ec]
        blk = jnp.transpose(blk, (2, 1, 0, 3))           # [i, j, n, Ec]
        return blk.reshape(c * c, nn, Ec)

    out = jax.lax.map(chunk_blocks, (ue_c, xe_c, up_c, fq_c))
    # [K, cc, nn, Ec] -> [cc, nn, K*Ec] -> drop padding
    out = jnp.moveaxis(out, 0, 2).reshape(c * c, nn, Ep)
    return out[:, :, :E]
