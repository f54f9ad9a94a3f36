"""Post-processing: forces, torques, kinetic energy, enstrophy, derived
fields (vorticity, Q-criterion).

Rebuild of the reference's ``calculate_forces`` / ``calculate_torques`` /
``calculate_average_KE`` / ``calculate_average_enstrophy`` and the
``DataPostprocessor`` derived fields (SURVEY.md §2.2): boundary integrals
of the fluid stress sigma = -p I + nu (grad u + grad u^T) over tagged
faces, volume quadrature reductions, and nodal-averaged derived fields —
all batched jnp, traceable under jit.

Sign convention: returned forces/torques are those exerted BY the fluid
ON the boundary, i.e. integral of sigma . (-n) with n the fluid-domain
outward normal (drag on an obstacle comes out positive in the flow
direction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.geometry import det_and_inv, face_measure_and_normal
from ..ops.operators import gather_elements, scatter_add_elements


def _face_quantities(op, u, elems, local_face, n_q1d=None):
    """Values/gradients/geometry at the quad points of one local-face
    group of boundary faces.  Returns (uq, gradq, meas, normal, wts, xq).
    """
    space = op.space
    n_q1d = n_q1d or (space.degree + 1)
    fpts, fwts, B, G, H = space.basis.face_quadrature(int(local_face), n_q1d)
    B = jnp.asarray(B, op.dtype)
    G = jnp.asarray(G, op.dtype)
    w = jnp.asarray(fwts, op.dtype)

    xe = op.xe[elems]                              # [F, nn, d]
    ue = gather_elements(u, op.elem_nodes[elems])  # [F, nn, c]
    J = jnp.einsum("fni,qnj->fqij", xe, G)
    detJ, Jinv = det_and_inv(J)
    meas, normal = face_measure_and_normal(J, int(local_face))
    uq = jnp.einsum("qn,fnc->fqc", B, ue)
    du_dxi = jnp.einsum("qna,fnc->fqca", G, ue)
    gradq = jnp.einsum("fqca,fqai->fqci", du_dxi, Jinv)
    xq = jnp.einsum("qn,fnd->fqd", B, xe)
    return uq, gradq, meas, normal, w, xq


def forces_on_boundary(op, u, boundary_faces: np.ndarray):
    """Net force [d] exerted by the fluid on one boundary.

    boundary_faces: [(elem, local_face)] host array for one boundary id.
    """
    d = op.dim
    total = jnp.zeros(d, dtype=op.dtype)
    for lf in np.unique(boundary_faces[:, 1]):
        sel = boundary_faces[boundary_faces[:, 1] == lf][:, 0]
        uq, gq, meas, n, w, _ = _face_quantities(op, u, sel, int(lf))
        p = uq[..., d]
        gv = gq[..., :d, :]
        sym = gv + jnp.swapaxes(gv, -1, -2)
        traction = (-p[..., None] * n
                    + op.nu * jnp.einsum("fqij,fqj->fqi", sym, n))
        # force on the wall = - integral of traction (see module docstring)
        total = total - jnp.einsum("fqi,fq,q->i", traction, meas, w)
    return total


def torques_on_boundary(op, u, boundary_faces: np.ndarray, center):
    """Net torque about ``center`` exerted by the fluid on one boundary.
    2D: scalar z-torque; 3D: vector [3]."""
    d = op.dim
    out = jnp.zeros(1 if d == 2 else 3, dtype=op.dtype)
    center = jnp.asarray(center, dtype=op.dtype)
    for lf in np.unique(boundary_faces[:, 1]):
        sel = boundary_faces[boundary_faces[:, 1] == lf][:, 0]
        uq, gq, meas, n, w, xq = _face_quantities(op, u, sel, int(lf))
        p = uq[..., d]
        gv = gq[..., :d, :]
        sym = gv + jnp.swapaxes(gv, -1, -2)
        traction = (-p[..., None] * n
                    + op.nu * jnp.einsum("fqij,fqj->fqi", sym, n))
        r = xq - center
        if d == 2:
            tz = r[..., 0] * traction[..., 1] - r[..., 1] * traction[..., 0]
            out = out - jnp.einsum("fq,fq,q->", tz, meas, w)[None]
        else:
            tq = jnp.cross(r, traction)
            out = out - jnp.einsum("fqi,fq,q->i", tq, meas, w)
    return out


# --------------------------------------------------------------------------
# grad-div (Taylor-Hood) variants: velocity and pressure live in two
# different spaces, so the face/volume integrals tabulate both bases at
# the velocity space's quadrature points (exact — no interpolation of
# the pressure onto velocity nodes)
# --------------------------------------------------------------------------

def _gd_face_traction(gdop, x, elems, local_face, n_q1d=None):
    """(traction, meas, wts, xq) at face quad points for the GD mixed
    state x (flat [Nv*d + Np])."""
    d = gdop.dim
    sv, sp = gdop.space_v, gdop.space_p
    n_q1d = n_q1d or (sv.degree + 1)
    fpts, fwts, Bv, Gv, _ = sv.basis.face_quadrature(int(local_face), n_q1d)
    Bp, _, _ = sp.basis.tabulate(fpts)
    Bv = jnp.asarray(Bv, gdop.dtype)
    Gv = jnp.asarray(Gv, gdop.dtype)
    Bp = jnp.asarray(Bp, gdop.dtype)
    w = jnp.asarray(fwts, gdop.dtype)

    v, p = gdop.split(x)
    xe = gdop.xe[elems]
    ve = gather_elements(v, gdop.conn_v[elems])
    pe = p[gdop.conn_p[elems]]
    J = jnp.einsum("fni,qnj->fqij", xe, Gv)
    _, Jinv = det_and_inv(J)
    meas, normal = face_measure_and_normal(J, int(local_face))
    pq = jnp.einsum("qn,fn->fq", Bp, pe)
    dv_dxi = jnp.einsum("qna,fnc->fqca", Gv, ve)
    gv = jnp.einsum("fqca,fqai->fqci", dv_dxi, Jinv)
    sym = gv + jnp.swapaxes(gv, -1, -2)
    traction = (-pq[..., None] * normal
                + gdop.nu * jnp.einsum("fqij,fqj->fqi", sym, normal))
    xq = jnp.einsum("qn,fnd->fqd", Bv, xe)
    return traction, meas, w, xq


def gd_forces_on_boundary(gdop, x, boundary_faces: np.ndarray):
    """Net force [d] the fluid exerts on one boundary (GD mixed state)."""
    d = gdop.dim
    total = jnp.zeros(d, dtype=gdop.dtype)
    for lf in np.unique(boundary_faces[:, 1]):
        sel = boundary_faces[boundary_faces[:, 1] == lf][:, 0]
        tr, meas, w, _ = _gd_face_traction(gdop, x, sel, int(lf))
        total = total - jnp.einsum("fqi,fq,q->i", tr, meas, w)
    return total


def gd_torques_on_boundary(gdop, x, boundary_faces: np.ndarray, center):
    d = gdop.dim
    out = jnp.zeros(1 if d == 2 else 3, dtype=gdop.dtype)
    center = jnp.asarray(center, dtype=gdop.dtype)
    for lf in np.unique(boundary_faces[:, 1]):
        sel = boundary_faces[boundary_faces[:, 1] == lf][:, 0]
        tr, meas, w, xq = _gd_face_traction(gdop, x, sel, int(lf))
        r = xq - center
        if d == 2:
            tz = r[..., 0] * tr[..., 1] - r[..., 1] * tr[..., 0]
            out = out - jnp.einsum("fq,fq,q->", tz, meas, w)[None]
        else:
            out = out - jnp.einsum("fqi,fq,q->i", jnp.cross(r, tr),
                                   meas, w)
    return out


def _gd_volume(gdop):
    J = jnp.einsum("eni,qnj->eqij", gdop.xe, gdop.Gv)
    detJ, Jinv = det_and_inv(J)
    return detJ * gdop.w[None, :], Jinv


def gd_kinetic_energy(gdop, x):
    v, _ = gdop.split(x)
    ve = gather_elements(v, gdop.conn_v)
    vq = jnp.einsum("qn,enc->eqc", gdop.Bv, ve)
    wdet, _ = _gd_volume(gdop)
    vol = jnp.sum(wdet)
    return 0.5 * jnp.sum(wdet * jnp.sum(vq * vq, axis=-1)) / vol


def gd_enstrophy(gdop, x):
    d = gdop.dim
    v, _ = gdop.split(x)
    ve = gather_elements(v, gdop.conn_v)
    wdet, Jinv = _gd_volume(gdop)
    dv_dxi = jnp.einsum("qna,enc->eqca", gdop.Gv, ve)
    grad = jnp.einsum("eqca,eqai->eqci", dv_dxi, Jinv)
    if d == 2:
        om = (grad[..., 1, 0] - grad[..., 0, 1])[..., None]
    else:
        om = jnp.stack([grad[..., 2, 1] - grad[..., 1, 2],
                        grad[..., 0, 2] - grad[..., 2, 0],
                        grad[..., 1, 0] - grad[..., 0, 1]], axis=-1)
    vol = jnp.sum(wdet)
    return 0.5 * jnp.sum(wdet * jnp.sum(om * om, axis=-1)) / vol


# --------------------------------------------------------------------------
# volume quantities
# --------------------------------------------------------------------------

def _volume_weights(op):
    J = jnp.einsum("eni,qnj->eqij", op.xe, op.G)
    detJ, Jinv = det_and_inv(J)
    return detJ * op.w[None, :], Jinv


# Element-chunked volume reductions.  The whole-mesh einsums materialize
# [E, nq, c, d] intermediates whose tiny minor dims XLA:TPU tile-pads
# 42-57x — at TGV-96^3 (884k elements) three such temps asked for
# 40.5 GB of 15.75 GB HBM (docs/tgv96_r5_run.log).  Chunking over
# elements bounds the live set regardless of E; partial sums come out
# per chunk.  Arrays travel as jit ARGUMENTS (closure-captured arrays
# become O(N) HLO literals — solvers/base.py:202).

_VCHUNK = 32768


def _chunk_args(u, en, xe, chunk):
    E = en.shape[0]
    nchunk = -(-E // chunk)
    pad = nchunk * chunk - E
    if pad:
        en = jnp.concatenate(
            [en, jnp.zeros((pad,) + en.shape[1:], en.dtype)])
        xe = jnp.concatenate(
            [xe, jnp.broadcast_to(xe[-1:], (pad,) + xe.shape[1:])])
    mask = (jnp.arange(nchunk * chunk) < E).astype(u.dtype)
    return (en.reshape(nchunk, chunk, *en.shape[1:]),
            xe.reshape(nchunk, chunk, *xe.shape[1:]),
            mask.reshape(nchunk, chunk))


@jax.jit
def _ke_sums(u, en, xe, B, G, w):
    d = xe.shape[-1]

    def body(args):
        en_c, xe_c, m_c = args
        ue = u[en_c]                                   # [chunk, nn, c]
        J = jnp.einsum("eni,qnj->eqij", xe_c, G)
        detJ, _ = det_and_inv(J)
        wdet = detJ * w[None, :] * m_c[:, None]
        uq = jnp.einsum("qn,enc->eqc", B, ue)[..., :d]
        return (jnp.sum(wdet),
                jnp.sum(wdet * jnp.sum(uq * uq, axis=-1)))

    chunks = _chunk_args(u, en, xe, min(en.shape[0], _VCHUNK))
    vol, e2 = jax.lax.map(body, chunks)
    return jnp.sum(vol), jnp.sum(e2)


def kinetic_energy(op, u):
    """Domain-averaged kinetic energy (1/V) integral 1/2 |u|^2."""
    vol, e2 = _ke_sums(u, op.elem_nodes, op.xe, op.B, op.G, op.w)
    return 0.5 * e2 / vol


def _vorticity_at_quad(op, u):
    d = op.dim
    ue = gather_elements(u, op.elem_nodes)
    wdet, Jinv = _volume_weights(op)
    du_dxi = jnp.einsum("qna,enc->eqca", op.G, ue)
    grad = jnp.einsum("eqca,eqai->eqci", du_dxi, Jinv)[..., :d, :]
    if d == 2:
        om = grad[..., 1, 0] - grad[..., 0, 1]
        return om[..., None], wdet
    om = jnp.stack([
        grad[..., 2, 1] - grad[..., 1, 2],
        grad[..., 0, 2] - grad[..., 2, 0],
        grad[..., 1, 0] - grad[..., 0, 1]], axis=-1)
    return om, wdet


@jax.jit
def _grad2_sums(u, en, xe, B, G, w):
    """Chunked (vol, |grad u|^2, |omega|^2) volume sums."""
    d = xe.shape[-1]

    def body(args):
        en_c, xe_c, m_c = args
        ue = u[en_c]
        J = jnp.einsum("eni,qnj->eqij", xe_c, G)
        detJ, Jinv = det_and_inv(J)
        wdet = detJ * w[None, :] * m_c[:, None]
        du_dxi = jnp.einsum("qna,enc->eqca", G, ue)
        grad = jnp.einsum("eqca,eqai->eqci", du_dxi, Jinv)[..., :d, :]
        if d == 2:
            om2 = (grad[..., 1, 0] - grad[..., 0, 1]) ** 2
        else:
            om2 = ((grad[..., 2, 1] - grad[..., 1, 2]) ** 2
                   + (grad[..., 0, 2] - grad[..., 2, 0]) ** 2
                   + (grad[..., 1, 0] - grad[..., 0, 1]) ** 2)
        return (jnp.sum(wdet),
                jnp.sum(wdet * jnp.sum(grad * grad, axis=(-1, -2))),
                jnp.sum(wdet * om2))

    chunks = _chunk_args(u, en, xe, min(en.shape[0], _VCHUNK))
    vol, g2, o2 = jax.lax.map(body, chunks)
    return jnp.sum(vol), jnp.sum(g2), jnp.sum(o2)


def enstrophy(op, u):
    """Domain-averaged enstrophy (1/V) integral 1/2 |omega|^2."""
    vol, _, o2 = _grad2_sums(u, op.elem_nodes, op.xe, op.B, op.G, op.w)
    return 0.5 * o2 / vol


def ke_dissipation_rate(op, u):
    """(1/V) integral nu * grad u : grad u  (TGV dissipation diagnostics)."""
    vol, g2, _ = _grad2_sums(u, op.elem_nodes, op.xe, op.B, op.G, op.w)
    return op.nu * g2 / vol


# --------------------------------------------------------------------------
# derived nodal fields for output
# --------------------------------------------------------------------------

def _grad_at_nodes(op, u):
    """Velocity gradient averaged to nodes: [N, d, d]."""
    d = op.dim
    basis = op.space.basis
    Bn, Gn, _ = basis.tabulate(basis.nodes)   # tabulation AT ref nodes
    Gn = jnp.asarray(Gn, op.dtype)
    ue = gather_elements(u, op.elem_nodes)
    J = jnp.einsum("eni,qnj->eqij", op.xe, Gn)
    _, Jinv = det_and_inv(J)
    du_dxi = jnp.einsum("qna,enc->eqca", Gn, ue[..., :d])
    grad = jnp.einsum("eqca,eqai->eqci", du_dxi, Jinv)   # [E, nn, d, d]
    flat = grad.reshape(grad.shape[0], grad.shape[1], d * d)
    acc = scatter_add_elements(flat, op.elem_nodes, op.n_nodes,
                               amap=op.amap)
    acc = acc * op.inv_mult[:, None]
    return acc.reshape(op.n_nodes, d, d)


def vorticity_field(op, u):
    """Nodal vorticity: [N] (2D scalar) or [N, 3] (3D vector)."""
    g = _grad_at_nodes(op, u)
    if op.dim == 2:
        return g[:, 1, 0] - g[:, 0, 1]
    return jnp.stack([
        g[:, 2, 1] - g[:, 1, 2],
        g[:, 0, 2] - g[:, 2, 0],
        g[:, 1, 0] - g[:, 0, 1]], axis=-1)


def q_criterion_field(op, u):
    """Nodal Q-criterion: Q = 1/2 (|Omega|^2 - |S|^2)."""
    g = _grad_at_nodes(op, u)
    S = 0.5 * (g + jnp.swapaxes(g, -1, -2))
    W = 0.5 * (g - jnp.swapaxes(g, -1, -2))
    return 0.5 * (jnp.sum(W * W, axis=(-1, -2))
                  - jnp.sum(S * S, axis=(-1, -2)))
