"""Kelly error estimator (KellyErrorEstimator equivalent — SURVEY.md
§2.2 refine_mesh_kelly, §2.5).

Per-cell indicator from the jump of the normal gradient of the chosen
variable (velocity magnitude-wise sum or pressure) across interior faces:

    eta_K^2 = sum_{F in faces(K)} (h_F / 24) * int_F [d u / d n]^2 ds

Face pairs are precomputed host-side from the built mesh.  Rotated
adjacency (O-ring seams, gmsh meshes) is handled by matching the two
sides' physical quadrature points; 2:1 NON-conforming interfaces
contribute too (deal.II's Kelly integrates them from the fine side,
evaluating the coarse gradient at mapped reference points).
Evaluation is batched NumPy per static-shape group (see
kelly_estimate's docstring for why it is host-side on purpose).
"""

from __future__ import annotations

import numpy as np

from ..fem.geometry import det_and_inv, face_measure_and_normal


def conforming_face_pairs(space):
    """[(elem+, face+, elem-, face-)] for interior conforming faces
    (vectorized: sorted-corner face keys + one np.unique)."""
    mesh = space.mesh
    d = space.dim
    nc = 2 ** d
    from ..fem.basis import _lex_indices
    corner_ij = _lex_indices(2, d)
    nf = 2 * d
    keys = np.zeros((mesh.n_cells, nf, 2 ** (d - 1)), np.int64)
    for f in range(nf):
        axis, side = divmod(f, 2)
        sel = [i for i in range(nc)
               if corner_ij[i, axis] == (1 if side else 0)]
        keys[:, f, :] = np.sort(mesh.cells[:, sel], axis=1)
    flat = keys.reshape(mesh.n_cells * nf, -1)
    uniq, inv, counts = np.unique(flat, axis=0, return_inverse=True,
                                  return_counts=True)
    order = np.argsort(inv, kind="stable")
    starts = np.cumsum(counts) - counts
    two = counts == 2
    i1 = order[starts[two]]
    i2 = order[starts[two] + 1]
    pairs = np.stack([i1 // nf, i1 % nf, i2 // nf, i2 % nf], axis=1)
    return [tuple(int(v) for v in row) for row in pairs]


def _face_quad_perms(space, pairs, fp, fm, n_q1d):
    """Per-pair permutation matching the minus side's face quadrature
    points to the plus side's, by physical position (host numpy).
    Handles rotated/flipped tangent frames between the two cells."""
    fpts_p, _, Bp, _, _ = space.basis.face_quadrature(int(fp), n_q1d)
    fpts_m, _, Bm, _, _ = space.basis.face_quadrature(int(fm), n_q1d)
    xe = space.element_coords()
    xp = np.einsum("qn,fnd->fqd", Bp, xe[pairs[:, 0]])
    xm = np.einsum("qn,fnd->fqd", Bm, xe[pairs[:, 2]])
    nq = xp.shape[1]
    # vectorized over all pairs (a per-pair loop is the host hotspot of
    # the estimator at large E)
    d2 = np.linalg.norm(xp[:, :, None, :] - xm[:, None, :, :], axis=-1)
    perm = np.argmin(d2, axis=2)                         # [F, nq]
    scale = np.maximum(np.abs(xp).reshape(len(pairs), -1).max(axis=1),
                       1.0)
    best = np.take_along_axis(d2, perm[:, :, None], axis=2)[:, :, 0]
    bad = (best.max(axis=1) > 1e-8 * scale) \
        | (np.sort(perm, axis=1) != np.arange(nq)[None, :]).any(axis=1)
    if bad.any():
        raise ValueError(
            "conforming face quadrature points do not match "
            f"(pair {pairs[np.argmax(bad)]})")
    return perm


def kelly_estimate(op, u, variable: str = "velocity",
                   pairs=None, nc_faces=None) -> np.ndarray:
    """Per-element eta_K (host numpy array [E]).

    Pure NumPy by design: the estimator runs once per adaptation with
    shapes that change every cycle, so a jnp version recompiles ~36+
    face-group programs per cycle — through the TPU relay that compile
    bill (not the flops) dominated the flagship's 1065 s adapt step.
    One [N, c] device->host transfer, then host einsums.
    """
    space = op.space
    d = op.dim
    if pairs is None:
        pairs = conforming_face_pairs(space)
    eta2 = np.zeros(space.n_elements)
    comp = slice(0, d) if variable == "velocity" else slice(d, d + 1)
    n_q1d = space.degree + 1

    u_np = np.asarray(u, np.float64)
    xe_np = np.asarray(op.xe, np.float64)
    en_np = np.asarray(op.elem_nodes)

    def side_grad(elems, G_):
        xe = xe_np[elems]
        ue = u_np[en_np[elems]][..., comp]
        J = np.einsum("fni,qnj->fqij", xe, G_)
        detJ, Jinv = det_and_inv(J, xp=np)
        du = np.einsum("qna,fnc->fqca", G_, ue)
        grad = np.einsum("fqca,fqai->fqci", du, Jinv)
        return grad, J

    def side_grad_at(elems, G_pts):
        """Gradient at PER-FACE tabulated points G_pts [F, q, nn, d]."""
        xe = xe_np[elems]
        ue = u_np[en_np[elems]][..., comp]
        J = np.einsum("fni,fqnj->fqij", xe, G_pts)
        detJ, Jinv = det_and_inv(J, xp=np)
        du = np.einsum("fqna,fnc->fqca", G_pts, ue)
        return np.einsum("fqca,fqai->fqci", du, Jinv)

    if len(pairs):
        pairs_a = np.asarray(pairs, dtype=np.int64)
        # group by (face+, face-) so tabulations are static per group
        for fp in np.unique(pairs_a[:, 1]):
            for fm in np.unique(pairs_a[:, 3]):
                sel = pairs_a[(pairs_a[:, 1] == fp)
                              & (pairs_a[:, 3] == fm)]
                if sel.size == 0:
                    continue
                ep, em = sel[:, 0], sel[:, 2]
                _, fw, Bp, Gp, _ = space.basis.face_quadrature(
                    int(fp), n_q1d)
                _, _, Bm, Gm, _ = space.basis.face_quadrature(
                    int(fm), n_q1d)
                qperm = _face_quad_perms(space, sel, fp, fm, n_q1d)

                gp_, Jp = side_grad(ep, Gp)
                gm_, _ = side_grad(em, Gm)
                # reorder the minus side onto the plus side's points
                gm_ = np.take_along_axis(
                    gm_, qperm[:, :, None, None], axis=1)
                meas, nrm = face_measure_and_normal(Jp, int(fp), xp=np)
                jump = np.einsum("fqci,fqi->fqc", gp_ - gm_, nrm)
                face_int = np.einsum("fqc,fq,q->f", jump * jump,
                                     meas, fw)
                area = np.einsum("fq,q->f", meas, fw)
                h_f = area if d == 2 else np.sqrt(area)
                contrib = (h_f / 24.0) * face_int
                np.add.at(eta2, ep, contrib)
                np.add.at(eta2, em, contrib)

    # ---- 2:1 non-conforming interfaces: integrate from the fine side,
    # evaluating the coarse gradient at mapped reference points --------
    if nc_faces:
        groups: dict[tuple, list] = {}
        for f in nc_faces:
            groups.setdefault(
                (f.fine_face, f.coarse_face, f.tmap), []).append(f)
        for (ff, cf, tmap), fl in groups.items():
            fpts_f, fw, Bf, Gf, _ = space.basis.face_quadrature(
                int(ff), n_q1d)
            # coarse-cell reference coordinates of the fine face's
            # quadrature points
            ref_c = np.zeros_like(fpts_f)                  # [q, d]
            axis_f = ff // 2
            axis_c, side_c = divmod(int(cf), 2)
            ref_c[:, axis_c] = 1.0 if side_c else 0.0
            t_i = 0
            for a in range(d):
                if a == axis_f:
                    continue
                a2, flip, bit = tmap[t_i]
                x = fpts_f[:, a]
                x2 = 1.0 - x if flip else x
                ref_c[:, a2] = (bit + x2) / 2.0
                t_i += 1
            _, Gc, _ = space.basis.tabulate(ref_c)         # [q, nn, d]
            ef = np.array([f.fine_elem for f in fl])
            ec = np.array([f.coarse_elem for f in fl])
            Gc_ = np.broadcast_to(Gc, (len(fl),) + Gc.shape)
            gf_, Jf = side_grad(ef, Gf)
            gc_ = side_grad_at(ec, Gc_)
            meas, nrm = face_measure_and_normal(Jf, int(ff), xp=np)
            jump = np.einsum("fqci,fqi->fqc", gf_ - gc_, nrm)
            face_int = np.einsum("fqc,fq,q->f", jump * jump, meas, fw)
            area = np.einsum("fq,q->f", meas, fw)
            h_f = area if d == 2 else np.sqrt(area)
            contrib = (h_f / 24.0) * face_int
            np.add.at(eta2, ef, contrib)
            np.add.at(eta2, ec, contrib)
    return np.sqrt(eta2)


def flag_cells(eta: np.ndarray, *, fraction_type: str = "number",
               refine_fraction: float = 0.1,
               coarsen_fraction: float = 0.05):
    """deal.II refine_and_coarsen_fixed_{number,fraction} equivalent.

    Returns (refine_mask, coarsen_mask) over elements.
    """
    E = eta.shape[0]
    order = np.argsort(eta)
    refine = np.zeros(E, dtype=bool)
    coarsen = np.zeros(E, dtype=bool)
    if fraction_type == "number":
        n_ref = int(np.round(refine_fraction * E))
        n_coa = int(np.round(coarsen_fraction * E))
        if n_ref:
            refine[order[-n_ref:]] = True
        if n_coa:
            coarsen[order[:n_coa]] = True
    else:   # 'fraction' of the total error
        total = float((eta ** 2).sum())
        if total > 0:
            desc = order[::-1]
            csum = np.cumsum(eta[desc] ** 2)
            k = int(np.searchsorted(csum, refine_fraction * total)) + 1
            refine[desc[:k]] = True
            asc_csum = np.cumsum(eta[order] ** 2)
            k2 = int(np.searchsorted(asc_csum, coarsen_fraction * total))
            coarsen[order[:k2]] = True
    return refine, coarsen
