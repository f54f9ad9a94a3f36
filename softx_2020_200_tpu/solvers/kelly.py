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
    """int64 array [P, 4] of (elem+, face+, elem-, face-) for interior
    conforming faces (vectorized: sorted-corner face keys + one lexsort;
    a row-unique via lexsort + adjacent-diff beats np.unique(axis=0)'s
    void-dtype byte-compare sort ~5x at 10^6 faces)."""
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
    order = np.lexsort(flat.T[::-1])
    srt = flat[order]
    new = np.empty(len(srt), bool)
    new[0] = True
    np.any(srt[1:] != srt[:-1], axis=1, out=new[1:])
    group = np.cumsum(new) - 1
    counts = np.bincount(group)
    starts = np.cumsum(counts) - counts
    two = counts == 2
    i1 = order[starts[two]]
    i2 = order[starts[two] + 1]
    return np.stack([i1 // nf, i1 % nf, i2 // nf, i2 % nf], axis=1)


def _face_quad_perms(space, pairs, fp, fm, n_q1d):
    """Per-pair permutation matching the minus side's face quadrature
    points to the plus side's, by physical position (host numpy).
    Handles rotated/flipped tangent frames between the two cells."""
    fpts_p, _, Bp, _, _ = space.basis.face_quadrature(int(fp), n_q1d)
    fpts_m, _, Bm, _, _ = space.basis.face_quadrature(int(fm), n_q1d)
    xe = space.element_coords()
    xp = np.einsum("qn,fnd->fqd", Bp, xe[pairs[:, 0]], optimize=True)
    xm = np.einsum("qn,fnd->fqd", Bm, xe[pairs[:, 2]], optimize=True)
    F, nq = xp.shape[:2]
    scale = np.maximum(np.abs(xp).reshape(F, -1).max(axis=1), 1.0)
    tol2 = (1e-8 * scale) ** 2
    # identity fast path: on translate-lattice regions (and any
    # unrotated adjacency) the two tangent frames agree, so the [F, nq,
    # nq] all-pairs distance tensor — the measured estimator hotspot —
    # is only needed for the pairs that FAIL the aligned check
    # (rotated/flipped seams)
    diag = ((xp - xm) ** 2).sum(axis=-1)                 # [F, nq]
    perm = np.broadcast_to(np.arange(nq), (F, nq)).copy()
    rest = np.nonzero(diag.max(axis=1) > tol2)[0]
    if len(rest):
        d2 = ((xp[rest, :, None, :] - xm[rest, None, :, :]) ** 2) \
            .sum(axis=-1)
        p_r = np.argmin(d2, axis=2)                      # [R, nq]
        perm[rest] = p_r
        best = np.take_along_axis(d2, p_r[:, :, None], axis=2)[:, :, 0]
        bad = (best.max(axis=1) > tol2[rest]) \
            | (np.sort(p_r, axis=1)
               != np.arange(nq)[None, :]).any(axis=1)
        if bad.any():
            raise ValueError(
                "conforming face quadrature points do not match "
                f"(pair {pairs[rest[np.argmax(bad)]]})")
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

    # compute in the STATE's precision: an f64 estimator of an f32
    # state adds no information, and the f32 path (BLAS sgemm + half
    # the stream) is ~2x on the host — the adaptation bottleneck at
    # 10^6 cells.  eta^2 accumulates in f64 either way (bincount).
    wdt = np.float32 if np.asarray(u).dtype == np.float32 \
        else np.float64
    u_np = np.asarray(u, wdt)
    xe_np = np.asarray(op.xe, wdt)
    en_np = np.asarray(op.elem_nodes)

    E_tot = space.n_elements

    def side_du(elems, G_):
        """Reference-coordinate gradients du[f,q,c,a] and J[f,q,i,j]."""
        xe = xe_np[elems]
        ue = u_np[en_np[elems]][..., comp]
        J = np.einsum("fni,qnj->fqij", xe, G_.astype(wdt),
                      optimize=True)
        du = np.einsum("qna,fnc->fqca", G_.astype(wdt), ue,
                       optimize=True)
        return du, J

    def side_du_at(elems, G_pts):
        """Same at PER-FACE tabulated points G_pts [F, q, nn, d]."""
        xe = xe_np[elems]
        ue = u_np[en_np[elems]][..., comp]
        J = np.einsum("fni,fqnj->fqij", xe, G_pts.astype(wdt),
                      optimize=True)
        du = np.einsum("fqna,fnc->fqca", G_pts.astype(wdt), ue,
                       optimize=True)
        return du, J

    def normal_grad(du, J, nrm):
        """(grad u) . n without materializing the physical gradient:
        du_{ca} (J^{-T} n)_a."""
        _, Jinv = det_and_inv(J, xp=np)
        s = np.einsum("fqai,fqi->fqa", Jinv, nrm, optimize=True)
        return np.einsum("fqca,fqa->fqc", du, s, optimize=True)

    if len(pairs):
        pairs_a = np.asarray(pairs, dtype=np.int64)
        # group by (face+, face-) so tabulations are static per group:
        # one lexsort, then contiguous group slices (the masked double
        # loop rescanned the pair list 4d^2 times)
        gkey = pairs_a[:, 1] * (2 * d) + pairs_a[:, 3]
        gord = np.argsort(gkey, kind="stable")
        pairs_s = pairs_a[gord]
        bounds = np.flatnonzero(np.diff(gkey[gord])) + 1
        for sel in np.split(pairs_s, bounds):
            if sel.size == 0:
                continue
            fp, fm = int(sel[0, 1]), int(sel[0, 3])
            ep, em = sel[:, 0], sel[:, 2]
            _, fw, Bp, Gp, _ = space.basis.face_quadrature(fp, n_q1d)
            _, _, Bm, Gm, _ = space.basis.face_quadrature(fm, n_q1d)
            qperm = _face_quad_perms(space, sel, fp, fm, n_q1d)

            du_p, Jp = side_du(ep, Gp)
            du_m, Jm = side_du(em, Gm)
            # reorder the minus side onto the plus side's points
            du_m = np.take_along_axis(
                du_m, qperm[:, :, None, None], axis=1)
            Jm = np.take_along_axis(
                Jm, qperm[:, :, None, None], axis=1)
            meas, nrm = face_measure_and_normal(Jp, fp, xp=np)
            jump = normal_grad(du_p, Jp, nrm) \
                - normal_grad(du_m, Jm, nrm)
            face_int = np.einsum("fqc,fq,q->f", jump * jump,
                                 meas, fw, optimize=True)
            area = np.einsum("fq,q->f", meas, fw, optimize=True)
            h_f = area if d == 2 else np.sqrt(area)
            contrib = (h_f / 24.0) * face_int
            eta2 += np.bincount(ep, weights=contrib, minlength=E_tot)
            eta2 += np.bincount(em, weights=contrib, minlength=E_tot)

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
            du_f, Jf = side_du(ef, Gf)
            du_c, Jc = side_du_at(ec, Gc_)
            meas, nrm = face_measure_and_normal(Jf, int(ff), xp=np)
            jump = normal_grad(du_f, Jf, nrm) \
                - normal_grad(du_c, Jc, nrm)
            face_int = np.einsum("fqc,fq,q->f", jump * jump, meas, fw,
                                 optimize=True)
            area = np.einsum("fq,q->f", meas, fw, optimize=True)
            h_f = area if d == 2 else np.sqrt(area)
            contrib = (h_f / 24.0) * face_int
            eta2 += np.bincount(ef, weights=contrib,
                                minlength=space.n_elements)
            eta2 += np.bincount(ec, weights=contrib,
                                minlength=space.n_elements)
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
