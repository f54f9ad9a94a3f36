"""Kelly error estimator (KellyErrorEstimator equivalent — SURVEY.md
§2.2 refine_mesh_kelly, §2.5).

Per-cell indicator from the jump of the normal gradient of the chosen
variable (velocity magnitude-wise sum or pressure) across interior faces:

    eta_K^2 = sum_{F in faces(K)} (h_F / 24) * int_F [d u / d n]^2 ds

Face pairs are precomputed host-side from the built mesh (conforming
faces; the 2:1 non-conforming interfaces are already at the refinement
frontier and are skipped, as their jump is dominated by resolved scales).
Evaluation is batched jnp per local-face-pair group.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..fem.geometry import det_and_inv, face_measure_and_normal
from ..ops.operators import gather_elements


def conforming_face_pairs(space):
    """[(elem+, face+, elem-, face-)] for interior conforming faces."""
    mesh = space.mesh
    d = space.dim
    nc = 2 ** d
    from ..fem.basis import _lex_indices
    corner_ij = _lex_indices(2, d)
    seen: dict[tuple, tuple] = {}
    pairs = []
    for e in range(mesh.n_cells):
        for f in range(2 * d):
            axis, side = divmod(f, 2)
            sel = [i for i in range(nc)
                   if corner_ij[i, axis] == (1 if side else 0)]
            key = tuple(sorted(int(mesh.cells[e, i]) for i in sel))
            if key in seen:
                e2, f2 = seen.pop(key)
                pairs.append((e2, f2, e, f))
            else:
                seen[key] = (e, f)
    return pairs


def kelly_estimate(op, u, variable: str = "velocity",
                   pairs=None) -> np.ndarray:
    """Per-element eta_K (host numpy array [E])."""
    space = op.space
    d = op.dim
    if pairs is None:
        pairs = conforming_face_pairs(space)
    eta2 = np.zeros(space.n_elements)
    if not pairs:
        return np.sqrt(eta2)
    pairs = np.asarray(pairs, dtype=np.int64)

    comp = slice(0, d) if variable == "velocity" else slice(d, d + 1)

    # group by (face+, face-) so tabulations are static per group
    for fp in np.unique(pairs[:, 1]):
        for fm in np.unique(pairs[:, 3]):
            sel = pairs[(pairs[:, 1] == fp) & (pairs[:, 3] == fm)]
            if sel.size == 0:
                continue
            ep, em = sel[:, 0], sel[:, 2]
            n_q1d = space.degree + 1
            fpts_p, fw, Bp, Gp, _ = space.basis.face_quadrature(
                int(fp), n_q1d)
            fpts_m, _, Bm, Gm, _ = space.basis.face_quadrature(
                int(fm), n_q1d)
            # quadrature points must coincide physically; for conforming
            # consistently-oriented meshes the tangent ordering matches.
            Gp_ = jnp.asarray(Gp, op.dtype)
            Gm_ = jnp.asarray(Gm, op.dtype)
            w_ = jnp.asarray(fw, op.dtype)

            def side_grad(elems, G_):
                xe = op.xe[elems]
                ue = gather_elements(u, op.elem_nodes[elems])[..., comp]
                J = jnp.einsum("fni,qnj->fqij", xe, G_)
                detJ, Jinv = det_and_inv(J)
                du = jnp.einsum("qna,fnc->fqca", G_, ue)
                grad = jnp.einsum("fqca,fqai->fqci", du, Jinv)
                return grad, J

            gp_, Jp = side_grad(jnp.asarray(ep), Gp_)
            gm_, _ = side_grad(jnp.asarray(em), Gm_)
            meas, nrm = face_measure_and_normal(Jp, int(fp))
            jump = jnp.einsum("fqci,fqi->fqc", gp_ - gm_, nrm)
            face_int = jnp.einsum("fqc,fq,q->f", jump * jump, meas, w_)
            area = jnp.einsum("fq,q->f", meas, w_)
            h_f = area if d == 2 else jnp.sqrt(area)
            contrib = np.asarray((h_f / 24.0) * face_int)
            np.add.at(eta2, ep, contrib)
            np.add.at(eta2, em, contrib)
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
