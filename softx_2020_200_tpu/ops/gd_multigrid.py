"""Geometric multigrid for the GD (Taylor-Hood) velocity block.

The reference's BlockSchurPreconditioner solves the velocity block with
an ILU/AMG sweep (SURVEY.md §2.2 gd solver, §3.3 hard part #2); round-2
shipped only node-block Jacobi there, which degrades with 1/h exactly
like the GLS case did before `ops/multigrid.py`.  This module closes
that gap (VERDICT r2 "next round" #8): a V-cycle on the VELOCITY block
of the linearized GD Jacobian,

    A v = alpha0 (v, w) + ((u.grad)v + (v.grad)u, w)
        + nu (grad v, grad w) + gamma (div v, div w),

which is *linear in v*, so level matvecs are direct kernel evaluations
(no jvp) and the node-block smoother is assembled in closed form — no
probing.  Hierarchies coarsen the same two ways as the GLS GMG:
structured lattice halving, or forest sibling-merge on adapted /
multiblock meshes.  The pressure Schur part of the block-triangular
preconditioner is untouched (lumped mass — grad-div makes it mesh
independent already).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.mesh import subdivided_hyper_rectangle
from ..fem.dof import FESpace
from .preconditioners import build_from_node_blocks
from .linalg import gmres
from .multigrid import _transfer_maps


class GDVelocityLevel:
    """One level: the velocity-block operator on a velocity FESpace.

    Geometry (Jinv, detJ*w) is precomputed once in SoA (batch-minor)
    layout; the linearization state (u, grad u at quadrature points) is
    supplied per application by the V-cycle builder.
    """

    def __init__(self, space_v, nu: float, gamma: float,
                 n_q1d: int, dtype):
        from .batched_kernel import _det_inv_soa
        self.space = space_v
        self.dim = d = space_v.dim
        self.nu = float(nu)
        self.gamma = float(gamma)
        self.dtype = dtype
        _, wts, Bv, Gv, _ = space_v.basis.quadrature(n_q1d)
        self.B = jnp.asarray(Bv, dtype)                 # [q, nn]
        self.G = jnp.asarray(Gv, dtype)                 # [q, nn, d]
        self.w = jnp.asarray(wts, dtype)
        self.conn = jnp.asarray(space_v.elem_nodes)
        self.N = space_v.n_nodes
        self.nn = space_v.basis.n_nodes
        from .operators import build_assembly_map
        self.amap = build_assembly_map(space_v.elem_nodes, self.N)
        xe_t = jnp.transpose(
            jnp.asarray(space_v.element_coords(), dtype), (1, 2, 0))
        J = jnp.einsum("niE,qnj->qijE", xe_t, self.G)
        detJ, Jinv = _det_inv_soa(J)
        self.scale = detJ * self.w[:, None]             # [q, E]
        self.Jinv = Jinv                                # [q, a, i, E]
        # physical basis gradients [q, n, i, E] (used by both the matvec
        # and the closed-form block assembly)
        self.gB = jnp.einsum("qna,qaiE->qniE", self.G, Jinv)

    # ------------------------------------------------------------------
    def lin_state(self, v_nodal):
        """(uq [q,d,E], guq [q,d,i,E]) at the linearization point."""
        from .operators import gather_elements
        ve_t = jnp.transpose(
            gather_elements(v_nodal, self.conn), (1, 2, 0))
        uq = jnp.einsum("qn,ndE->qdE", self.B, ve_t)
        guq = jnp.einsum("qniE,ndE->qdiE", self.gB, ve_t)
        return uq, guq

    def matvec(self, v, uq, guq, alpha0):
        """A(u_lin) @ v on nodal velocity [N, d] -> [N, d]."""
        from .operators import gather_elements, scatter_add_elements
        d = self.dim
        ve_t = jnp.transpose(gather_elements(v, self.conn), (1, 2, 0))
        vq = jnp.einsum("qn,ndE->qdE", self.B, ve_t)
        gv = jnp.einsum("qniE,ndE->qdiE", self.gB, ve_t)
        conv = (jnp.einsum("qdiE,qiE->qdE", gv, uq)
                + jnp.einsum("qdiE,qiE->qdE", guq, vq))
        div = jnp.einsum("qiiE->qE", gv)
        a_v = self.scale[:, None] * (alpha0 * vq + conv)
        eye = jnp.eye(d, dtype=self.dtype)
        a_g = self.scale[:, None, None] * (
            self.nu * gv
            + self.gamma * div[:, None, None] * eye[None, :, :, None])
        Rv = jnp.einsum("qn,qdE->ndE", self.B, a_v)
        Rv = Rv + jnp.einsum("qniE,qdiE->ndE", self.gB, a_g)
        Rv_el = jnp.transpose(Rv, (2, 0, 1))
        return scatter_add_elements(Rv_el, self.conn, self.N,
                                    amap=self.amap)

    def node_blocks(self, uq, guq, alpha0):
        """Closed-form assembled node-diagonal blocks [N, d, d]."""
        from .operators import scatter_add_elements
        d = self.dim
        B2 = self.B * self.B                            # [q, n]
        # scalar-diagonal contributions: mass + advection + viscosity
        m = jnp.einsum("qE,qn->nE", self.scale, B2)
        adv = jnp.einsum("qE,qn,qniE,qiE->nE",
                         self.scale, self.B, self.gB, uq)
        lap = jnp.einsum("qE,qniE,qniE->nE", self.scale,
                         self.gB, self.gB)
        diag = alpha0 * m + adv + self.nu * lap         # [n, E]
        # tensor contributions: reaction grad(u) + grad-div
        react = jnp.einsum("qE,qn,qdiE->ndiE", self.scale, B2, guq)
        gdiv = self.gamma * jnp.einsum("qE,qndE,qniE->ndiE",
                                       self.scale, self.gB, self.gB)
        eye = jnp.eye(d, dtype=self.dtype)
        blocks = (react + gdiv
                  + diag[:, None, None, :] * eye[None, :, :, None])
        blocks_el = jnp.transpose(blocks, (3, 0, 1, 2))  # [E, n, d, d]
        out = scatter_add_elements(
            blocks_el.reshape(blocks_el.shape[0], self.nn, d * d),
            self.conn, self.N, amap=self.amap)
        return out.reshape(self.N, d, d)


# ----------------------------------------------------------------------
def _level_mask(space_v, prm_bcs, nc_faces, dim):
    """Velocity Dirichlet + hanging mask [N, d] for one level."""
    from ..solvers.boundary import BoundaryHandler
    from ..fem.constraints import build_hanging_constraints
    bh = BoundaryHandler(space_v, prm_bcs)
    mask = np.asarray(bh.mask)[:, :dim].copy()
    hc = build_hanging_constraints(space_v, nc_faces)
    if hc.n:
        mask[np.asarray(hc.ids)] = True
    return jnp.asarray(mask), hc


def build_gd_hierarchy(solver, min_elems: int = 64,
                       max_levels: int = 10):
    """Velocity-block level list for a GDNavierStokesSolver.

    Returns (levels, consts) with ``levels[0]`` living on the solver's
    own velocity space; ``consts[li]`` carries mask/transfer/hc arrays.
    Returns a single-level list when the mesh cannot coarsen.
    """
    op = solver.op
    d = solver.dim
    n_q1d = int(round(op.n_q ** (1.0 / d)))
    lv0 = GDVelocityLevel(op.space_v, op.nu, op.gamma, n_q1d, op.dtype)
    mask0 = jnp.asarray(np.asarray(solver.bh.mask)[:, :d])
    if solver.hc_v.n:
        mask0 = mask0 | jnp.zeros_like(mask0).at[
            jnp.asarray(solver.hc_v.ids)].set(True)
    levels = [lv0]
    consts = [dict(mask=mask0, hc=solver.hc_v)]

    mesh = op.space_v.mesh
    degree_v = op.space_v.degree
    if mesh.structured_shape is not None:
        ne = tuple(mesh.structured_shape)
        lo = mesh.vertices.min(axis=0)
        hi = mesh.vertices.max(axis=0)
        prev_space = op.space_v
        while (len(levels) < max_levels
               and all(n % 2 == 0 for n in ne)
               and int(np.prod(ne)) // (2 ** d) >= min_elems):
            ne = tuple(n // 2 for n in ne)
            cmesh = subdivided_hyper_rectangle(lo, hi, list(ne),
                                               colorize=True, dim=d)
            side_bid = {}
            for (_, lf, b) in mesh.boundary_faces:
                side_bid.setdefault(int(lf), set()).add(int(b))

            def _face_centers(m, rows):
                # corner subset of a local face (axis, side) on the
                # lex-ordered 2^d cell corners
                cen = np.empty((len(rows), d))
                for i, (e, lf, _) in enumerate(rows):
                    ax, sd = divmod(int(lf), 2)
                    sel = [c for c in range(2 ** d)
                           if (c >> ax) & 1 == sd]
                    cen[i] = m.vertices[m.cells[int(e), sel]].mean(0)
                return cen

            for row in cmesh.boundary_faces:
                ids = side_bid.get(int(row[1]))
                if ids is None:
                    continue
                if len(ids) == 1:
                    row[2] = next(iter(ids))
            # sides carrying several boundary ids (e.g. an outflow
            # patch sharing a geometric side with a wall): give each
            # coarse face the id of the NEAREST fine boundary face so
            # coarse Dirichlet masks cannot silently swallow an
            # outlet/Neumann patch
            mixed = [lf for lf, v in side_bid.items() if len(v) > 1]
            for lf in mixed:
                crows = [r for r in cmesh.boundary_faces
                         if int(r[1]) == lf]
                frows = [r for r in mesh.boundary_faces
                         if int(r[1]) == lf]
                if not crows or not frows:
                    continue
                cc = _face_centers(cmesh, crows)
                fc = _face_centers(mesh, frows)
                fb = np.fromiter((int(r[2]) for r in frows),
                                 np.int64, len(frows))
                near = np.argmin(
                    ((cc[:, None, :] - fc[None, :, :]) ** 2).sum(-1),
                    axis=1)
                for r, j in zip(crows, near):
                    r[2] = int(fb[j])
            cmesh.periodic = list(mesh.periodic)
            cspace = FESpace(cmesh, degree_v)
            masters, weights, inject = _transfer_maps(prev_space, cspace)
            cmask, chc = _level_mask(cspace,
                                     solver.prm.boundary_conditions,
                                     [], d)
            levels.append(GDVelocityLevel(cspace, op.nu, op.gamma,
                                          n_q1d, op.dtype))
            consts.append(dict(
                mask=cmask, hc=chc,
                masters=jnp.asarray(masters),
                weights=jnp.asarray(weights, op.dtype),
                inject=jnp.asarray(inject)))
            prev_space = cspace
        return levels, consts

    if getattr(solver, "forest", None) is None:
        return levels, consts

    # forest path (adapted / multiblock / gmsh meshes)
    from ..fem.forest import Forest
    from ..fem.transfer import _new_node_base_positions, locate_in_forest
    from .multigrid import _coarsen_forest

    cur_forest = solver.forest
    cur_space = op.space_v
    cur_elem_of = solver._elem_of
    while (len(levels) < max_levels
           and cur_space.n_elements > min_elems):
        cforest = _coarsen_forest(cur_forest)
        if cforest.n_leaves() >= cur_forest.n_leaves():
            break
        cmesh, c_elem_of, c_ncf = cforest.build_mesh()
        cmesh.periodic = list(op.space_v.mesh.periodic)
        cspace = FESpace(cmesh, degree_v)
        cmask, chc = _level_mask(cspace,
                                 solver.prm.boundary_conditions,
                                 c_ncf, d)
        bc_f, bp_f = _new_node_base_positions(cur_space, cur_forest,
                                              cur_elem_of)
        elem_c, ref_c = locate_in_forest(bc_f, bp_f, cforest,
                                         c_elem_of, d)
        Bp, _, _ = cspace.basis.tabulate(ref_c)
        masters = cspace.elem_nodes[elem_c]
        bc_c, bp_c = _new_node_base_positions(cspace, cforest, c_elem_of)
        elem_f, ref_f = locate_in_forest(bc_c, bp_c, cur_forest,
                                         cur_elem_of, d)
        Br, _, _ = cur_space.basis.tabulate(ref_f)
        inj_masters = cur_space.elem_nodes[elem_f]
        levels.append(GDVelocityLevel(cspace, op.nu, op.gamma,
                                      n_q1d, op.dtype))
        consts.append(dict(
            mask=cmask, hc=chc,
            masters=jnp.asarray(masters.astype(np.int32)),
            weights=jnp.asarray(Bp, op.dtype),
            inj_masters=jnp.asarray(inj_masters.astype(np.int32)),
            inj_weights=jnp.asarray(Br, op.dtype)))
        cur_forest, cur_space, cur_elem_of = cforest, cspace, c_elem_of
    return levels, consts


# ----------------------------------------------------------------------
def make_gd_vcycle(levels, consts, *, n_smooth: int = 1,
                   omega: float = 0.7, coarse_iters: int = 20):
    """builder(v_lin, alpha0) -> apply(r [N,d]): one velocity V-cycle
    linearized at the nodal velocity ``v_lin``."""
    n_levels = len(levels)

    def _hc_pair(hc):
        if hc is None or hc.n == 0:
            return (lambda u: u), (lambda R: R)
        return hc.distribute, hc.distribute_transpose

    def builder(v_lin, alpha0):
        hcs = [_hc_pair(consts[li].get("hc")) for li in range(n_levels)]
        # linearization states per level (inject/interpolate downward)
        vs = [v_lin]
        for li in range(1, n_levels):
            C = consts[li]
            if "inject" in C:
                vs.append(vs[-1][C["inject"]])
            else:
                iw, im = C["inj_weights"], C["inj_masters"]
                vs.append(jnp.einsum("nm,nmc->nc", iw, vs[-1][im]))

        mats = []
        for li in range(n_levels):
            lv, C = levels[li], consts[li]
            mask = C["mask"]
            uq, guq = lv.lin_state(vs[li])
            blocks = lv.node_blocks(uq, guq, alpha0)
            mrow = mask.astype(blocks.dtype)
            keep = 1.0 - mrow
            blocks = blocks * keep[:, :, None] * keep[:, None, :]
            smoother = build_from_node_blocks("block_jacobi", blocks,
                                              mask).apply
            hcD, hcT = hcs[li]

            def matvec(v, lv=lv, uq=uq, guq=guq, mask=mask,
                       hcD=hcD, hcT=hcT):
                vin = hcD(jnp.where(mask, 0.0, v))
                out = hcT(lv.matvec(vin, uq, guq, alpha0))
                return jnp.where(mask, v, out)

            mats.append((matvec, smoother, mask))

        def prolong(li, vc):
            vc = hcs[li][0](vc)
            return jnp.einsum("fm,fmc->fc", consts[li]["weights"],
                              vc[consts[li]["masters"]])

        def restrict(li, rf, Nc):
            out = jnp.zeros((Nc, rf.shape[-1]), rf.dtype)
            out = out.at[consts[li]["masters"]].add(
                consts[li]["weights"][:, :, None] * rf[:, None, :])
            return hcs[li][1](out)

        def vcycle(level, r):
            matvec, smoother, mask = mats[level]
            if level + 1 == n_levels:
                sol, _, _ = gmres(
                    lambda x: matvec(x.reshape(r.shape)).reshape(-1),
                    r.reshape(-1),
                    precond=lambda x: smoother(
                        x.reshape(r.shape)).reshape(-1),
                    m=coarse_iters, max_restarts=1, atol=1e-30)
                return sol.reshape(r.shape)
            z = omega * smoother(r)
            for _ in range(n_smooth - 1):
                z = z + omega * smoother(r - matvec(z))
            res = r - matvec(z)
            rc = restrict(level + 1, res, levels[level + 1].N)
            rc = jnp.where(mats[level + 1][2], 0.0, rc)
            zc = vcycle(level + 1, rc)
            z = z + jnp.where(mask, 0.0, prolong(level + 1, zc))
            z = z + omega * smoother(r - matvec(z))
            return z

        return lambda r: vcycle(0, r)

    return builder
