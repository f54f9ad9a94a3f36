"""GLS-stabilized incompressible Navier-Stokes element kernels.

This is the TPU-native rebuild of the reference's ``assembleGLS`` cell
loop (``source/solvers/gls_navier_stokes.cc``, SURVEY.md §2.2 and §3.1
"INNER HOT LOOP"): equal-order Qk-Qk velocity/pressure, Galerkin weak form
plus SUPG + PSPG (+ optional GLS viscous-adjoint and LSIC) stabilization
with the element-size-based tau.  Instead of assembling a Trilinos sparse
matrix, everything is a *matrix-free* batched element kernel:

    gather DoFs -> tensor-product contractions (MXU) -> physics at quad
    points (VPU) -> transpose contractions -> scatter-add

The Jacobian is never formed: J·v comes from ``jax.jvp`` through this
kernel (exact full Newton, including the tau derivative unless frozen),
and the preconditioners consume per-element dense blocks from
``jax.jacfwd`` of the same kernel.

Strong momentum residual (per quad point):
    r_m = du/dt + (u.grad)u + grad p - nu lap u - f
Stabilization parameter (transient; steady drops the 1/dt term):
    tau = [ sdt^2 + (2|u|/h)^2 + 9 (4 nu / h^2)^2 ]^{-1/2}
with h the equivalent-diameter element size divided by the FE degree
(2D: sqrt(4 V / pi), 3D: cbrt(6 V / pi)).

Note: shape-function Laplacians use the affine-mapping chain rule (exact
on straight-sided cells; the mapping-curvature correction on curved cells
affects only the stabilization consistency term and is omitted).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.dof import FESpace
from ..fem.geometry import det_and_inv
from ..ops.operators import (
    gather_elements, scatter_add_elements, node_multiplicity,
    build_assembly_map)


@dataclass(frozen=True)
class StabFlags:
    supg: bool = True
    pspg: bool = True
    gls_viscous_adjoint: bool = True
    lsic: bool = False
    frozen_tau: bool = False


def make_element_kernel(*, dim: int, degree: int, B, G, H, w, nu: float,
                        stab: StabFlags, dtype):
    """Build the single-element GLS residual kernel (see module docstring).

    Shared by the single-device ``GLSOperator`` and the sharded path in
    :mod:`..parallel` — the physics is identical; only gather/scatter and
    reductions differ across shards.
    """
    eye = jnp.eye(dim, dtype=dtype)
    d = dim

    def element_residual(ue, xe, uprev_e, fq, alpha0, sdt):
        """Residual contribution of ONE element.

        ue      [nn, d+1]  current element DoFs (u..., p)
        xe      [nn, d]    element node coordinates
        uprev_e [nn, d]    sum_i alpha_i u^{n-i} at element nodes
        fq      [nq, d]    source term at quad points
        alpha0  scalar     BDF weight of the unknown (0 for steady)
        sdt     scalar     1/dt (0 for steady)
        returns [nn, d+1]
        """
        # geometry at quad points
        J = jnp.einsum("ni,qnj->qij", xe, G)          # dx/dxi
        detJ, Jinv = det_and_inv(J)                   # Jinv = dxi/dx
        scale = detJ * w                              # [nq]

        # solution values / gradients / laplacians at quad points
        uq = jnp.einsum("qn,nc->qc", B, ue)
        du_dxi = jnp.einsum("qna,nc->qca", G, ue)
        grad = jnp.einsum("qca,qai->qci", du_dxi, Jinv)
        vel = uq[:, :d]
        gvel = grad[:, :d, :]                         # [q, i, j]
        p = uq[:, d]
        gp = grad[:, d, :]
        K = jnp.einsum("qai,qbi->qab", Jinv, Jinv)
        d2u = jnp.einsum("qnab,nc->qcab", H, ue[:, :d])
        lap = jnp.einsum("qcab,qab->qc", d2u, K)      # [q, d]

        udot = alpha0 * vel + jnp.einsum("qn,nd->qd", B, uprev_e)
        conv = jnp.einsum("qij,qj->qi", gvel, vel)
        r_m = udot + conv + gp - nu * lap - fq        # strong residual
        div = jnp.einsum("qii->q", gvel)

        # element size h (equivalent diameter / degree) and tau
        vol = jnp.sum(scale)
        if d == 2:
            h = jnp.sqrt(4.0 * vol / math.pi) / degree
        else:
            h = jnp.cbrt(6.0 * vol / math.pi) / degree
        umag2 = jnp.sum(vel * vel, axis=-1)
        tau = 1.0 / jnp.sqrt(
            sdt * sdt + 4.0 * umag2 / (h * h)
            + 9.0 * (4.0 * nu / (h * h)) ** 2)
        if stab.frozen_tau:
            tau = jax.lax.stop_gradient(tau)

        # weak-form coefficient fields (all pre-multiplied by detJ*w)
        a_v = scale[:, None] * (udot + conv - fq)            # phi value
        a_g = scale[:, None, None] * (
            nu * gvel - p[:, None, None] * eye)              # d phi/dx
        a_p = scale * div                                    # psi value
        a_pg = jnp.zeros_like(gp)
        if stab.pspg:
            a_pg = a_pg + (scale * tau)[:, None] * r_m       # grad psi
        if stab.supg:
            a_g = a_g + (scale * tau)[:, None, None] * \
                jnp.einsum("qi,qj->qij", r_m, vel)
        if stab.lsic:
            tau_l = 0.5 * jnp.sqrt(umag2) * h
            a_g = a_g + (scale * tau_l * div)[:, None, None] * eye
        a_lap = None
        if stab.gls_viscous_adjoint:
            a_lap = -(scale * tau * nu)[:, None] * r_m       # lap phi

        # transpose contractions back to nodes
        Rv = jnp.einsum("qn,qi->ni", B, a_v)
        ag_ref = jnp.einsum("qij,qaj->qia", a_g, Jinv)
        Rv = Rv + jnp.einsum("qna,qia->ni", G, ag_ref)
        if a_lap is not None:
            lap_phi = jnp.einsum("qnab,qab->qn", H, K)
            Rv = Rv + jnp.einsum("qn,qi->ni", lap_phi, a_lap)
        Rp = jnp.einsum("qn,q->n", B, a_p)
        apg_ref = jnp.einsum("qj,qaj->qa", a_pg, Jinv)
        Rp = Rp + jnp.einsum("qna,qa->n", G, apg_ref)
        return jnp.concatenate([Rv, Rp[:, None]], axis=-1)

    return element_residual


class GLSOperator:
    """Device-resident matrix-free GLS Navier-Stokes operator.

    Holds the tabulated basis constants and element geometry on device and
    exposes ``residual``, ``element_matrices``, and quadrature-point
    utilities — all traceable under jit.
    """

    def __init__(self, space: FESpace, nu: float, n_q1d: int | None = None,
                 stab: StabFlags = StabFlags(), dtype=None):
        self.space = space
        self.dim = space.dim
        self.nc = self.dim + 1
        self.nu = float(nu)
        self.stab = stab
        self.degree = space.degree
        dtype = dtype or jnp.asarray(1.0).dtype
        self.dtype = dtype

        n_q1d = n_q1d or (space.degree + 1)
        pts, wts, B, G, H = space.basis.quadrature(n_q1d)
        self.n_q = wts.shape[0]
        self.B = jnp.asarray(B, dtype)            # [nq, nn]
        self.G = jnp.asarray(G, dtype)            # [nq, nn, d]
        self.H = jnp.asarray(H, dtype)            # [nq, nn, d, d]
        self.w = jnp.asarray(wts, dtype)          # [nq]
        self.elem_nodes = jnp.asarray(space.elem_nodes)  # [E, nn] i32
        self.xe = jnp.asarray(space.element_coords(), dtype)  # [E, nn, d]
        self.n_nodes = space.n_nodes
        self.nn = space.basis.n_nodes
        mult = node_multiplicity(space.elem_nodes, space.n_nodes)
        self.inv_mult = jnp.asarray(1.0 / mult, dtype)
        # gather-based assembly (TPU: scatter-add serializes; see ops)
        self.amap = build_assembly_map(space.elem_nodes, space.n_nodes)

        # physical quad-point coordinates (for source / error evaluation)
        self.qpts_phys = jnp.einsum("qn,end->eqd", self.B, self.xe)

        self._elem_residual = self._build_element_kernel()

        # batch-minor (SoA) compute path: the TPU-fast layout (see
        # ops/batched_kernel.py); xe pre-transposed once
        from ..ops.batched_kernel import make_batched_kernel
        self._batched_kernel = make_batched_kernel(
            dim=self.dim, degree=self.degree, B=B, G=G, H=H, w=wts,
            nu=self.nu, stab=self.stab, dtype=dtype)
        self.xe_soa = jnp.transpose(self.xe, (1, 2, 0))   # [nn, d, E]

    # ------------------------------------------------------------------
    def _build_element_kernel(self):
        return make_element_kernel(
            dim=self.dim, degree=self.degree, B=self.B, G=self.G,
            H=self.H, w=self.w, nu=self.nu, stab=self.stab,
            dtype=self.dtype)

    # ------------------------------------------------------------------
    # Large arrays must reach jitted code as ARGUMENTS, not closures:
    # XLA embeds closed-over arrays as literals in the module (O(N) HLO
    # text) which breaks compile time at scale.  ``consts()`` is the
    # pytree every jitted entry point threads through.
    # ------------------------------------------------------------------
    def consts(self):
        out = {
            "xe_soa": self.xe_soa,
            "elem_nodes": self.elem_nodes,
            "amap_idx": self.amap.idx,
            "qpts_phys": self.qpts_phys,
        }
        if getattr(self, "_pallas", None) is not None and \
                hasattr(self._pallas, "xe_t"):
            # the lattice kernel has NO per-element geometry arrays —
            # its J/h are ~20 folded python floats
            out["pg_xe"] = self._pallas.xe_t
            out["pg_h"] = self._pallas.h_t
        if getattr(self, "_sl_perm", None) is not None:
            out["sl_perm"] = self._sl_perm
        return out

    def _assemble(self, r_el, C):
        c = r_el.shape[-1]
        flat = r_el.reshape(-1, c)
        flat = jnp.concatenate(
            [flat, jnp.zeros((1, c), flat.dtype)], axis=0)
        return jnp.sum(flat[C["amap_idx"]], axis=1)

    def residual_free(self, u, uprev_combo, fq, alpha0, sdt, C=None):
        """Unconstrained residual R(u): [N, d+1] -> [N, d+1]."""
        C = C if C is not None else self.consts()
        en = C["elem_nodes"]
        ue = gather_elements(u, en)
        upe = gather_elements(uprev_combo, en)
        r = self._batched_kernel(
            jnp.transpose(ue, (1, 2, 0)), C["xe_soa"],
            jnp.transpose(upe, (1, 2, 0)),
            jnp.transpose(fq, (1, 2, 0)), alpha0, sdt)
        r_el = jnp.transpose(r, (2, 0, 1))
        return self._assemble(r_el, C)

    def node_blocks(self, u, bc_mask, uprev_combo, fq, alpha0, sdt,
                    C=None):
        """Assembled per-node (d+1)x(d+1) Jacobian diagonal blocks [N,c,c]
        for block-Jacobi preconditioning — via jvp probes of the batched
        kernel (nn*c kernel evaluations, not E jacfwds)."""
        from ..ops.batched_kernel import node_blocks_batched
        C = C if C is not None else self.consts()
        en = C["elem_nodes"]
        ue = gather_elements(u, en)
        upe = gather_elements(uprev_combo, en)
        blocks_el = node_blocks_batched(
            self._batched_kernel, jnp.transpose(ue, (1, 2, 0)),
            C["xe_soa"], jnp.transpose(upe, (1, 2, 0)),
            jnp.transpose(fq, (1, 2, 0)), alpha0, sdt)   # [E, nn, c*c]
        me = gather_elements(bc_mask.astype(self.dtype), en)
        keep = 1.0 - me                                  # [E, nn, c]
        # keep2[..., i*c+j] = keep[..., i] * keep[..., j] without a 4-D
        # intermediate (whose tiny trailing dims trigger pathological
        # 8x128 tile padding at multi-million-element scale)
        c = self.nc
        keep2 = jnp.repeat(keep, c, axis=-1) * jnp.tile(keep, (1, 1, c))
        blocks = self._assemble(blocks_el * keep2, C)
        return blocks.reshape(self.n_nodes, self.nc, self.nc)

    def residual(self, u, bc_mask, uprev_combo, fq, alpha0, sdt, C=None):
        """Constrained residual: zero at Dirichlet DoFs (the Newton update
        there is pinned by the identity rows of the Jacobian)."""
        R = self.residual_free(u, uprev_combo, fq, alpha0, sdt, C=C)
        return jnp.where(bc_mask, 0.0, R)

    # ------------------------------------------------------------------
    def enable_pallas(self, interpret: bool = False,
                      structured: bool | None = None,
                      state_dtype=None):
        """Switch residual_free to the fused Pallas element kernel
        (ops/pallas_gls.py): one launch for the whole element physics,
        custom_jvp tangent = frozen-tau linearized form (the reference's
        Newton Jacobian).

        With ``structured`` (auto-detected from the mesh) the gather and
        assembly become strided window slices/adds on the node lattice
        (ops/structured.py) — no random-access gathers at all.  Otherwise
        they stay XLA gather ops.
        """
        from ..ops.pallas_gls import PallasGLS
        n_q1d = int(round(self.n_q ** (1 / self.dim)))
        if structured is None:
            structured = self.space.mesh.structured_shape is not None
        nn, nc, E = self.nn, self.nc, self.space.n_elements

        if structured:
            from ..ops.structured import StructuredLayout
            sl = StructuredLayout(self.space)
            self._structured = sl
            xe_grid = sl.elem_coords_grid_order()
            try:
                # affine-uniform lattice: the MXU kernel with no
                # per-element geometry stream (ops/pallas_lattice.py)
                return self._enable_pallas_lattice(
                    sl, xe_grid, n_q1d, interpret, state_dtype)
            except ValueError:
                pass      # curved/non-uniform: general row-layout kernel
            pg = PallasGLS(self.space, self.nu, n_q1d=n_q1d,
                           supg=self.stab.supg, pspg=self.stab.pspg,
                           gls_adjoint=self.stab.gls_viscous_adjoint,
                           lsic=self.stab.lsic, dtype=self.dtype,
                           interpret=interpret, elem_coords=xe_grid,
                           state_dtype=state_dtype)
            self._pallas = pg
            # element permutation space->grid order: fq arrives in the
            # space's element order (same as qpts_phys) and is permuted
            # internally, so every consumer of this operator sees ONE
            # element ordering
            self._sl_perm = jnp.asarray(sl.elem_perm.astype(np.int32))

            def rows_from_list(lst):
                arr = jnp.stack(lst, axis=0)          # [rows, E]
                pad = pg.Ep - arr.shape[1]
                if pad:
                    arr = jnp.concatenate(
                        [arr, jnp.zeros((arr.shape[0], pad), arr.dtype)],
                        axis=1)
                from ..ops.pallas_gls import S as _S, L as _L
                return arr.reshape(arr.shape[0], pg.Eg, _S, _L)

            def residual_free(u, uprev_combo, fq, alpha0, sdt, C=None):
                ue2 = rows_from_list(sl.gather_rows_list(u))
                up2 = rows_from_list(sl.gather_rows_list(uprev_combo))
                # fq arrives in SPACE element order ([E, nq, d], matching
                # qpts_phys); permute to grid order for the strided path
                perm = C.get("sl_perm") if C else None
                if perm is None:
                    perm = self._sl_perm
                fqg = fq[perm]
                fq2 = rows_from_list(
                    [fqg[:, q, i] for q in range(self.n_q)
                     for i in range(self.dim)])
                xe2 = C.get("pg_xe") if C else None
                h2 = C.get("pg_h") if C else None
                r2 = pg.residual_rows(ue2, up2, fq2, alpha0, sdt,
                                      xe2=xe2, h2=h2)
                flat = r2.reshape(r2.shape[0], pg.Ep)[:, :E]
                rows = [flat[i] for i in range(r2.shape[0])]
                return sl.scatter_rows_list(rows, nc)

            def node_blocks(u, bc_mask, uprev_combo, fq, alpha0, sdt,
                            C=None):
                """Pallas-probe node blocks on the structured path
                (tangent-kernel probes + window scatter)."""
                if pg.interpret:
                    # 32 interpreted probe launches would crawl on CPU
                    return GLSOperator.node_blocks(
                        self, u, bc_mask, uprev_combo, fq, alpha0, sdt,
                        C=C)
                C = C if C is not None else self.consts()
                ue2 = rows_from_list(sl.gather_rows_list(u))
                up2 = rows_from_list(sl.gather_rows_list(uprev_combo))
                perm = C.get("sl_perm")
                if perm is None:
                    perm = self._sl_perm
                fqg = fq[perm]
                fq2 = rows_from_list(
                    [fqg[:, q, i] for q in range(self.n_q)
                     for i in range(self.dim)])
                br = pg.node_block_rows(ue2, up2, fq2, alpha0, sdt,
                                        xe2=C.get("pg_xe"),
                                        h2=C.get("pg_h"))
                # Dirichlet keep masks per element-node in row space
                keep_rows = sl.gather_rows_list(
                    1.0 - bc_mask.astype(self.dtype))   # nn*c of [E]
                cc = nc * nc
                flat = br.reshape(nn, cc, pg.Ep)[:, :, :E]
                rows = []
                for n in range(nn):
                    for i in range(nc):
                        ki = keep_rows[n * nc + i]
                        for j in range(nc):
                            rows.append(flat[n, i * nc + j] * ki
                                        * keep_rows[n * nc + j])
                blocks = sl.scatter_rows_list(rows, cc)
                return blocks.reshape(self.n_nodes, nc, nc)

            self.residual_free = residual_free
            self.node_blocks = node_blocks
            return self

        pg = PallasGLS(self.space, self.nu, n_q1d=n_q1d,
                       supg=self.stab.supg, pspg=self.stab.pspg,
                       gls_adjoint=self.stab.gls_viscous_adjoint,
                       lsic=self.stab.lsic, dtype=self.dtype,
                       interpret=interpret, state_dtype=state_dtype)
        self._pallas = pg

        def residual_free(u, uprev_combo, fq, alpha0, sdt, C=None):
            C = C if C is not None else self.consts()
            en = C["elem_nodes"]
            ue2 = pg.to_rows(u[en])
            up2 = pg.to_rows(uprev_combo[en])
            fq2 = pg.to_rows(fq)
            r2 = pg.residual_rows(ue2, up2, fq2, alpha0, sdt,
                                  xe2=C.get("pg_xe"), h2=C.get("pg_h"))
            r_el = pg.from_rows(r2).reshape(E, nn, nc)
            return self._assemble(r_el, C)

        def node_blocks(u, bc_mask, uprev_combo, fq, alpha0, sdt,
                        C=None):
            """Pallas-probe node blocks (gather-assembly path)."""
            if pg.interpret:
                return GLSOperator.node_blocks(
                    self, u, bc_mask, uprev_combo, fq, alpha0, sdt, C=C)
            C = C if C is not None else self.consts()
            en = C["elem_nodes"]
            ue2 = pg.to_rows(u[en])
            up2 = pg.to_rows(uprev_combo[en])
            fq2 = pg.to_rows(fq)
            br = pg.node_block_rows(ue2, up2, fq2, alpha0, sdt,
                                    xe2=C.get("pg_xe"),
                                    h2=C.get("pg_h"))
            cc = nc * nc
            blocks_el = jnp.transpose(
                br.reshape(nn, cc, pg.Ep)[:, :, :E], (2, 0, 1))
            me = gather_elements(bc_mask.astype(self.dtype), en)
            keep = 1.0 - me
            keep2 = jnp.repeat(keep, nc, axis=-1) \
                * jnp.tile(keep, (1, 1, nc))
            blocks = self._assemble(blocks_el * keep2, C)
            return blocks.reshape(self.n_nodes, nc, nc)

        self.residual_free = residual_free
        self.node_blocks = node_blocks
        return self

    # ------------------------------------------------------------------
    def _enable_pallas_lattice(self, sl, xe_grid, n_q1d, interpret,
                               state_dtype):
        """Affine-uniform-lattice fast path: MXU interpolation/projection
        kernel with constant folded geometry (ops/pallas_lattice.py).
        Raises ValueError if the mesh is not a uniform lattice."""
        from ..ops.pallas_lattice import PallasLatticeGLS
        nn, nc, d, E = self.nn, self.nc, self.dim, self.space.n_elements
        pg = PallasLatticeGLS(
            self.space, self.nu, xe_grid, n_q1d=n_q1d,
            supg=self.stab.supg, pspg=self.stab.pspg,
            gls_adjoint=self.stab.gls_viscous_adjoint,
            lsic=self.stab.lsic, dtype=self.dtype,
            interpret=interpret, state_dtype=state_dtype)
        self._pallas = pg
        self._sl_perm = jnp.asarray(sl.elem_perm.astype(np.int32))

        def residual_free(u, uprev_combo, fq, alpha0, sdt, C=None):
            ue2 = pg.rows_from_list(sl.gather_rows_list(u), (nn, nc))
            up2 = pg.rows_from_list(
                sl.gather_rows_list(uprev_combo), (nn, d))
            perm = C.get("sl_perm") if C else None
            if perm is None:
                perm = self._sl_perm
            fqg = fq[perm]
            fq2 = pg.rows_from_list(
                [fqg[:, q, i] for q in range(self.n_q)
                 for i in range(d)], (self.n_q, d))
            r2 = pg.residual_rows(ue2, up2, fq2, alpha0, sdt)
            return sl.scatter_rows_list(pg.rows_to_list(r2, (nn, nc)),
                                        nc)

        def node_blocks(u, bc_mask, uprev_combo, fq, alpha0, sdt,
                        C=None):
            if pg.interpret:
                # nn*c interpreted probe launches would crawl on CPU
                return GLSOperator.node_blocks(
                    self, u, bc_mask, uprev_combo, fq, alpha0, sdt,
                    C=C)
            C = C if C is not None else self.consts()
            ue2 = pg.rows_from_list(sl.gather_rows_list(u), (nn, nc))
            up2 = pg.rows_from_list(
                sl.gather_rows_list(uprev_combo), (nn, d))
            perm = C.get("sl_perm")
            if perm is None:
                perm = self._sl_perm
            fqg = fq[perm]
            fq2 = pg.rows_from_list(
                [fqg[:, q, i] for q in range(self.n_q)
                 for i in range(d)], (self.n_q, d))
            br = pg.node_block_rows(ue2, up2, fq2, alpha0, sdt)
            keep_rows = sl.gather_rows_list(
                1.0 - bc_mask.astype(self.dtype))     # nn*c of [E]
            cc = nc * nc
            flat = br[:, :, :E]                       # [nn, cc, E]
            rows = []
            for n in range(nn):
                for i in range(nc):
                    ki = keep_rows[n * nc + i]
                    for j in range(nc):
                        rows.append(flat[n, i * nc + j] * ki
                                    * keep_rows[n * nc + j])
            blocks = sl.scatter_rows_list(rows, cc)
            return blocks.reshape(self.n_nodes, nc, nc)

        self.residual_free = residual_free
        self.node_blocks = node_blocks
        return self

    # ------------------------------------------------------------------
    def element_matrices(self, u, bc_mask, uprev_combo, fq, alpha0, sdt):
        """Per-element dense Jacobian blocks [E, nn*(d+1), nn*(d+1)].

        Constrained rows/cols are zeroed with a unit diagonal so the local
        blocks stay invertible — the matrix-free analogue of
        ``AffineConstraints`` row elimination.  Feeds the block-Jacobi /
        additive-Schwarz preconditioners (the reference's ILU/AMG slot).
        """
        ue = gather_elements(u, self.elem_nodes)
        upe = gather_elements(uprev_combo, self.elem_nodes)
        me = gather_elements(bc_mask.astype(self.dtype), self.elem_nodes)

        jac_single = jax.jacfwd(self._elem_residual, argnums=0)
        A = jax.vmap(jac_single, in_axes=(0, 0, 0, 0, None, None))(
            ue, self.xe, upe, fq, alpha0, sdt)      # [E, nn, c, nn, c]
        nc = self.nn * self.nc
        A = A.reshape(A.shape[0], nc, nc)
        m = me.reshape(me.shape[0], nc)
        keep = (1.0 - m)
        A = A * keep[:, :, None] * keep[:, None, :]
        A = A + jnp.einsum("ek,kl->ekl", m, jnp.eye(nc, dtype=self.dtype))
        return A

    # ------------------------------------------------------------------
    def cfl(self, u, dt):
        """max over elements/quad points of |u| dt / h (for adaptive dt)."""
        ue = gather_elements(u, self.elem_nodes)

        def one(ue_, xe_):
            J = jnp.einsum("ni,qnj->qij", xe_, self.G)
            detJ, _ = det_and_inv(J)
            vol = jnp.sum(detJ * self.w)
            if self.dim == 2:
                h = jnp.sqrt(4.0 * vol / math.pi) / self.degree
            else:
                h = jnp.cbrt(6.0 * vol / math.pi) / self.degree
            uq = jnp.einsum("qn,nd->qd", self.B, ue_[:, :self.dim])
            return jnp.max(jnp.linalg.norm(uq, axis=-1)) / h

        per_elem = jax.vmap(one)(ue, self.xe)
        return dt * jnp.max(per_elem)
