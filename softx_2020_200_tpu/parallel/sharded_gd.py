"""Sharded grad-div (Taylor-Hood) Navier-Stokes solve under shard_map.

The GLS engine's SPMD machinery (parallel/sharded.py) carries one
equal-order FE space; the GD engine is MIXED — velocity Q(k+1) and
pressure Qk live in different spaces over the same elements.  Both
spaces are partitioned with the SAME Morton element ranges (every
element wholly owned by one shard in both spaces), each with its own
ghost layer and ppermute exchange plan:

    residual   = local element kernel (the exact ``gd_soa_residual``
                 the single-device engine runs) + gather-based local
                 assembly + ppermute partial-sum combine per space
    Newton     = solvers.newton.newton_solve with reduce_fn = psum
                 (all norms/dots cross-shard; one device program per
                 nonlinear solve, zero host sync inside)
    precond    = the reference BlockSchurPreconditioner shape
                 (SURVEY §2.2 gd_navier_stokes.cc): velocity node-block
                 inverse + lumped-pressure-mass Schur approximation,
                 assembled shard-locally and ppermute-combined

Hanging-node constraints (Kelly-adapted meshes) follow the GLS
pattern: each space's constraint rows are localized per shard
(masters closed into the ghost layer by ``partition_space``),
distribute runs after the ghost refresh and the transpose runs on the
local partial residual before the combine.

Replaces the reference's MPI path for ``gd_navier_stokes_*`` under
``mpirun -np N`` (SURVEY §2.3/§2.6).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .partition import partition_space, morton_order
from .sharded import shard_map, AXIS
from ..solvers.newton import newton_solve
from ..solvers.gd import gd_soa_residual


def _localize_hc(L, hc, n_nodes_global):
    """Per-shard hanging-constraint arrays in local slots (or None)."""
    if hc is None or hc.n == 0:
        return None
    Pn = L.n_shards
    trash = L.N_loc - 1
    g2slot = np.full((Pn, n_nodes_global), trash, dtype=np.int32)
    for p in range(Pn):
        v = L.l2g[p]
        ok = v >= 0
        g2slot[p, v[ok]] = np.nonzero(ok)[0].astype(np.int32)
    hids = np.asarray(hc.ids, np.int64)
    hmast = np.asarray(hc.masters, np.int64)
    hw = np.asarray(hc.weights, np.float64)
    H, M = hmast.shape
    ids_l = np.full((Pn, H), trash, np.int32)
    mast_l = np.full((Pn, H, M), trash, np.int32)
    w_l = np.zeros((Pn, H, M))
    for p in range(Pn):
        present = g2slot[p, hids] != trash
        sel = np.nonzero(present)[0]
        ids_l[p, :len(sel)] = g2slot[p, hids[sel]]
        mast_l[p, :len(sel)] = g2slot[p][hmast[sel]]
        w_l[p, :len(sel)] = hw[sel]
        if (mast_l[p, :len(sel)] == trash).any():
            raise RuntimeError(
                "hanging-node master missing from shard closure")
    return ids_l, mast_l, w_l


class ShardedGDSolver:
    """SPMD grad-div Taylor-Hood Newton solve over an n-device mesh."""

    def __init__(self, solver, devices=None):
        op = solver.op
        self.solver = solver
        self.op = op
        self.dim = op.dim
        devices = list(devices if devices is not None else jax.devices())
        self.devices = devices
        self.n_shards = len(devices)
        self.dtype = op.dtype
        self.newton_cfg = solver.newton_cfg

        # SHARED element partition across the two spaces
        order = morton_order(op.space_v.element_coords().mean(axis=1))
        self.Lv = partition_space(
            op.space_v, self.n_shards, elem_order=order,
            hc=solver.hc_v if solver.hc_v.n else None)
        self.Lp = partition_space(
            op.space_p, self.n_shards, elem_order=order,
            hc=solver.hc_p if solver.hc_p.n else None)
        assert self.Lv.E_loc == self.Lp.E_loc
        assert np.array_equal(self.Lv.elem_valid, self.Lp.elem_valid)

        self._hc_v = _localize_hc(self.Lv, solver.hc_v,
                                  op.space_v.n_nodes)
        self._hc_p = _localize_hc(self.Lp, solver.hc_p,
                                  op.space_p.n_nodes)

        self.mesh = Mesh(np.array(devices), (AXIS,))
        self._build()

    # ------------------------------------------------------------------
    def _stack_consts(self):
        Lv, Lp = self.Lv, self.Lp
        op = self.op
        # shard-local quadrature points, SoA [P, q, d, E]
        qp = np.einsum("qn,pend->pqde", np.asarray(op.Bv), Lv.xe)

        def amap_bm(L, nn_):
            # ShardLayout.assembly_idx indexes the [E, nn] flattening
            # (e*nn + n, pad = E*nn); the SoA kernels emit [nn, E] rows
            # (n*E + e) — remap, keeping the pad slot last
            v = L.assembly_idx                             # [P, N, M]
            pad = L.E_loc * nn_
            bm = np.where(v < pad, (v % nn_) * L.E_loc + v // nn_, pad)
            return jnp.asarray(np.transpose(bm, (0, 2, 1))
                               .astype(np.int32).copy())   # [P, M, N]

        C = {
            "cv_t": jnp.asarray(np.transpose(Lv.elem_nodes, (0, 2, 1))),
            "cp_t": jnp.asarray(np.transpose(Lp.elem_nodes, (0, 2, 1))),
            "elem_valid": jnp.asarray(Lv.elem_valid, self.dtype),
            "xe_soa": jnp.asarray(
                np.transpose(Lv.xe, (0, 2, 3, 1)), self.dtype),
            "qpts_soa": jnp.asarray(qp, self.dtype),
            "amap_v": amap_bm(Lv, op.nn_v),
            "amap_p": amap_bm(Lp, op.nn_p),
            "owned_v": jnp.asarray(Lv.owned_mask, self.dtype),
            "owned_p": jnp.asarray(Lp.owned_mask, self.dtype),
        }
        for tag, L in (("v", Lv), ("p", Lp)):
            for k, ex in enumerate(L.exchanges):
                C[f"{tag}send{k}"] = jnp.asarray(ex.send_idx)
                C[f"{tag}recv{k}"] = jnp.asarray(ex.recv_idx)
        for tag, hcl in (("v", self._hc_v), ("p", self._hc_p)):
            if hcl is not None:
                C[f"hc{tag}_ids"] = jnp.asarray(hcl[0])
                C[f"hc{tag}_mast"] = jnp.asarray(hcl[1])
                C[f"hc{tag}_w"] = jnp.asarray(hcl[2], self.dtype)
        return C

    # ------------------------------------------------------------------
    def to_local(self, x_global):
        """Flat global mixed state -> [P, nflat_loc]."""
        d = self.dim
        x = np.asarray(x_global)
        v = x[:self.op.Nv * d].reshape(self.op.Nv, d)
        p = x[self.op.Nv * d:].reshape(self.op.Np, 1)
        v_l = self.Lv.to_local(v)
        p_l = self.Lp.to_local(p)
        return jnp.asarray(np.concatenate(
            [v_l.reshape(self.n_shards, -1),
             p_l.reshape(self.n_shards, -1)], axis=1), self.dtype)

    def to_global(self, x_stack):
        d = self.dim
        nv = self.Lv.N_loc * d
        x = np.asarray(x_stack)
        v = self.Lv.to_global(x[:, :nv].reshape(self.n_shards, -1, d))
        p = self.Lp.to_global(x[:, nv:].reshape(self.n_shards, -1, 1))
        return np.concatenate([v.reshape(-1), p[:, 0]])

    # ------------------------------------------------------------------
    def _build(self):
        op = self.op
        solver = self.solver
        d = self.dim
        Pn = self.n_shards
        Lv, Lp = self.Lv, self.Lp
        nnv, nnp = op.nn_v, op.nn_p
        n_q = op.n_q
        Bv, Gv, Bp, w = op.Bv, op.Gv, op.Bp, op.w
        nu, gamma = op.nu, op.gamma
        dtype = self.dtype
        cfg = self.newton_cfg
        trash_v = Lv.N_loc - 1
        trash_p = Lp.N_loc - 1
        deltas_v = [ex.delta for ex in Lv.exchanges]
        deltas_p = [ex.delta for ex in Lp.exchanges]
        E = Lv.E_loc
        nv_flat = Lv.N_loc * d
        use_hc_v = self._hc_v is not None
        use_hc_p = self._hc_p is not None
        mms = solver._mms
        source = solver.source

        def perm(delta):
            return [(i, (i + delta) % Pn) for i in range(Pn)]

        def make_local(C):
            cv_t, cp_t = C["cv_t"], C["cp_t"]
            elem_valid = C["elem_valid"]
            xe_soa = C["xe_soa"]

            def refresh(u, tag, deltas, trash):
                for k, delta in enumerate(deltas):
                    got = lax.ppermute(u[C[f"{tag}send{k}"]], AXIS,
                                       perm(delta))
                    u = u.at[C[f"{tag}recv{k}"]].set(got)
                return u.at[trash].set(0.0)

            def combine(r, tag, deltas, trash):
                for k, delta in enumerate(deltas):
                    got = lax.ppermute(r[C[f"{tag}recv{k}"]], AXIS,
                                       perm(-delta))
                    r = r.at[C[f"{tag}send{k}"]].add(got)
                return r.at[trash].set(0.0)

            def hc_dist(u, tag, on):
                if not on:
                    return u
                ids, mast, wts = (C[f"hc{tag}_ids"],
                                  C[f"hc{tag}_mast"], C[f"hc{tag}_w"])
                vals = jnp.einsum("hm,hmc->hc", wts, u[mast])
                return u.at[ids].set(vals)

            def hc_trans(r, tag, on):
                if not on:
                    return r
                ids, mast, wts = (C[f"hc{tag}_ids"],
                                  C[f"hc{tag}_mast"], C[f"hc{tag}_w"])
                rh = r[ids]
                r = r.at[mast].add(wts[:, :, None] * rh[:, None, :])
                return r.at[ids].set(0.0)

            def split(x):
                return (x[:nv_flat].reshape(Lv.N_loc, d),
                        x[nv_flat:].reshape(Lp.N_loc, 1))

            def fresh(x):
                v, pf = split(x)
                v = hc_dist(refresh(v, "v", deltas_v, trash_v),
                            "v", use_hc_v)
                pf = hc_dist(refresh(pf, "p", deltas_p, trash_p),
                             "p", use_hc_p)
                return v, pf

            def assemble(r_soa, amap_bm, nn_):
                """[k, nn, E] element rows -> assembled [k, N_loc]."""
                k = r_soa.shape[0]
                flat = r_soa.reshape(k, nn_ * E)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((k, 1), flat.dtype)], axis=1)
                out = flat[:, amap_bm[0]]
                for m in range(1, amap_bm.shape[0]):
                    out = out + flat[:, amap_bm[m]]
                return out

            def element_state(v, pf, combo):
                ve_t = jnp.stack([v[cv_t[n]].T for n in range(nnv)])
                pe_t = jnp.stack([pf[cp_t[n], 0] for n in range(nnp)])
                vpe_t = jnp.stack([combo[cv_t[n]].T
                                   for n in range(nnv)])
                return ve_t, pe_t, vpe_t

            def assemble_combine(Rv, Rp):
                Rv_g = assemble(jnp.transpose(Rv, (1, 0, 2)),
                                C["amap_v"], nnv).T       # [Nv, d]
                Rp_g = assemble(Rp[None], C["amap_p"], nnp).T
                Rv_g = hc_trans(Rv_g, "v", use_hc_v)
                Rp_g = hc_trans(Rp_g, "p", use_hc_p)
                Rv_g = combine(Rv_g, "v", deltas_v, trash_v) \
                    * C["owned_v"][:, None]
                Rp_g = combine(Rp_g, "p", deltas_p, trash_p) \
                    * C["owned_p"][:, None]
                return jnp.concatenate(
                    [Rv_g.reshape(-1), Rp_g.reshape(-1)])

            def residual(x, mask, combo_r, fq_soa, alpha0, sdt):
                v, pf = fresh(x)
                ve_t, pe_t, vpe_t = element_state(v, pf, combo_r)
                Rv, Rp = gd_soa_residual(
                    ve_t, pe_t, vpe_t, xe_soa, fq_soa, Bv, Gv, Bp, w,
                    nu, gamma, alpha0, sdt, dtype)
                R = assemble_combine(Rv * elem_valid, Rp * elem_valid)
                return jnp.where(mask, 0.0, R)

            def velocity_blocks(x, mask_v, combo_r, fq_soa, alpha0,
                                sdt):
                """Assembled velocity node-diagonal d x d INVERSE
                blocks [d, d, Nv_loc] via element-level jvp probes
                (the single-device ``velocity_node_blocks``,
                shard-local + combined)."""
                v, pf = fresh(x)
                ve_t, pe_t, vpe_t = element_state(v, pf, combo_r)

                def mom(ve):
                    Rv, _ = gd_soa_residual(
                        ve, pe_t, vpe_t, xe_soa, fq_soa, Bv, Gv, Bp,
                        w, nu, gamma, alpha0, sdt, dtype)
                    return Rv * elem_valid

                def probe(k):
                    n0, j = k // d, k % d
                    tangent = jnp.zeros((nnv, d, 1), dtype) \
                        .at[n0, j, 0].set(1.0) \
                        * jnp.ones((1, 1, E), dtype)
                    return jax.jvp(mom, (ve_t,), (tangent,))[1][n0]

                cols = lax.map(probe, jnp.arange(nnv * d))
                # [nnv*d(n0,j), d(i), E] -> [d*d (i,j row-major), nnv, E]
                be = jnp.transpose(
                    cols.reshape(nnv, d, d, E), (2, 1, 0, 3)) \
                    .reshape(d * d, nnv, E)
                mk = 1.0 - mask_v                         # [Nv, d]
                keep = jnp.stack([mk[cv_t[n]].T for n in range(nnv)],
                                 axis=1)                  # [d, nnv, E]
                keep2 = jnp.concatenate(
                    [keep[i][None] * keep for i in range(d)], axis=0)
                blocks = assemble(be * keep2, C["amap_v"], nnv)
                blocks = combine(blocks.T, "v", deltas_v,
                                 trash_v).T.reshape(d, d, -1)
                for i in range(d):
                    blocks = blocks.at[i, i].add(mask_v[:, i])
                from ..ops.smallmat import det_bm, inv_bm
                deg = jnp.abs(det_bm(blocks)) < 1e-300
                eye_bm = jnp.eye(d, dtype=dtype)[:, :, None]
                blocks = jnp.where(deg[None, None, :], eye_bm, blocks)
                return inv_bm(blocks)

            def lumped_pressure_mass():
                from ..ops.batched_kernel import _det_inv_soa
                J = jnp.einsum("niE,qnj->qijE", xe_soa, Gv)
                detJ, _ = _det_inv_soa(J)
                scale = detJ * w[:, None] * elem_valid
                lumped = jnp.einsum("qn,qE->nE", Bp, scale)
                mp = assemble(lumped[None], C["amap_p"], nnp).T
                mp = combine(mp, "p", deltas_p, trash_p)[:, 0]
                return jnp.where(jnp.abs(mp) > 1e-300, mp, 1.0)

            return (split, fresh, residual, velocity_blocks,
                    lumped_pressure_mass, refresh)

        def spmd_solve(x0, mask, vals, combo, t, alpha0, sdt, C):
            # strip the leading size-1 shard axis of P(AXIS) blocks
            C = {k: v[0] for k, v in C.items()}
            x0, mask, vals, combo = x0[0], mask[0], vals[0], combo[0]
            (split, fresh, residual, velocity_blocks,
             lumped_pressure_mass, refresh) = make_local(C)
            x0 = jnp.where(mask, vals, x0)
            mask_v = mask[:nv_flat].reshape(Lv.N_loc, d).astype(dtype)
            combo_r = refresh(combo, "v", deltas_v, trash_v)
            # body force at shard-local quadrature points [q, d, E]
            qs = C["qpts_soa"]                           # [q, d, E]
            if mms is not None or source is not None:
                pts = jnp.transpose(qs, (2, 0, 1))       # [E, q, d]
                f = (mms(pts, t) if mms is not None
                     else source.spatial(pts, t)[..., :d])
                fq_soa = jnp.transpose(f, (1, 2, 0)).astype(dtype)
            else:
                fq_soa = jnp.zeros_like(qs)
            mp = lumped_pressure_mass()
            schur_scale = -(nu + gamma)

            def res_fn(x):
                return residual(x, mask, combo_r, fq_soa, alpha0, sdt)

            def precond_builder(x):
                binv = velocity_blocks(x, mask_v, combo_r, fq_soa,
                                       alpha0, sdt)

                def apply(r):
                    rv, rp = split(r)
                    zv = jnp.einsum("ijn,nj->ni", binv, rv)
                    zp = schur_scale * rp[:, 0] / mp
                    return jnp.concatenate([zv.reshape(-1), zp])

                return apply

            res = newton_solve(
                res_fn, x0, precond_builder=precond_builder,
                config=cfg, reduce_fn=lambda a: lax.psum(a, AXIS))
            v, pf = fresh(res.u)
            u_out = jnp.concatenate([v.reshape(-1), pf.reshape(-1)])
            return (u_out[None], res.res_history[None],
                    res.n_iterations[None], res.linear_iters[None],
                    res.alphas[None])

        spec = P(AXIS)
        consts = self._stack_consts()
        self._consts = consts
        cspec = {k: spec for k in consts}

        self._solve_sm = jax.jit(shard_map(
            spmd_solve, mesh=self.mesh,
            in_specs=(spec, spec, spec, spec, P(), P(), P(), cspec),
            out_specs=(spec, spec, spec, spec, spec)))

    # ------------------------------------------------------------------
    @classmethod
    def from_solver(cls, solver, devices=None):
        return cls(solver, devices=devices)

    # ------------------------------------------------------------------
    def solve(self, x0_global, vprev_combo_global=None, t=0.0,
              alpha0=0.0, sdt=0.0):
        """Global-in/global-out nonlinear solve; returns a NewtonResult
        matching the single-device ``_solve_impl`` (hanging rows
        distributed, ghosts owner-consistent)."""
        from ..solvers.newton import NewtonResult
        op, solver = self.op, self.solver
        d = self.dim
        if vprev_combo_global is None:
            vprev_combo_global = np.zeros((op.Nv, d))
        mask_g = np.asarray(solver._mask).astype(np.float64)
        vals_g = np.asarray(solver._bc_values_flat(t))
        x = self.to_local(np.asarray(x0_global))
        mask = self.to_local(mask_g) > 0.5
        vals = self.to_local(vals_g)
        combo = jnp.asarray(self.Lv.to_local(
            np.asarray(vprev_combo_global)), self.dtype)
        u, hist, iters, lin, alphas = self._solve_sm(
            x, mask, vals, combo,
            jnp.asarray(t, self.dtype),
            jnp.asarray(alpha0, self.dtype),
            jnp.asarray(sdt, self.dtype), self._consts)
        u_g = jnp.asarray(self.to_global(u), self.dtype)
        return NewtonResult(
            u=u_g, res_history=jnp.asarray(np.asarray(hist)[0]),
            n_iterations=jnp.asarray(np.asarray(iters)[0]),
            linear_iters=jnp.asarray(np.asarray(lin)[0]),
            alphas=jnp.asarray(np.asarray(alphas)[0]))
