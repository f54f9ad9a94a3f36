"""Sharded GLS Navier-Stokes solve: SPMD Newton-Krylov under shard_map.

The distributed analogue of the single-device path in
``solvers/base.py`` (reference: the implicit MPI layer of SURVEY.md §3.1
— ghosted Trilinos vectors + Allreduce):

- state lives as ``[P, N_loc, c]`` stacks, one shard per device, and
  STAYS device-resident across transient steps (no host round trip);
- ghost refresh and partial-sum combination are ``lax.ppermute`` hops
  using the static index plans from :mod:`.partition`;
- all reductions (Newton norms, GMRES dots) are ``lax.psum``;
- the SAME ``newton_solve`` / ``gmres`` / element kernels as the
  single-device path run inside ``shard_map`` — only gather/scatter and
  ``reduce_fn`` differ.

Round-2 upgrades over the initial fork (VERDICT r1 #1/#6):
- the fused Pallas element kernel (``ops/pallas_gls``) runs per shard
  (``kernel='pallas'``; ``'pallas_interpret'`` on CPU meshes);
- the preconditioner uses the node-block jvp-probe fast path
  (``ops/batched_kernel.node_blocks_batched``) instead of per-element
  ``jacfwd`` — identical to the single-device path;
- source terms / MMS forcing are evaluated at shard-local quadrature
  points inside the jitted step (nothing is zeroed);
- time-dependent function Dirichlet values are evaluated inside the
  step from the deck expressions;
- geometric multigrid: the fine level smooths/matvecs sharded, coarse
  levels run REPLICATED on every shard (they are tiny), with
  restriction = psum-combined scatter and prolongation = local gather
  from the replicated coarse vector;
- a transient BDF driver keeps (u, history) stacked on device; only
  residual norms come back to the host for logging.

The entire Newton solve is one jitted SPMD program: zero host sync per
Newton iteration on any number of chips.
"""

from __future__ import annotations

from functools import partial

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # annotation, and every output here is explicitly owned-masked /
        # psum-reduced anyway
        try:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_vma=False)
        except TypeError:
            return _shard_map(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)
except ImportError:                                    # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        try:
            return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs, check_rep=False)
        except TypeError:
            return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                                  out_specs=out_specs)

from ..solvers.gls import StabFlags
from ..solvers.newton import newton_solve, NewtonConfig
from .partition import ShardLayout, partition_space

AXIS = "shard"


class ShardedGLSSolver:
    """Distributed steady/transient GLS solve over a 1-D device mesh."""

    def __init__(self, space, nu: float, layout: ShardLayout | None = None,
                 devices=None, n_q1d: int | None = None,
                 stab: StabFlags = StabFlags(),
                 newton: NewtonConfig = NewtonConfig(), dtype=None,
                 kernel: str = "xla", precond: str = "block_jacobi",
                 source_fn=None, bc_exprs=None, bc_mask=None, mg=None,
                 hc=None, mg_smoother: str = "jacobi",
                 mg_krylov_m: int = 4, mg_cycle: str = "v",
                 strike_parent=None, gmg_strikes: int = 0):
        """kernel:   'xla' | 'pallas' | 'pallas_interpret'
        precond:  'jacobi' | 'block_jacobi' | 'gmg'
        source_fn: traceable (qpts[..., d], t) -> [..., d] body force
        bc_exprs: list of (global_node_ids, [Expression per velocity
                  component]) — time-dependent Dirichlet values evaluated
                  inside the jitted step (BoundaryHandler.function_entries)
        bc_mask:  global [N, c] bool Dirichlet mask (default: all free)
        mg:       (level_ops, mg_consts) from ops.multigrid.build_hierarchy
                  — levels [1:] become the replicated coarse grids
        hc:       fem.constraints.HangingConstraints of an ADAPTED mesh;
                  constraint rows are localized per shard and applied
                  inside the jitted step (the distributed analogue of the
                  reference's AffineConstraints condensation)
        """
        devices = devices if devices is not None else jax.devices()
        self.n_shards = len(devices)
        self.mesh = Mesh(np.array(devices), (AXIS,))
        self.hc = hc if (hc is not None and hc.n) else None
        self.layout = layout or partition_space(space, self.n_shards,
                                                hc=self.hc)
        L = self.layout
        self.space = space
        self.dim = space.dim
        self.nc = space.dim + 1
        self.nu = nu
        dtype = dtype or jnp.asarray(1.0).dtype
        self.dtype = dtype
        self.source_fn = source_fn
        # GMG stagnation strikes, mirrored to the single-device solver
        # this was wired from (from_solver) so eviction survives the
        # re-shard after every Kelly cycle
        self._gmg_strikes = int(gmg_strikes)
        self._strike_parent = strike_parent

        n_q1d = n_q1d or (space.degree + 1)
        pts, wts, B, G, H = space.basis.quadrature(n_q1d)
        from ..ops.batched_kernel import make_batched_kernel
        self._batched = make_batched_kernel(
            dim=space.dim, degree=space.degree, B=B, G=G, H=H, w=wts,
            nu=nu, stab=stab, dtype=dtype)
        self.newton_cfg = newton
        self.n_q = wts.shape[0]
        self.nn = L.nn
        self.stab = stab
        self.precond_kind = precond
        self._mg_smoother = mg_smoother
        self._mg_krylov_m = mg_krylov_m
        self._mg_cycle = mg_cycle

        # default Dirichlet mask stack (a solve() may pass its own);
        # hanging rows are masked like Dirichlet rows (their Newton
        # update is pinned; values come from distribute())
        if bc_mask is None:
            bc_mask = np.zeros((space.n_nodes, self.nc), bool)
        self._mask_stack = jnp.asarray(
            L.to_local(self._augment_mask(bc_mask)) > 0.5)
        self._zero_vals = jnp.zeros(
            (self.n_shards, L.N_loc, self.nc), dtype)

        # ---------------- per-shard constants (spec P(AXIS)) ----------
        # LAYOUT RULE (measured, see node_blocks_batched docstring): any
        # device array whose two MINOR dims are small gets 8x128 tile
        # padding (up to 42x memory at rest).  Everything elementwise or
        # gathered here is therefore stored batch-minor (big axis last)
        # or flat-2D [big, small<=4].
        E_loc, nn = L.E_loc, L.nn
        M = L.assembly_idx.shape[-1]
        # assembly map, transposed and re-indexed for batch-minor rows:
        # original idx v = e*nn + n (pad E*nn); bm flat index n*E + e
        # (pad nn*E)
        v = L.assembly_idx                                # [P, N, M]
        pad = E_loc * nn
        amap_bm = np.where(v < pad, (v % nn) * E_loc + v // nn, pad)
        C = {
            # element connectivity, node-major: en_t[p, n] = [E] node ids
            "en_t": jnp.asarray(np.transpose(
                L.elem_nodes, (0, 2, 1)).copy()),         # [P,nn,E] i32
            "elem_valid": jnp.asarray(L.elem_valid, dtype),
            "xe_soa": jnp.asarray(np.transpose(
                L.xe, (0, 2, 3, 1)).copy(), dtype),       # [P,nn,d,E]
            "owned": jnp.asarray(L.owned_mask, dtype),
            "amap_bm": jnp.asarray(np.transpose(
                amap_bm, (0, 2, 1)).astype(np.int32).copy()),  # [P,M,N]
            "coords": jnp.asarray(L.to_local(space.nodes), dtype),
            # quadrature-point coordinates, batch-minor [P, d, nq*E]
            "qpts_bm": jnp.asarray(
                np.einsum("qn,pend->pdqe", B, L.xe).reshape(
                    self.n_shards, space.dim, -1), dtype),
        }
        for k, ex in enumerate(L.exchanges):
            C[f"send{k}"] = jnp.asarray(ex.send_idx)
            C[f"recv{k}"] = jnp.asarray(ex.recv_idx)
        self._deltas = [ex.delta for ex in L.exchanges]

        # Dirichlet: local slot lists per function-bc entry
        self._bc_exprs = []
        trash = L.N_loc - 1
        if bc_exprs or self.hc is not None:
            g2slot = self._global_to_slot()          # [P, N] int32
        if bc_exprs:
            for bi, (gids, exprs) in enumerate(bc_exprs):
                gids = np.asarray(gids, dtype=np.int64)
                if gids.size == 0:
                    slots = np.full((self.n_shards, 1), trash, np.int32)
                else:
                    slots = g2slot[:, gids]
                C[f"bc_slots{bi}"] = jnp.asarray(slots)
                self._bc_exprs.append(exprs)

        # hanging constraints, localized per shard: rows for every
        # hanging node PRESENT on the shard (masters are present by the
        # partition closure); padded rows write the trash slot with
        # zero weights
        if self.hc is not None:
            hids = np.asarray(self.hc.ids, np.int64)
            hmast = np.asarray(self.hc.masters, np.int64)
            hw = np.asarray(self.hc.weights, np.float64)
            M_h = hmast.shape[1]
            present = g2slot[:, hids] != trash            # [P, H]
            Hl = max(1, int(present.sum(axis=1).max()))
            ids_l = np.full((self.n_shards, Hl), trash, np.int32)
            mast_l = np.full((self.n_shards, Hl, M_h), trash, np.int32)
            w_l = np.zeros((self.n_shards, Hl, M_h), np.float64)
            for p in range(self.n_shards):
                sel = np.nonzero(present[p])[0]
                ids_l[p, :len(sel)] = g2slot[p, hids[sel]]
                mast_l[p, :len(sel)] = g2slot[p][hmast[sel]]
                w_l[p, :len(sel)] = hw[sel]
                if (mast_l[p, :len(sel)] == trash).any():
                    raise RuntimeError(
                        "hanging-node master missing from shard closure")
            C["hc_ids"] = jnp.asarray(ids_l)
            C["hc_masters"] = jnp.asarray(mast_l)
            C["hc_weights"] = jnp.asarray(w_l, dtype)

        # ---------------- pallas kernel (optional) --------------------
        self._pallas = None
        if kernel in ("pallas", "pallas_interpret"):
            from ..ops.pallas_gls import PallasGLS
            pg = PallasGLS(space, nu, n_q1d=n_q1d,
                           supg=stab.supg, pspg=stab.pspg,
                           gls_adjoint=stab.gls_viscous_adjoint,
                           lsic=stab.lsic, dtype=dtype,
                           interpret=(kernel == "pallas_interpret"),
                           elem_coords=L.xe[0], n_elements=L.E_loc)
            self._pallas = pg
            xe_rows, h_rows = [], []
            for p in range(self.n_shards):
                xe2, h2 = pg.prep_geometry(L.xe[p])
                xe_rows.append(xe2)
                h_rows.append(h2)
            C["pg_xe"] = jnp.stack(xe_rows)
            C["pg_h"] = jnp.stack(h_rows)

        # ---------------- multigrid (optional) ------------------------
        self._mg_ops = None
        self._mg_rep = None
        if precond == "gmg" and mg is not None and len(mg[0]) >= 2:
            level_ops, mg_consts = mg
            self._mg_ops = list(level_ops[1:])
            self._mg_rep = [dict(m) for m in mg_consts[1:]]
            if self._pallas is not None:
                # the coarse levels' XLA kernel jvp materializes
                # padded [q, E, d, c] temps (42x, gigabytes at level 1
                # of a 10M-DoF run) — run them through pallas too
                for li, op in enumerate(self._mg_ops):
                    if getattr(op, "_pallas", None) is None:
                        op.enable_pallas(
                            interpret=(kernel == "pallas_interpret"))
                    self._mg_rep[li] = dict(
                        op.consts(),
                        **{k: self._mg_rep[li][k]
                           for k in ("bh_mask", "masters", "weights",
                                     "inject", "inj_masters",
                                     "inj_weights", "hc_ids",
                                     "hc_masters", "hc_weights")
                           if k in self._mg_rep[li]})
            self._wire_mg_transfers(C, mg_consts)
            import dataclasses as _dc
            self.newton_cfg = _dc.replace(self.newton_cfg, flexible=True)
        elif precond == "gmg":
            self.precond_kind = "block_jacobi"

        # per-shard element sizes for device-resident CFL (same h
        # definition as the kernel's tau; padding elements are unit
        # reference cells, masked by elem_valid)
        import math as _math
        Jh = np.einsum("peni,qnj->peqij", L.xe, np.asarray(G))
        detJh = np.linalg.det(Jh)
        volh = np.einsum("peq,q->pe", detJh, np.asarray(wts))
        if space.dim == 2:
            h_el = np.sqrt(4.0 * np.abs(volh) / _math.pi) / space.degree
        else:
            h_el = np.cbrt(6.0 * np.abs(volh) / _math.pi) / space.degree
        C["cfl_h"] = jnp.asarray(np.maximum(h_el, 1e-30), dtype)
        self._B_dev = jnp.asarray(B, dtype)

        self._C = C
        self._spec_C = {k: P(AXIS) for k in C}
        raw = self._build_step()
        self._step_jit = jax.jit(raw)
        self._tstep_jit = jax.jit(self._build_transient_step(raw))
        self._cfl_jit = jax.jit(self._build_cfl())
        self._chunk_jit = {k: jax.jit(f)
                           for k, f in self._chunk_raw.items()}

        def step(u_stack, combo_stack, mask_stack, vals_stack, t, alpha0,
                 sdt):
            if self._use_chunked():
                return self.solve_local_chunked(
                    u_stack, combo_stack, t=float(t),
                    alpha0=float(alpha0), sdt=float(sdt),
                    mask_stack=mask_stack, vals_stack=vals_stack)
            return self._step_jit(u_stack, combo_stack, mask_stack,
                                  vals_stack, t, alpha0, sdt,
                                  self._consts_full())

        def tstep(u, prevs, mask, vals0, t, alphas, sdt):
            return self._tstep_jit(u, prevs, mask, vals0, t, alphas, sdt,
                                   self._consts_full())

        self._step = step
        self._tstep = tstep

    # ------------------------------------------------------------------
    @classmethod
    def from_solver(cls, solver, devices=None, kernel: str = "auto",
                    precond: str | None = None,
                    newton: NewtonConfig | None = None, dtype=None,
                    n_shards_hint=None):
        """Wire a sharded solver from a configured single-device
        GLSNavierStokesSolver: same physics, BCs, sources, preconditioner
        family, and Newton settings."""
        precond = precond or solver.precond_kind
        mg = None
        # stagnation strikes carry over BOTH ways (see solvers/base.py
        # setup): a permanently evicted GMG stays evicted across the
        # re-shard after each Kelly cycle instead of re-wiring +
        # re-stagnating every cycle
        strikes = getattr(solver, "_gmg_strikes", 0)
        if precond == "gmg" and strikes >= 2:
            precond = "block_jacobi"
        if precond == "gmg":
            if getattr(solver, "_mg_ops", None):
                mg = (solver._mg_ops, solver._mg_consts)
            else:
                from ..ops.multigrid import build_hierarchy
                mg = build_hierarchy(solver)
            if len(mg[0]) < 2:
                precond, mg = "block_jacobi", None
        if kernel == "auto":
            kernel = ("pallas" if jax.default_backend() == "tpu"
                      else "xla")
        source_fn = None
        if solver._mms_source is not None:
            source_fn = solver._mms_source
        elif solver.source is not None:
            src, dd = solver.source, solver.dim

            def source_fn(q, t):
                return src.spatial(q, t)[..., :dd]
        ls = solver.prm.linear_solver
        return cls(
            solver.space, nu=solver.op.nu, devices=devices,
            stab=solver.op.stab, newton=newton or solver.newton_cfg,
            dtype=dtype, kernel=kernel, precond=precond,
            source_fn=source_fn, bc_exprs=solver.bh.function_entries,
            bc_mask=solver.bh.mask_np, mg=mg,
            hc=solver.hc if solver.hc.n else None,
            mg_smoother=ls.resolved_mg_smoother(
                solver.control.is_steady(),
                degree=solver.space.degree),
            mg_krylov_m=ls.mg_krylov_vectors,
            mg_cycle=ls.resolved_mg_cycle(),
            strike_parent=solver, gmg_strikes=strikes)

    # ------------------------------------------------------------------
    def _augment_mask(self, bc_mask_global):
        """Global bool mask with hanging rows OR'd in (all components)."""
        m = np.asarray(bc_mask_global, bool).copy()
        if self.hc is not None:
            m[np.asarray(self.hc.ids, np.int64)] = True
        return m.astype(np.float64)

    # ------------------------------------------------------------------
    def _global_to_slot(self):
        """[P, N_global] int32: local slot of each global node per shard
        (the trash slot where the node is absent)."""
        L = self.layout
        trash = L.N_loc - 1
        out = np.full((self.n_shards, self.space.n_nodes), trash,
                      dtype=np.int32)
        for p in range(self.n_shards):
            v = L.l2g[p]
            ok = v >= 0
            out[p, v[ok]] = np.nonzero(ok)[0].astype(np.int32)
        return out

    def _wire_mg_transfers(self, C, mg_consts):
        """Localize the level-0 <-> level-1 transfer maps per shard."""
        L = self.layout
        trash = L.N_loc - 1
        m1 = mg_consts[1]
        masters = np.asarray(m1["masters"])      # [Nf, nn_c] coarse ids
        weights = np.asarray(m1["weights"])      # [Nf, nn_c]

        ml = np.zeros((self.n_shards, L.N_loc, masters.shape[1]), np.int32)
        wl = np.zeros((self.n_shards, L.N_loc, masters.shape[1]),
                      np.float64)
        valid = L.l2g >= 0
        for p in range(self.n_shards):
            v = valid[p]
            ml[p, v] = masters[L.l2g[p, v]]
            wl[p, v] = weights[L.l2g[p, v]]
        wl[:, trash] = 0.0
        # master-major (batch-minor) storage: [P, m, N_loc]
        C["mg_masters"] = jnp.asarray(
            np.transpose(ml, (0, 2, 1)).copy())
        C["mg_weights"] = jnp.asarray(
            np.transpose(wl, (0, 2, 1)).copy(), self.dtype)

        # each fine node is OWNED by exactly one shard
        owner_arr = np.full(self.space.n_nodes, -1, np.int64)
        slot_arr = np.full(self.space.n_nodes, trash, np.int64)
        own = L.owned_mask > 0
        for p in range(self.n_shards):
            ids = L.l2g[p, own[p]]
            owner_arr[ids] = p
            slot_arr[ids] = np.nonzero(own[p])[0]

        if "inject" in m1:
            # structured hierarchy: coarse node k samples ONE fine node
            inject = np.asarray(m1["inject"])    # [Nc] fine ids
            Nc = inject.shape[0]
            inj_owner = owner_arr[inject]
            inj_slot = slot_arr[inject]
            counts = [int(np.sum(inj_owner == p))
                      for p in range(self.n_shards)]
            K = max(1, max(counts))
            inj_rows = np.full((self.n_shards, K), Nc, np.int32)  # pad Nc
            inj_slots = np.full((self.n_shards, K), trash, np.int32)
            for p in range(self.n_shards):
                sel = np.nonzero(inj_owner == p)[0]
                inj_rows[p, :len(sel)] = sel
                inj_slots[p, :len(sel)] = inj_slot[sel]
            C["mg_inj_rows"] = jnp.asarray(inj_rows)
            C["mg_inj_slots"] = jnp.asarray(inj_slots)
        else:
            # forest hierarchy: coarse node k INTERPOLATES fine nodes
            # (GLL lattices are not nested); each fine node contributes
            # from its owner shard, psum merges the replicated rows
            im = np.asarray(m1["inj_masters"])   # [Nc, K] fine ids
            iw = np.asarray(m1["inj_weights"])   # [Nc, K]
            Nc = im.shape[0]
            g2l = np.full((self.n_shards, self.space.n_nodes), trash,
                          np.int64)
            for p in range(self.n_shards):
                v = valid[p]
                g2l[p, L.l2g[p, v]] = np.nonzero(v)[0]
            slots2 = np.full((self.n_shards,) + im.shape, trash,
                             np.int32)
            w2 = np.zeros((self.n_shards,) + im.shape, np.float64)
            for p in range(self.n_shards):
                mine = owner_arr[im] == p
                slots2[p] = np.where(mine, g2l[p][im], trash)
                w2[p] = iw * mine
            # K-major so each term is a plain [Nc]-gather: [P, K, Nc]
            C["mg_istate_slots"] = jnp.asarray(
                np.transpose(slots2, (0, 2, 1)).copy())
            C["mg_istate_w"] = jnp.asarray(
                np.transpose(w2, (0, 2, 1)).copy(), self.dtype)
        self._mg_nc1 = Nc

        # RESTRICTION as per-coarse-node child GATHERS: invert the
        # (fine -> masters) map so rc[k] = sum_j w_j[k] res[child_j[k]].
        # The forward form needs nn_c serialized scatter-adds over the
        # coarse vector (RMW chains, ~29 ms/V-cycle at 1.1M DoF); the
        # gather form is embarrassingly parallel.  Each fine node
        # contributes from its OWNER shard (res is owned-masked) and the
        # psum merges coarse rows.
        children: list[list] = [[] for _ in range(Nc)]
        for f in range(masters.shape[0]):
            for m in range(masters.shape[1]):
                w = float(weights[f, m])
                if w != 0.0:
                    children[int(masters[f, m])].append((f, w))
        Kc = max(1, max(len(ch) for ch in children))
        cs = np.full((self.n_shards, Kc, Nc), trash, np.int32)
        cw = np.zeros((self.n_shards, Kc, Nc), np.float64)
        g2l = np.full((self.n_shards, self.space.n_nodes), -1,
                      np.int64)
        for p in range(self.n_shards):
            v = valid[p]
            g2l[p, L.l2g[p, v]] = np.nonzero(v)[0]
        for p in range(self.n_shards):
            for k, ch in enumerate(children):
                for j, (f, w) in enumerate(ch):
                    sl = g2l[p, f]
                    if sl >= 0:
                        cs[p, j, k] = sl
                        cw[p, j, k] = w
        C["mg_child_slots"] = jnp.asarray(cs)
        C["mg_child_w"] = jnp.asarray(cw, self.dtype)

    # ------------------------------------------------------------------
    def _spec_full(self):
        spec = dict(self._spec_C)
        if self._mg_rep is not None:
            spec["mg_rep"] = jax.tree.map(lambda _: P(), self._mg_rep)
        return spec

    def _consts_full(self):
        C = dict(self._C)
        if self._mg_rep is not None:
            C["mg_rep"] = self._mg_rep
        return C

    # ------------------------------------------------------------------
    def _build_step(self):
        L = self.layout
        Pn = self.n_shards
        trash = L.N_loc - 1
        cfg = self.newton_cfg
        nc = self.nc
        d = self.dim
        nn = self.nn
        deltas = self._deltas
        n_ex = len(deltas)
        n_q = self.n_q
        batched = self._batched
        pg = self._pallas
        source_fn = self.source_fn
        bc_exprs = self._bc_exprs
        use_mg = self._mg_ops is not None
        use_hc = self.hc is not None
        dtype = self.dtype
        precond_kind = self.precond_kind

        def perm(delta):
            return [(i, (i + delta) % Pn) for i in range(Pn)]

        def make_local_fns(C):
            en_t = C["en_t"]                     # [nn, E]
            elem_valid = C["elem_valid"]         # [E]
            owned = C["owned"]                   # [N]
            amap_bm = C["amap_bm"]               # [M, N]
            xe_soa = C["xe_soa"]                 # [nn, d, E]
            sends = [C[f"send{k}"] for k in range(n_ex)]
            recvs = [C[f"recv{k}"] for k in range(n_ex)]
            M = amap_bm.shape[0]
            E = en_t.shape[-1]

            def gather_soa(u, ncomp):
                """u[N, c*] -> SoA [nn, ncomp, E] via per-node gathers
                (a direct u[elem_nodes] materializes [E, nn, c] whose
                tiny minor dims tile-pad 32x at rest)."""
                return jnp.stack(
                    [u[en_t[n], :ncomp].T for n in range(nn)])

            def assemble_bm(r_bm):
                """[c*, nn, E] element rows -> assembled [c*, N]
                (gathers on the MINOR axis; index n*E + e)."""
                cstar = r_bm.shape[0]
                flat = r_bm.reshape(cstar, nn * E)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((cstar, 1), flat.dtype)], axis=1)
                out = flat[:, amap_bm[0]]
                for m in range(1, M):
                    out = out + flat[:, amap_bm[m]]
                return out

            def zero_trash(a):
                return a.at[trash].set(0.0)

            def refresh(u):
                """Copy owner values into ghost slots (Import)."""
                for send_i, recv_i, delta in zip(sends, recvs, deltas):
                    got = lax.ppermute(u[send_i], AXIS, perm(delta))
                    u = u.at[recv_i].set(got)
                return zero_trash(u)

            def combine(r):
                """Add ghost partial sums into owner slots (compress)."""
                for send_i, recv_i, delta in zip(sends, recvs, deltas):
                    got = lax.ppermute(r[recv_i], AXIS, perm(-delta))
                    r = r.at[send_i].add(got)
                return zero_trash(r)

            # hanging-node constraint rows, shard-local (no-ops on
            # conforming meshes).  distribute runs AFTER refresh (masters
            # are ghosts with fresh owner values); the transpose runs on
            # the LOCAL partial residual BEFORE combine — the transpose
            # is linear, so moving each shard's partials onto (possibly
            # ghost) master slots and psum-combining equals the global
            # condensation of the single-device path.
            if use_hc:
                h_ids = C["hc_ids"]               # [H] local slots
                h_mast = C["hc_masters"]          # [H, M]
                h_w = C["hc_weights"]             # [H, M]

                def hc_distribute(u):
                    vals = jnp.einsum("hm,hmc->hc", h_w, u[h_mast])
                    return u.at[h_ids].set(vals)

                def hc_transpose(r):
                    rh = r[h_ids]                              # [H, c]
                    r = r.at[h_mast].add(
                        h_w[:, :, None] * rh[:, None, :])
                    return r.at[h_ids].set(0.0)
            else:
                hc_distribute = hc_transpose = lambda x: x

            def rows_from_soa(soa):
                """[k1, k2, E] -> pallas row layout [k1*k2, Eg, S, L]."""
                k = soa.shape[0] * soa.shape[1]
                flat = soa.reshape(k, E)
                padn = pg.Ep - E
                if padn:
                    flat = jnp.concatenate(
                        [flat, jnp.zeros((k, padn), flat.dtype)], axis=1)
                from ..ops.pallas_gls import S as _S, L as _L
                return flat.reshape(k, pg.Eg, _S, _L)

            def kernel_soa(ue_soa, upe_soa, fq_soa, alpha0, sdt):
                """SoA residual [nn, c, E] (pallas or XLA path)."""
                if pg is not None:
                    r2 = pg.residual_rows(
                        rows_from_soa(ue_soa), rows_from_soa(upe_soa),
                        rows_from_soa(fq_soa), alpha0, sdt,
                        xe2=C["pg_xe"], h2=C["pg_h"])
                    return r2.reshape(nn, nc, pg.Ep)[:, :, :E]
                return batched(ue_soa, xe_soa, upe_soa, fq_soa,
                               alpha0, sdt)

            def residual(u, bc_mask, uprev, fq_soa, alpha0, sdt):
                u = hc_distribute(refresh(u))
                ue = gather_soa(u, nc)
                upe = gather_soa(refresh(uprev), d)
                r = kernel_soa(ue, upe, fq_soa, alpha0, sdt)
                r = r * elem_valid
                r = assemble_bm(jnp.transpose(r, (1, 0, 2)))   # [c, N]
                r = hc_transpose(r.T)
                r = combine(r) * owned[:, None]
                return jnp.where(bc_mask, 0.0, r)

            def node_block_inv(u, bc_mask, uprev, fq_soa, alpha0, sdt):
                """Per-node (d+1)x(d+1) INVERSE blocks, batch-minor
                [c, c, N_loc] — jvp probes of the batched kernel (the
                single-device fast path, sharded).  Batch-minor storage
                keeps the persistent Krylov-loop state exactly tiled."""
                from ..ops.batched_kernel import node_blocks_batched_bm
                from ..ops.smallmat import det_bm, inv_bm
                u = hc_distribute(refresh(u))
                ue = gather_soa(u, nc)
                upe = gather_soa(refresh(uprev), d)
                if pg is not None and not pg.interpret:
                    # fused tangent-kernel probes (one pallas launch per
                    # (node, comp) probe) — the chunked XLA-jvp loop was
                    # the dominant cost of the sharded Newton step;
                    # interpret mode keeps the XLA probes (32 interpreted
                    # launches would crawl on the CPU test mesh)
                    br = pg.node_block_rows(
                        rows_from_soa(ue), rows_from_soa(upe),
                        rows_from_soa(fq_soa), alpha0, sdt,
                        xe2=C["pg_xe"], h2=C["pg_h"])
                    cc = nc * nc
                    blocks_el = jnp.transpose(
                        br.reshape(nn, cc, pg.Ep)[:, :, :E], (1, 0, 2))
                else:
                    blocks_el = node_blocks_batched_bm(
                        batched, ue, xe_soa, upe, fq_soa, alpha0, sdt)
                # [cc, nn, E] * validity and Dirichlet keep masks
                blocks_el = blocks_el * elem_valid
                mk = 1.0 - bc_mask.astype(dtype)                # [N, c]
                keep = jnp.stack(
                    [mk[en_t[n]].T for n in range(nn)], axis=1)
                # keep[c, nn, E]; keep2[(i,j)] = keep_i * keep_j
                keep2 = jnp.concatenate(
                    [keep[i][None] * keep for i in range(nc)], axis=0)
                blocks = assemble_bm(blocks_el * keep2)         # [cc, N]
                blocks = combine(blocks.T).T.reshape(nc, nc, -1)
                # constrained components act as identity
                mrow = bc_mask.astype(dtype)
                for i in range(nc):
                    blocks = blocks.at[i, i].add(mrow[:, i])
                deg = (jnp.abs(det_bm(blocks)) < 1e-300) | (owned < 0.5)
                eye_bm = jnp.eye(nc, dtype=dtype)[:, :, None]
                blocks = jnp.where(deg[None, None, :], eye_bm, blocks)
                return inv_bm(blocks)

            def finalize(u):
                """Owner-consistent ghosts + hanging values on the
                returned solution."""
                return hc_distribute(refresh(u))

            return residual, node_block_inv, finalize

        # ------------------ GMG V-cycle (optional) --------------------
        mg_ops = self._mg_ops
        mg_nc1 = getattr(self, "_mg_nc1", 0)

        def make_gmg_builder(C, bc_mask, combo, fq, alpha0, sdt,
                             residual, node_block_inv, reduce_fn,
                             n_smooth: int = 1, omega: float = 0.7):
            from ..ops.multigrid import make_vcycle
            from ..ops.smallmat import apply_bm
            mg_rep = C["mg_rep"]
            owned = C["owned"]
            masters = C["mg_masters"]         # [nn_c, N_loc] coarse ids
            weights = C["mg_weights"]         # [nn_c, N_loc]
            child_slots = C["mg_child_slots"]   # [Kc, Nc1]
            child_w = C["mg_child_w"]           # [Kc, Nc1]
            mask1 = mg_rep[0]["bh_mask"]
            op1 = mg_ops[0]
            nm = masters.shape[0]
            Kc = child_slots.shape[0]

            # hanging constraints of the FIRST COARSE level (forest
            # hierarchies; replicated arrays, global coarse numbering)
            h1 = mg_rep[0].get("hc_ids")
            use_hc1 = h1 is not None and h1.shape[0] > 0
            if use_hc1:
                h1m = mg_rep[0]["hc_masters"]
                h1w = mg_rep[0]["hc_weights"]

            def hc1_distribute(vc):
                if not use_hc1:
                    return vc
                vals = jnp.einsum("hm,hmc->hc", h1w, vc[h1m])
                return vc.at[h1].set(vals)

            def hc1_transpose(rc):
                if not use_hc1:
                    return rc
                rh = rc[h1]
                rc = rc.at[h1m].add(h1w[:, :, None] * rh[:, None, :])
                return rc.at[h1].set(0.0)

            if "mg_inj_rows" in C:
                inj_rows = C["mg_inj_rows"]
                inj_slots = C["mg_inj_slots"]

                def to_coarse_state(a):
                    """Replicated [Nc1, c] from shard-local rows via psum
                    (each coarse row is written by exactly one shard)."""
                    c = a.shape[-1]
                    out = jnp.zeros((mg_nc1 + 1, c), a.dtype)
                    out = out.at[inj_rows].set(a[inj_slots])
                    return reduce_fn(out[:mg_nc1])
            else:
                ist_slots = C["mg_istate_slots"]   # [K, Nc1]
                ist_w = C["mg_istate_w"]           # [K, Nc1]

                def to_coarse_state(a):
                    """Replicated interpolation of the fine state at the
                    coarse nodes (forest hierarchies): owner-weighted
                    local gathers + psum."""
                    out = sum(ist_w[k][:, None] * a[ist_slots[k]]
                              for k in range(ist_slots.shape[0]))
                    return reduce_fn(out)

            mg_smoother = self._mg_smoother
            krylov_m = self._mg_krylov_m

            def builder(u):
                binv = node_block_inv(u, bc_mask, combo, fq, alpha0, sdt)

                def smooth(r):
                    return apply_bm(binv, r) * owned[:, None]

                # linearize ONCE per builder: the V-cycle applies this
                # matvec twice per FGMRES iteration, and jvp would re-run
                # the primal kernel each time
                f = lambda w: residual(w, bc_mask, combo, fq,
                                       alpha0, sdt)
                _, f_lin = jax.linearize(f, u)

                def matvec(v):
                    return f_lin(jnp.where(bc_mask, 0.0, v)) \
                        + jnp.where(bc_mask, v, 0.0)

                def kry_smooth(r, z0):
                    """GMRES(m) fine-level smooth (psum dots) — the
                    sharded mirror of ops.multigrid.make_vcycle's
                    krylov smoother, so 1-vs-N iterates match."""
                    from ..ops.linalg import gmres
                    shp = r.shape
                    sol, _, _ = gmres(
                        lambda x: matvec(x.reshape(shp)).reshape(-1),
                        r.reshape(-1),
                        x0=None if z0 is None else z0.reshape(-1),
                        precond=lambda x: smooth(
                            x.reshape(shp)).reshape(-1),
                        m=krylov_m, max_restarts=1, atol=1e-30,
                        reduce_fn=reduce_fn)
                    return sol.reshape(shp)

                uc = to_coarse_state(u * owned[:, None])
                cc = to_coarse_state(combo * owned[:, None])
                fqc = jnp.zeros((op1.space.n_elements, op1.n_q, d),
                                u.dtype)
                coarse_apply = make_vcycle(
                    mg_ops, smoother=mg_smoother, krylov_m=krylov_m,
                    cycle=self._mg_cycle, level_offset=1)(
                    uc, cc, fqc, alpha0, sdt, mask1, mg_rep)

                def apply(r):
                    if mg_smoother == "krylov":
                        z = kry_smooth(r, None)
                    else:
                        z = omega * smooth(r)
                        for _ in range(n_smooth - 1):
                            z = z + omega * smooth(r - matvec(z))
                    res = r - matvec(z)
                    res = res * owned[:, None]
                    # restriction by child gathers (no RMW chain)
                    rc = sum(child_w[j][:, None] * res[child_slots[j]]
                             for j in range(Kc))
                    rc = reduce_fn(rc)
                    rc = hc1_transpose(rc)
                    rc = jnp.where(mask1, 0.0, rc)
                    zc = coarse_apply(rc)
                    # constrained coarse rows carry zeros in the cycle:
                    # fill from masters before interpolating up
                    zc = hc1_distribute(zc)
                    zf = sum(weights[m][:, None] * zc[masters[m]]
                             for m in range(nm))
                    z = z + jnp.where(bc_mask, 0.0, zf) * owned[:, None]
                    if mg_smoother == "krylov":
                        z = kry_smooth(r, z)
                    else:
                        z = z + omega * smooth(r - matvec(z))
                    return z

                return apply

            return builder

        # -------------------- the sharded local step ------------------
        def prepare(u, combo, mask, vals0, t, alpha0, sdt, C):
            """Shared preamble of every sharded Newton program: strip
            the shard axis, constrain u, evaluate the body force, wire
            residual/preconditioner closures."""
            # strip the leading size-1 shard axis of P(AXIS) blocks
            mg_rep = C.pop("mg_rep", None)
            C = {k: v[0] for k, v in C.items()}
            if mg_rep is not None:
                C["mg_rep"] = mg_rep
            u, combo, mask, vals0 = u[0], combo[0], mask[0], vals0[0]
            residual, node_block_inv, finalize = make_local_fns(C)
            reduce_fn = partial(lax.psum, axis_name=AXIS)

            # Dirichlet values: static + deck expressions at time t
            vals = vals0
            for bi, exprs in enumerate(bc_exprs):
                slots = C[f"bc_slots{bi}"]
                pts = C["coords"][slots]
                for ci, e in enumerate(exprs):
                    vals = vals.at[slots, ci].set(
                        e.spatial(pts, t).astype(vals.dtype))
            vals = vals.at[trash].set(0.0)
            u = jnp.where(mask, vals, u)

            # body force at shard-local quadrature points, SoA [nq, d, E]
            qb = C["qpts_bm"]                        # [d, nq*E]
            E_l = qb.shape[-1] // n_q
            if source_fn is not None:
                f = source_fn(qb.T, t).astype(dtype)     # [nq*E, d]
                fq = jnp.transpose(
                    f.T.reshape(d, n_q, E_l), (1, 0, 2))
            else:
                fq = jnp.zeros((n_q, d, E_l), dtype)

            res_fn = lambda v: residual(v, mask, combo, fq, alpha0, sdt)

            from ..ops.smallmat import apply_bm
            if use_mg:
                precond_builder = make_gmg_builder(
                    C, mask, combo, fq, alpha0, sdt,
                    residual, node_block_inv, reduce_fn)
            elif precond_kind == "jacobi":
                def precond_builder(v):
                    binv = node_block_inv(v, mask, combo, fq,
                                          alpha0, sdt)
                    dinv = jnp.stack([binv[i, i] for i in range(nc)],
                                     axis=-1)            # [N, c]

                    def apply(w):
                        return w * dinv * C["owned"][:, None]
                    return apply
            else:
                def precond_builder(v):
                    binv = node_block_inv(v, mask, combo, fq,
                                          alpha0, sdt)

                    def apply(w):
                        return apply_bm(binv, w) * C["owned"][:, None]
                    return apply

            return u, res_fn, precond_builder, finalize, reduce_fn

        def local_step(u, combo, mask, vals0, t, alpha0, sdt, C):
            u, res_fn, precond_builder, finalize, reduce_fn = prepare(
                u, combo, mask, vals0, t, alpha0, sdt, C)
            out = newton_solve(res_fn, u, precond_builder=precond_builder,
                               config=cfg, reduce_fn=reduce_fn)
            return (finalize(out.u)[None], out.res_history[None],
                    out.n_iterations[None], out.linear_iters[None])

        # ---- host-chunked variants (watchdog-bounded runtimes): one
        # device program per Krylov restart cycle / line search, exactly
        # mirroring solvers/base.py _newton_chunked but under shard_map
        def local_init(u, combo, mask, vals0, t, alpha0, sdt, C):
            u, res_fn, _, _, reduce_fn = prepare(
                u, combo, mask, vals0, t, alpha0, sdt, C)
            R = res_fn(u)
            rnorm = jnp.sqrt(reduce_fn(jnp.sum(R * R)))
            return u[None], R[None], rnorm[None]

        def local_cycle(u, R, x, atol, combo, mask, vals0, t, alpha0,
                        sdt, C):
            from ..solvers.newton import newton_linear_cycle
            u, res_fn, precond_builder, _, reduce_fn = prepare(
                u, combo, mask, vals0, t, alpha0, sdt, C)
            x, lrn, j = newton_linear_cycle(
                res_fn, u, R[0], x[0], atol, config=cfg,
                precond=precond_builder(u), reduce_fn=reduce_fn)
            return x[None], lrn[None], j[None]

        def local_update(u, R, x, rnorm, combo, mask, vals0, t, alpha0,
                         sdt, C):
            from ..solvers.newton import newton_apply_update
            u, res_fn, _, _, reduce_fn = prepare(
                u, combo, mask, vals0, t, alpha0, sdt, C)
            u, R, rnorm, alpha = newton_apply_update(
                res_fn, u, x[0], rnorm[0], config=cfg,
                reduce_fn=reduce_fn)
            return u[None], R[None], rnorm[None], alpha[None]

        def local_finalize(u, combo, mask, vals0, t, alpha0, sdt, C):
            u, _, _, finalize, _ = prepare(
                u, combo, mask, vals0, t, alpha0, sdt, C)
            return finalize(u)[None]

        # node-block preconditioner STATE programs: the chunked driver
        # builds the (expensive) jvp-probe block inverses ONCE per
        # Newton iteration and threads them through every restart
        # cycle, instead of rebuilding inside each cycle program
        def local_pstate(u, combo, mask, vals0, t, alpha0, sdt, C):
            C.pop("mg_rep", None)
            C = {k: v[0] for k, v in C.items()}
            u, combo, mask, vals0 = u[0], combo[0], mask[0], vals0[0]
            _, node_block_inv, _ = make_local_fns(C)
            vals = vals0
            for bi, exprs in enumerate(bc_exprs):
                slots = C[f"bc_slots{bi}"]
                pts = C["coords"][slots]
                for ci, e in enumerate(exprs):
                    vals = vals.at[slots, ci].set(
                        e.spatial(pts, t).astype(vals.dtype))
            vals = vals.at[trash].set(0.0)
            u = jnp.where(mask, vals, u)
            qb = C["qpts_bm"]
            E_l = qb.shape[-1] // n_q
            if source_fn is not None:
                f = source_fn(qb.T, t).astype(dtype)
                fq = jnp.transpose(f.T.reshape(d, n_q, E_l), (1, 0, 2))
            else:
                fq = jnp.zeros((n_q, d, E_l), dtype)
            return node_block_inv(u, mask, combo, fq, alpha0, sdt)[None]

        def local_cycle_state(u, R, x, atol, binv, combo, mask, vals0,
                              t, alpha0, sdt, C):
            from ..solvers.newton import newton_linear_cycle
            from ..ops.smallmat import apply_bm
            owned = C["owned"][0]
            u, res_fn, _, _, reduce_fn = prepare(
                u, combo, mask, vals0, t, alpha0, sdt, C)
            binv = binv[0]
            if precond_kind == "jacobi":
                dinv = jnp.stack([binv[i, i] for i in range(nc)],
                                 axis=-1)
                pre = lambda w: w * dinv * owned[:, None]
            else:
                pre = lambda w: apply_bm(binv, w) * owned[:, None]
            x, lrn, j = newton_linear_cycle(
                res_fn, u, R[0], x[0], atol, config=cfg,
                precond=pre, reduce_fn=reduce_fn)
            return x[None], lrn[None], j[None]

        state_specs = (P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(),
                       self._spec_full())
        self._chunk_raw = {
            "init": shard_map(local_init, self.mesh,
                              in_specs=state_specs,
                              out_specs=(P(AXIS), P(AXIS), P(AXIS))),
            "cycle": shard_map(local_cycle, self.mesh,
                               in_specs=(P(AXIS), P(AXIS), P(AXIS), P())
                               + state_specs[1:],
                               out_specs=(P(AXIS), P(AXIS), P(AXIS))),
            "pstate": shard_map(local_pstate, self.mesh,
                                in_specs=state_specs,
                                out_specs=P(AXIS)),
            "cycle_state": shard_map(
                local_cycle_state, self.mesh,
                in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(AXIS))
                + state_specs[1:],
                out_specs=(P(AXIS), P(AXIS), P(AXIS))),
            "update": shard_map(local_update, self.mesh,
                                in_specs=(P(AXIS), P(AXIS), P(AXIS),
                                          P(AXIS)) + state_specs[1:],
                                out_specs=(P(AXIS),) * 4),
            "finalize": shard_map(local_finalize, self.mesh,
                                  in_specs=state_specs,
                                  out_specs=P(AXIS)),
        }

        # single residual evaluation (debug/parity checks, norms)
        def local_residual(u, combo, mask, vals0, t, alpha0, sdt, C):
            mg_rep = C.pop("mg_rep", None)
            C = {k: v[0] for k, v in C.items()}
            u, combo, mask, vals0 = u[0], combo[0], mask[0], vals0[0]
            residual, _, _ = make_local_fns(C)
            vals = vals0
            for bi, exprs in enumerate(bc_exprs):
                slots = C[f"bc_slots{bi}"]
                pts = C["coords"][slots]
                for ci, e in enumerate(exprs):
                    vals = vals.at[slots, ci].set(
                        e.spatial(pts, t).astype(vals.dtype))
            vals = vals.at[trash].set(0.0)
            u = jnp.where(mask, vals, u)
            qb = C["qpts_bm"]
            E_l = qb.shape[-1] // n_q
            if source_fn is not None:
                f = source_fn(qb.T, t).astype(dtype)
                fq = jnp.transpose(f.T.reshape(d, n_q, E_l), (1, 0, 2))
            else:
                fq = jnp.zeros((n_q, d, E_l), dtype)
            return residual(u, mask, combo, fq, alpha0, sdt)[None]

        self._residual_jit = jax.jit(shard_map(
            local_residual, self.mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(),
                      self._spec_full()),
            out_specs=P(AXIS)))

        # the shard_map-wrapped raw function: consts arrive as ARGUMENTS
        # (closing over them inside jit would embed every index/geometry
        # array as an HLO literal — O(N) module text, and the remote
        # compiler rejects the oversized program)
        return shard_map(
            local_step, self.mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(), P(), P(),
                      self._spec_full()),
            out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)))

    # ------------------------------------------------------------------
    def _build_transient_step(self, raw_step):
        """One BDF step on stacked state: combo from the history inside
        jit, then the sharded Newton solve, then history rotation."""
        d = self.dim

        def tstep(u, prevs, mask, vals0, t, alphas, sdt, C):
            combo = (alphas[1] * prevs[0][..., :d]
                     + alphas[2] * prevs[1][..., :d]
                     + alphas[3] * prevs[2][..., :d])
            u_new, hist, iters, lin = raw_step(
                u, combo, mask, vals0, t, alphas[0], sdt, C)
            prevs_new = jnp.stack([u_new, prevs[0], prevs[1]])
            return u_new, prevs_new, hist, iters, lin

        return tstep

    # ------------------------------------------------------------------
    def _build_cfl(self):
        """Sharded max |u_q| / h over elements (for CFL-adaptive dt:
        one pmax scalar leaves the device per step, nothing else)."""
        B = self._B_dev
        nn, d = self.nn, self.dim

        def local_cfl(u, C):
            C = {k: v[0] for k, v in C.items()}
            u = u[0]
            en_t = C["en_t"]
            ue = jnp.stack([u[en_t[n], :d].T for n in range(nn)])
            uq = jnp.einsum("qn,ndE->qdE", B, ue)
            speed = jnp.sqrt(jnp.sum(uq * uq, axis=1))       # [q, E]
            val = jnp.max(speed / C["cfl_h"][None, :]
                          * C["elem_valid"][None, :])
            return lax.pmax(val, AXIS)[None]

        return shard_map(
            local_cfl, self.mesh,
            in_specs=(P(AXIS), self._spec_C), out_specs=P(AXIS))

    def cfl(self, u_stack, dt: float) -> float:
        """CFL number of the stacked state at step size dt."""
        v = self._cfl_jit(u_stack, self._C)
        return float(np.asarray(v)[0]) * dt

    def _use_chunked(self) -> bool:
        """Same policy as solvers/base.py _use_chunked_newton: chunk on
        watchdog-bounded TPU runtimes above a DoF threshold, or force
        with SOFTX_NEWTON_CHUNK=1/0."""
        import os
        flag = os.environ.get("SOFTX_NEWTON_CHUNK", "")
        if flag == "1":
            return True
        if flag == "0":
            return False
        try:
            backend = jax.default_backend()
        except Exception:
            return False
        thresh = int(os.environ.get("SOFTX_CHUNK_THRESHOLD", "100000"))
        n_dofs = self.layout.n_nodes_global * self.nc
        # watchdog-bounded single programs are a TPU-relay property;
        # other backends keep the fused zero-host-sync driver
        return backend == "tpu" and n_dofs >= thresh

    def bdf_step(self, u_stack, prevs_stack, t: float, dts, order: int):
        """One variable-dt BDF step on stacked device state.  Returns
        (u_new, prevs_new, res_history, n_iterations, linear_iters)."""
        from ..core.bdf import bdf_coefficients
        eff = max(1, min(int(order), 3))
        a = np.asarray(bdf_coefficients(eff, list(dts)[:eff]))
        alphas = np.zeros(4)
        alphas[:eff + 1] = a
        if self._use_chunked():
            d = self.dim
            combo = (alphas[1] * prevs_stack[0][..., :d]
                     + alphas[2] * prevs_stack[1][..., :d]
                     + alphas[3] * prevs_stack[2][..., :d])
            u_new, hist, iters, lin = self.solve_local_chunked(
                u_stack, combo, t=t, alpha0=float(alphas[0]),
                sdt=1.0 / dts[0])
            prevs_new = jnp.stack([u_new, prevs_stack[0],
                                   prevs_stack[1]])
            return u_new, prevs_new, hist, iters, lin
        return self._tstep(
            u_stack, prevs_stack, self._mask_stack, self._zero_vals,
            jnp.asarray(t, self.dtype), jnp.asarray(alphas, self.dtype),
            jnp.asarray(1.0 / dts[0], self.dtype))

    def sdirk_step(self, u_stack, t_old: float, dt: float, order: int):
        """One SDIRK22/SDIRK33 step on stacked device state (stage
        sequencing identical to the single-device engine,
        solvers/base.py::solve_sdirk_step)."""
        from ..core.sdirk import sdirk_coefficients
        table = sdirk_coefficients(order, dt)
        A = table[:, :order]
        c = table[:, order]
        d = self.dim
        u_n = u_stack
        u = u_stack
        ks = []
        hist = iters = lin = None
        for s_i in range(order):
            gamma = float(A[s_i, s_i])
            alpha0 = 1.0 / (dt * gamma)
            combo = -u_n[..., :d] * alpha0
            for j in range(s_i):
                combo = combo - (float(A[s_i, j]) / gamma) * ks[j]
            t_stage = t_old + float(c[s_i]) * dt
            u_s, hist, iters, lin = self.solve_local(
                u, combo, t=t_stage, alpha0=alpha0, sdt=1.0 / dt)
            ks.append(alpha0 * u_s[..., :d] + combo)
            u = u_s
        return u, hist, iters, lin

    # ------------------------------------------------------------------
    # host-facing API
    # ------------------------------------------------------------------
    def to_local(self, u_global):
        return jnp.asarray(self.layout.to_local(
            np.asarray(u_global, dtype=self.dtype)))

    def to_global(self, u_stack):
        return self.layout.to_global(np.asarray(u_stack))

    # ------------------------------------------------------------------
    # per-shard checkpoint (reference §5.4 parallel restart: each rank
    # serializes its locally-owned slice; no rank ever assembles the
    # global state)
    # ------------------------------------------------------------------
    def write_checkpoint_shards(self, path: str, u_stack,
                                prevs_stack) -> None:
        """Shard p writes ONLY its owned rows + their global ids to
        ``<path>.shard{p}.npz`` (atomic temp+rename).  Host high-water
        is one shard's slice (~1/P of the global state): shards are
        pulled off-device one at a time.  The forest/control/pvd
        manifest is written separately (``write_checkpoint(None, None)``)."""
        L = self.layout
        n_prev = int(prevs_stack.shape[0])
        for p in range(L.n_shards):
            own = np.asarray(L.owned_mask[p] > 0)
            gids = L.l2g[p][own]
            u_p = np.asarray(u_stack[p])[own]          # one-shard pull
            prev_p = np.stack([np.asarray(prevs_stack[i][p])[own]
                               for i in range(n_prev)])
            f = f"{path}.shard{p}.npz"
            np.savez(f + ".tmp", gids=gids, u=u_p, prev=prev_p)
            os.replace(f + ".tmp.npz", f)
        # drop stale files from an earlier run with more shards — the
        # restore glob must see exactly this checkpoint's set
        import glob
        for f in glob.glob(path + ".shard*.npz"):
            try:
                p = int(f.rsplit(".shard", 1)[1].split(".")[0])
            except ValueError:
                continue
            if p >= L.n_shards:
                os.remove(f)

    @staticmethod
    def read_checkpoint_shards(path: str, layout, dtype):
        """Reassemble local stacks from per-shard files written under
        ANY device count: every valid local row (owned AND ghost) is
        filled from whichever old shard owned it, so no ghost refresh
        is needed before stepping.  Streams one old file at a time."""
        import glob
        files = sorted(glob.glob(path + ".shard*.npz"))
        if not files:
            raise FileNotFoundError(path + ".shard*.npz")
        P, N_loc = layout.n_shards, layout.N_loc
        with np.load(files[0]) as d0:
            c = d0["u"].shape[-1]
            n_prev = d0["prev"].shape[0]
        u = np.zeros((P, N_loc, c), dtype)
        prevs = np.zeros((n_prev, P, N_loc, c), dtype)
        valid = [layout.l2g[q] >= 0 for q in range(P)]
        for f in files:
            with np.load(f) as d:
                gids, u_p, prev_p = d["gids"], d["u"], d["prev"]
            order = np.argsort(gids)
            gs = gids[order]
            for q in range(P):
                rows = layout.l2g[q][valid[q]]
                pos = np.searchsorted(gs, rows)
                posc = np.minimum(pos, len(gs) - 1)
                hit = (pos < len(gs)) & (gs[posc] == rows)
                if not hit.any():
                    continue
                li = np.nonzero(valid[q])[0][hit]
                src = order[posc[hit]]
                u[q, li] = u_p[src]
                for i in range(n_prev):
                    prevs[i, q, li] = prev_p[i][src]
        return u, prevs

    def solve(self, u0_global, bc_mask_global=None, bc_vals_global=None,
              uprev_combo_global=None, alpha0=0.0, sdt=0.0, t=0.0):
        """One distributed Newton solve from GLOBAL host arrays.

        Returns (u_global [N, c], res_history, n_iterations, linear_iters).
        For device-resident stepping use :meth:`solve_local` /
        :meth:`run_transient` instead.
        """
        L = self.layout
        u = self.to_local(u0_global)
        mask = (self._mask_stack if bc_mask_global is None else
                jnp.asarray(L.to_local(
                    self._augment_mask(bc_mask_global)) > 0.5))
        vals = (self._zero_vals if bc_vals_global is None else
                self.to_local(bc_vals_global))
        if uprev_combo_global is None:
            uprev_combo_global = np.zeros(
                (L.n_nodes_global, self.dim), dtype=self.dtype)
        prev = self.to_local(uprev_combo_global)
        u_new, hist, iters, lin = self._step(
            u, prev, mask, vals, jnp.asarray(t, self.dtype),
            jnp.asarray(alpha0, self.dtype), jnp.asarray(sdt, self.dtype))
        u_g = self.to_global(u_new)
        return u_g, np.asarray(hist)[0], int(np.asarray(iters)[0]), \
            int(np.asarray(lin)[0])

    def residual_global(self, u_global, uprev_combo_global=None,
                        t=0.0, alpha0=0.0, sdt=0.0):
        """Sharded constrained residual gathered to a global [N, c]
        array (parity/diagnostic path)."""
        L = self.layout
        u = self.to_local(u_global)
        if uprev_combo_global is None:
            uprev_combo_global = np.zeros(
                (L.n_nodes_global, self.dim), dtype=self.dtype)
        prev = self.to_local(uprev_combo_global)
        r = self._residual_jit(u, prev, self._mask_stack,
                               self._zero_vals,
                               jnp.asarray(t, self.dtype),
                               jnp.asarray(alpha0, self.dtype),
                               jnp.asarray(sdt, self.dtype),
                               self._consts_full())
        return self.to_global(r)

    def solve_local(self, u_stack, combo_stack, t=0.0, alpha0=0.0,
                    sdt=0.0):
        """Device-resident solve on stacked [P, N_loc, c] state."""
        return self._step(u_stack, combo_stack, self._mask_stack,
                          self._zero_vals, jnp.asarray(t, self.dtype),
                          jnp.asarray(alpha0, self.dtype),
                          jnp.asarray(sdt, self.dtype))

    def _disable_gmg(self):
        """Swap a stagnating GMG preconditioner for block-Jacobi and
        rebuild the jitted steps (same policy/measurement as
        solvers/base.py ``_gmg_fallback``: on steady strongly convective
        decks the V-cycle's rediscretized coarse correction amplifies
        smooth convective modes and FGMRES stagnates, while block-Jacobi
        converges — scripts/diag_sphere_gmg.py)."""
        print("linear solver: GMG stagnated (linear budget exhausted); "
              "falling back to block-Jacobi preconditioning")
        self._gmg_strikes = getattr(self, "_gmg_strikes", 0) + 1
        if self._strike_parent is not None:
            self._strike_parent._gmg_strikes = max(
                getattr(self._strike_parent, "_gmg_strikes", 0),
                self._gmg_strikes)
        self._gmg_stash = (self._mg_ops, self._mg_rep,
                           self.precond_kind)
        self._mg_ops = None
        self._mg_rep = None
        self.precond_kind = "block_jacobi"
        self._resharded_rejit()

    def _resharded_rejit(self):
        raw = self._build_step()
        self._step_jit = jax.jit(raw)
        self._tstep_jit = jax.jit(self._build_transient_step(raw))
        self._chunk_jit = {k: jax.jit(f)
                           for k, f in self._chunk_raw.items()}

    def _gmg_probation(self):
        """Restore a fallen-back GMG preconditioner for the NEXT
        nonlinear solve — once; permanent after a second stagnation
        (same policy/measurement as solvers/base.py
        ``_gmg_probation``)."""
        if (getattr(self, "_gmg_stash", None) is not None
                and getattr(self, "_gmg_strikes", 0) < 2):
            self._mg_ops, self._mg_rep, self.precond_kind = \
                self._gmg_stash
            self._gmg_stash = None
            self._resharded_rejit()

    def solve_local_chunked(self, u_stack, combo_stack, t=0.0,
                            alpha0=0.0, sdt=0.0, mask_stack=None,
                            vals_stack=None):
        """Host-chunked sharded Newton solve: one device program per
        Krylov restart cycle / line search (same kernels and math as
        :meth:`solve_local`; for runtimes that bound single-program
        wall time — see solvers/base.py ``_newton_chunked``).

        Returns ``(u_stack, res_history, n_iterations, linear_iters)``
        with the same shapes as the fused ``_step``.
        """
        self._gmg_probation()
        cfg = self.newton_cfg
        Pn = self.n_shards
        C = self._consts_full()
        mask = self._mask_stack if mask_stack is None else mask_stack
        vals = self._zero_vals if vals_stack is None else vals_stack
        args = (combo_stack, mask, vals,
                jnp.asarray(t, self.dtype),
                jnp.asarray(alpha0, self.dtype),
                jnp.asarray(sdt, self.dtype), C)
        u, R, rnorm = self._chunk_jit["init"](u_stack, *args)
        rn = float(np.asarray(rnorm)[0])
        hist = np.full(cfg.max_iterations + 1, np.nan)
        hist[0] = rn
        it = lin_total = 0
        n_flat = u.shape[-2] * u.shape[-1]
        def _stalled():
            # windowed f32-floor guard (NewtonConfig.stall_window)
            W = cfg.stall_window
            return it >= W and rn > cfg.stall_factor * hist[it - W]

        u_best, n_best = u, rn     # best-iterate tracking (newton.py)
        while (rn > cfg.tolerance and it < cfg.max_iterations
               and not _stalled()):
            atol = jnp.asarray(
                max(cfg.relative_residual * rn, cfg.minimum_residual),
                self.dtype)
            x = jnp.zeros((Pn, n_flat), self.dtype)
            # node-block kinds: build the block inverses once per
            # Newton iteration, thread them through the cycles
            use_pstate = (self._mg_ops is None and self.precond_kind
                          in ("jacobi", "block_jacobi"))
            if use_pstate:
                binv = self._chunk_jit["pstate"](u, *args)
            for _cyc in range(cfg.max_krylov_cycles):
                if use_pstate:
                    x, lrn, j = self._chunk_jit["cycle_state"](
                        u, R, x, atol, binv, *args)
                else:
                    x, lrn, j = self._chunk_jit["cycle"](
                        u, R, x, atol, *args)
                j = int(np.asarray(j)[0])
                lin_total += j
                if j == 0 or float(np.asarray(lrn)[0]) <= float(atol):
                    break
            else:
                if self._mg_ops is not None:
                    # budget exhausted without convergence: retry the
                    # iteration under block-Jacobi
                    self._disable_gmg()
                    C = self._consts_full()
                    args = args[:-1] + (C,)
                    continue
            u, R, rnorm, _alpha = self._chunk_jit["update"](
                u, R, x, rnorm, *args)
            rn = float(np.asarray(rnorm)[0])
            it += 1
            hist[it] = rn
            if rn < n_best:
                u_best, n_best = u, rn
        u = self._chunk_jit["finalize"](u_best, *args)
        return (u, jnp.asarray(np.tile(hist, (Pn, 1)), self.dtype),
                jnp.full((Pn,), it), jnp.full((Pn,), lin_total))

    def write_checkpoint(self, path, u_stack, prevs_stack, t=0.0,
                         step=0):
        """Atomic checkpoint of the distributed state, stored GLOBALLY —
        a restore may use a different device count (reference §5.4:
        'restore with re-partition for a possibly different device
        count')."""
        import os
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp.npz"
        np.savez(tmp,
                 u=self.to_global(u_stack),
                 prevs=np.stack([self.to_global(prevs_stack[i])
                                 for i in range(3)]),
                 t=t, step=step, n_nodes=self.space.n_nodes)
        os.replace(tmp, path + ".npz")

    def read_checkpoint(self, path):
        """Restore onto THIS solver's partitioning (any device count).
        Returns (u_stack, prevs_stack, t, step)."""
        data = np.load(path + ".npz")
        if int(data["n_nodes"]) != self.space.n_nodes:
            raise ValueError("checkpoint does not match the space")
        u = self.to_local(data["u"])
        prevs = jnp.stack([self.to_local(p) for p in data["prevs"]])
        return u, prevs, float(data["t"]), int(data["step"])

    def run_transient(self, u0_stack, dt: float, n_steps: int,
                      order: int = 2, t0: float = 0.0,
                      history_stacks=None, on_step=None,
                      verbose: bool = False,
                      startup_scaling: float = 0.0):
        """Fixed-dt BDF time loop on device-resident stacked state.

        With ``startup_scaling`` in (0, 1) the first ``order - 1`` steps
        are SUB-STEPPED at lower order (the reference's
        ``first_iteration()`` startup, same as the single-device engine):
        sizes (s*dt, (1-s)*dt) with variable-step BDF weights, so the
        target order starts with genuine history.  Otherwise the order
        ramps 1 -> ``order`` unless ``history_stacks`` (list of
        [P, N_loc, c], newest first) seeds it.
        ``on_step(k, t, u_stack, iters, lin)`` is the host hook.
        Returns the final stacked solution.
        """
        from ..core.bdf import bdf_coefficients
        u = u0_stack
        if history_stacks is not None:
            prevs = jnp.stack([history_stacks[0], history_stacks[1],
                               history_stacks[2]])
            have = order
            dt_hist = [dt] * 3
        else:
            prevs = jnp.stack([u0_stack, u0_stack, u0_stack])
            have = 0
            dt_hist = []
        startup_left = (order - 1
                        if (history_stacks is None
                            and 0.0 < startup_scaling < 1.0
                            and order >= 2) else 0)

        def substep(u, prevs, t, dts, eff):
            return self.bdf_step(u, prevs, t, dts, eff)

        for k in range(n_steps):
            t = t0 + (k + 1) * dt
            if startup_left > 0:
                kk = order - startup_left
                dt_a = startup_scaling * dt
                dt_b = dt - dt_a
                u, prevs, hist, iters, lin = substep(
                    u, prevs, t - dt_b, [dt_a] + dt_hist,
                    min(kk, 1 + len(dt_hist)))
                have += 1
                u, prevs, hist, iters, lin = substep(
                    u, prevs, t, [dt_b, dt_a] + dt_hist,
                    min(kk + 1, 2 + len(dt_hist)))
                have += 1
                dt_hist = ([dt_b, dt_a] + dt_hist)[:3]
                startup_left -= 1
            else:
                eff = min(order, have + 1)
                u, prevs, hist, iters, lin = substep(
                    u, prevs, t, [dt] + dt_hist, eff)
                have += 1
                dt_hist = ([dt] + dt_hist)[:3]
            if verbose:
                h = np.asarray(hist)[0]
                it = int(np.asarray(iters)[0])
                print(f"sharded step {k + 1}: t={t:.4g} newton={it} "
                      f"linear={int(np.asarray(lin)[0])} "
                      f"res={h[it]:.3e}")
            if on_step is not None:
                on_step(k, t, u, int(np.asarray(iters)[0]),
                        int(np.asarray(lin)[0]))
        return u
