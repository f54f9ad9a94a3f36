"""Geometric multigrid preconditioner for the matrix-free GLS system.

The reference leans on Ifpack ILU / ML AMG for Krylov preconditioning
(SURVEY.md §3.3, hard part #2).  Neither exists on TPU; block-Jacobi
alone degrades with 1/h.  This module supplies the mesh-independent
option: a V-cycle over a nested hierarchy of structured lattices,

    smoother   : damped node-block Jacobi (batched (d+1)x(d+1) inverses)
    transfers  : FE interpolation (fine nodes evaluated in coarse cells;
                 host-precomputed masters/weights — the same machinery as
                 hanging-node constraints), restriction = its transpose
    coarse ops : the SAME matrix-free GLS jvp linearized at the injected
                 state, per level
    bottom     : a few iterations of block-Jacobi-preconditioned GMRES
                 (the outer Krylov must then be FGMRES)

Everything is static-shape jnp and every level's arrays travel through
the jit boundary as ARGUMENTS (``mg`` pytree) — no HLO literal blowup.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.mesh import subdivided_hyper_rectangle
from ..fem.dof import FESpace
from .preconditioners import build_from_node_blocks
from .linalg import gmres


def _transfer_maps(fine_space, coarse_space):
    """Host precompute: interpolation masters/weights + injection."""
    cs, fs = coarse_space, fine_space
    ne = cs.mesh.structured_shape
    # domain bounds from the MESH vertices: on periodic axes the fused
    # node array stops one layer short of the domain end
    lo = cs.mesh.vertices.min(axis=0)
    hi = cs.mesh.vertices.max(axis=0)
    span = hi - lo
    pos = (fs.nodes - lo) / span
    e_idx = np.minimum((pos * np.asarray(ne)).astype(np.int64),
                       np.asarray(ne) - 1)
    cent = cs.element_coords().mean(axis=1)
    cent_idx = ((cent - lo) / span * np.asarray(ne)).astype(np.int64)
    lookup = {tuple(ci): e for e, ci in enumerate(cent_idx)}
    elem = np.array([lookup[tuple(ix)] for ix in e_idx], dtype=np.int64)
    corner0 = cs.element_coords()[elem][:, 0, :]
    h_elem = span / np.asarray(ne)
    ref = np.clip((fs.nodes - corner0) / h_elem, 0.0, 1.0)
    B = cs.basis.tabulate_values(ref)                  # [Nf, nn_c]
    masters = cs.elem_nodes[elem]
    scale = np.maximum(np.abs(fs.nodes).max(axis=0), 1.0)
    q_f = np.round(fs.nodes / scale * 1e10).astype(np.int64)
    q_c = np.round(cs.nodes / scale * 1e10).astype(np.int64)
    fmap = {tuple(r): i for i, r in enumerate(q_f)}
    inject = np.array([fmap[tuple(r)] for r in q_c], dtype=np.int64)
    return masters.astype(np.int32), B, inject.astype(np.int32)


def _coarsen_forest(forest):
    """One-level-coarser forest: merge every complete sibling family,
    then re-balance (levels never exceed the input's anywhere)."""
    from ..fem.forest import Forest
    new = Forest.__new__(Forest)
    new.base = forest.base
    new.dim = forest.dim
    new.leaves = [set(s) for s in forest.leaves]
    new._adjacency = forest._adjacency
    b_arr, lvl, idx = forest._leaf_arrays_only()
    new.coarsen(np.column_stack([b_arr, lvl, idx]))
    new.balance()
    return new


def _hc_arrays(hc):
    """Hanging-constraint arrays for the mg consts dict (may be empty)."""
    return dict(hc_ids=hc.ids, hc_masters=hc.masters,
                hc_weights=hc.weights)


def _maybe_pallas_coarse(solver, cop, structured: bool) -> None:
    """Run a coarse level through the fused Pallas kernel whenever the
    fine level does.

    The XLA batched (SoA) kernel's jvp leaves dot_general temps whose
    two tiny dims land on the (sublane, lane) axes — 42.7x HBM padding
    per coarse level, the measured TGV-96^3 OOM (docs/tgv96_run.log:
    f32[8,110592,3,4] padded 1.69 GB).  The Pallas kernel's explicit
    [S, L] element tiles have no such freedom to waste.  Interpret-mode
    (CPU tests) keeps the XLA path: 32 interpreted probe launches per
    level would crawl."""
    pg = getattr(solver.op, "_pallas", None)
    if pg is not None and not pg.interpret:
        cop.enable_pallas(structured=structured,
                          state_dtype=pg.state_dtype)


def build_forest_hierarchy(solver, min_elems: int = 64,
                           max_levels: int = 10):
    """Mesh-AGNOSTIC hierarchy: coarsen the solver's forest level by
    level (works on gmsh/multiblock base meshes, rotated adjacency, and
    Kelly-adapted leaf sets — the meshes the structured path rejects).

    Transfers are FE interpolation through base-cell reference
    coordinates (exact on curved/manifold cells because both levels
    share the base-cell parametrization); each level carries its own
    hanging-node constraints.  Replaces the reference's mesh-agnostic
    ILU/AMG slot (SURVEY §3.3 hard part #2).
    """
    from ..solvers.gls import GLSOperator
    from ..solvers.boundary import BoundaryHandler
    from ..fem.dof import FESpace
    from ..fem.constraints import build_hanging_constraints
    from ..fem.transfer import (_new_node_base_positions,
                                locate_in_forest)

    space = solver.space
    d = space.dim
    mask0 = solver.bh.mask
    if solver.hc.n:
        mask0 = mask0 | jnp.zeros_like(mask0).at[solver.hc.ids].set(True)
    level_ops = [solver.op]
    mg = [dict(solver.op.consts(), bh_mask=mask0,
               **_hc_arrays(solver.hc))]

    cur_forest = solver.forest
    cur_space = space
    cur_elem_of = solver._elem_of

    # p-coarsening first for high-order spaces: a Q1 level on the SAME
    # mesh, then h-coarsening at degree 1.  Rediscretized same-degree
    # Q2 coarse levels stagnate FGMRES on transient multiblock decks
    # (cylinder Q2: 270 iters vs Q1's 17 at the same DoF count,
    # scripts/diag_sphere_gmg.py) — the intra-element high-order modes
    # are local and Jacobi-smoothable, so the p-level hands the smooth
    # error to the measured-strong Q1 hierarchy.  Standard practice for
    # high-order FEM multigrid (p-MG + low-order AMG — the reference's
    # ML-AMG slot sees the assembled matrix and does this implicitly
    # via aggregation).
    if space.degree > 1:
        cspace = FESpace(space.mesh, 1)
        chc = build_hanging_constraints(cspace, solver._nc_faces)
        cop = GLSOperator(cspace, solver.op.nu,
                          n_q1d=2, stab=solver.op.stab,
                          dtype=solver.op.dtype)
        _maybe_pallas_coarse(solver, cop, structured=False)
        cbh = BoundaryHandler(cspace, solver.prm.boundary_conditions)
        cmask = cbh.mask
        if chc.n:
            cmask = cmask | jnp.zeros_like(cmask).at[chc.ids].set(True)
        bc_f, bp_f = _new_node_base_positions(cur_space, cur_forest,
                                              cur_elem_of)
        elem_c, ref_c = locate_in_forest(bc_f, bp_f, cur_forest,
                                         cur_elem_of, d)
        Bp = cspace.basis.tabulate_values(ref_c)
        masters = cspace.elem_nodes[elem_c]
        bc_c, bp_c = _new_node_base_positions(cspace, cur_forest,
                                              cur_elem_of)
        elem_f, ref_f = locate_in_forest(bc_c, bp_c, cur_forest,
                                         cur_elem_of, d)
        Br = cur_space.basis.tabulate_values(ref_f)
        inj_masters = cur_space.elem_nodes[elem_f]
        level_ops.append(cop)
        mg.append(dict(cop.consts(), bh_mask=cmask,
                       masters=jnp.asarray(masters.astype(np.int32)),
                       weights=jnp.asarray(Bp, solver.op.dtype),
                       inj_masters=jnp.asarray(
                           inj_masters.astype(np.int32)),
                       inj_weights=jnp.asarray(Br, solver.op.dtype),
                       **_hc_arrays(chc)))
        cur_space = cspace

    while (len(level_ops) < max_levels
           and cur_space.n_elements > min_elems):
        cforest = _coarsen_forest(cur_forest)
        if cforest.n_leaves() >= cur_forest.n_leaves():
            break
        cmesh, c_elem_of, c_ncf = cforest.build_mesh()
        # deck-declared periodicity lives on the BUILT fine mesh (set up
        # before DoF numbering); propagate it so coarse spaces fuse the
        # same seams
        cmesh.periodic = list(space.mesh.periodic)
        cspace = FESpace(cmesh, cur_space.degree)
        chc = build_hanging_constraints(cspace, c_ncf)
        cop = GLSOperator(cspace, solver.op.nu,
                          n_q1d=int(round(solver.op.n_q
                                          ** (1 / d))),
                          stab=solver.op.stab, dtype=solver.op.dtype)
        _maybe_pallas_coarse(solver, cop, structured=False)
        cbh = BoundaryHandler(cspace, solver.prm.boundary_conditions)
        cmask = cbh.mask
        if chc.n:
            cmask = cmask | jnp.zeros_like(cmask).at[chc.ids].set(True)

        # prolongation: every FINE node located in the coarse forest
        bc_f, bp_f = _new_node_base_positions(cur_space, cur_forest,
                                              cur_elem_of)
        elem_c, ref_c = locate_in_forest(bc_f, bp_f, cforest,
                                         c_elem_of, d)
        Bp = cspace.basis.tabulate_values(ref_c)       # [Nf, nn_c]
        masters = cspace.elem_nodes[elem_c]

        # state restriction: every COARSE node located in the fine forest
        bc_c, bp_c = _new_node_base_positions(cspace, cforest, c_elem_of)
        elem_f, ref_f = locate_in_forest(bc_c, bp_c, cur_forest,
                                         cur_elem_of, d)
        Br = cur_space.basis.tabulate_values(ref_f)    # [Nc, nn_f]
        inj_masters = cur_space.elem_nodes[elem_f]

        level_ops.append(cop)
        mg.append(dict(cop.consts(), bh_mask=cmask,
                       masters=jnp.asarray(masters.astype(np.int32)),
                       weights=jnp.asarray(Bp, solver.op.dtype),
                       inj_masters=jnp.asarray(
                           inj_masters.astype(np.int32)),
                       inj_weights=jnp.asarray(Br, solver.op.dtype),
                       **_hc_arrays(chc)))
        cur_forest, cur_space, cur_elem_of = cforest, cspace, c_elem_of
    return level_ops, mg


def build_hierarchy(solver, min_elems: int = 256, max_levels: int = 10):
    """Build the level list for a GLS solver.

    Structured lattices coarsen by halving the lattice; any other mesh
    with a forest (multiblock/gmsh base cells, Kelly-adapted leaf sets)
    coarsens through the forest.  Returns (level_ops, mg_consts):
    static per-level operators + the traced-array pytree (finest first;
    level 0 carries no transfers).
    """
    from ..solvers.gls import GLSOperator
    from ..solvers.boundary import BoundaryHandler
    space = solver.space
    level_ops = [solver.op]
    mg = [dict(solver.op.consts(),
               bh_mask=solver.bh.mask)]
    mesh = space.mesh
    if mesh.structured_shape is None:
        if getattr(solver, "forest", None) is not None:
            return build_forest_hierarchy(solver, max_levels=max_levels)
        return level_ops, mg
    ne = tuple(mesh.structured_shape)
    lo = mesh.vertices.min(axis=0)
    hi = mesh.vertices.max(axis=0)
    prev_space = space
    cur_degree = space.degree
    if space.degree > 1:
        # p-coarsening first (see build_forest_hierarchy): a Q1 level
        # on the SAME lattice, then h-halving at degree 1
        cspace = FESpace(mesh, 1)
        cop = GLSOperator(cspace, solver.op.nu, n_q1d=2,
                          stab=solver.op.stab, dtype=solver.op.dtype)
        _maybe_pallas_coarse(solver, cop, structured=True)
        cbh = BoundaryHandler(cspace, solver.prm.boundary_conditions)
        masters, weights, inject = _transfer_maps(prev_space, cspace)
        level_ops.append(cop)
        mg.append(dict(cop.consts(),
                       bh_mask=cbh.mask,
                       masters=jnp.asarray(masters),
                       weights=jnp.asarray(weights, solver.op.dtype),
                       inject=jnp.asarray(inject)))
        prev_space = cspace
        cur_degree = 1
    while (len(level_ops) < max_levels
           and all(n % 2 == 0 for n in ne)
           and int(np.prod(ne)) // (2 ** space.dim) >= min_elems):
        ne = tuple(n // 2 for n in ne)
        cmesh = subdivided_hyper_rectangle(lo, hi, list(ne),
                                           colorize=True, dim=space.dim)
        # propagate the FINE mesh's boundary-id convention: a fine deck
        # built without colorize (or remapped ids) would otherwise get
        # misassigned coarse Dirichlet masks, silently weakening the
        # V-cycle.  Generator meshes key the id off the local face index.
        side_bid = {}
        for (_, lf, b) in space.mesh.boundary_faces:
            side_bid.setdefault(int(lf), set()).add(int(b))
        if all(len(v) == 1 for v in side_bid.values()):
            for row in cmesh.boundary_faces:
                ids = side_bid.get(int(row[1]))
                if ids:
                    row[2] = next(iter(ids))
        cmesh.periodic = list(mesh.periodic)
        cspace = FESpace(cmesh, cur_degree)
        cop = GLSOperator(cspace, solver.op.nu,
                          n_q1d=int(round(solver.op.n_q
                                          ** (1 / space.dim))),
                          stab=solver.op.stab, dtype=solver.op.dtype)
        _maybe_pallas_coarse(solver, cop, structured=True)
        cbh = BoundaryHandler(cspace, solver.prm.boundary_conditions)
        masters, weights, inject = _transfer_maps(prev_space, cspace)
        level_ops.append(cop)
        mg.append(dict(cop.consts(),
                       bh_mask=cbh.mask,
                       masters=jnp.asarray(masters),
                       weights=jnp.asarray(weights, solver.op.dtype),
                       inject=jnp.asarray(inject)))
        prev_space = cspace
        mesh = cmesh
    return level_ops, mg


def _hc_ops(mgl):
    """(distribute, transpose) closures for one level's hanging rows
    (identity when the level is conforming); static-shape branch."""
    ids = mgl.get("hc_ids")
    if ids is None or ids.shape[0] == 0:
        return (lambda u: u), (lambda R: R)
    masters, weights = mgl["hc_masters"], mgl["hc_weights"]

    def distribute(u):
        vals = jnp.einsum("hm,hmc->hc", weights, u[masters])
        return u.at[ids].set(vals)

    def transpose(R):
        rh = R[ids]
        R = R.at[masters].add(weights[:, :, None] * rh[:, None, :])
        return R.at[ids].set(0.0)

    return distribute, transpose


def make_vcycle(level_ops, *, n_smooth: int = 1, omega: float = 0.7,
                coarse_iters: int = 25, smoother: str = "jacobi",
                krylov_m: int = 4, cycle: str = "v",
                cycle_m: int = 2, cycle_levels: int = 1,
                level_offset: int = 0):
    """Return builder(u, uprev, fq, alpha0, sdt, fine_mask, mg) ->
    apply(v): one multigrid cycle of the hierarchy, linearized at u.

    smoother:
      'jacobi' — ``n_smooth`` damped node-block-Jacobi sweeps (omega).
      'krylov' — ``krylov_m`` iterations of node-block-preconditioned
        GMRES per pre/post smooth.  Damped Jacobi DIVERGES on steady
        convection-dominated systems (measured: sphere O-grid deck,
        V-cycle stationary factor rho ~= 2-5, scripts/diag_sphere_gmg.py);
        a fixed-iteration Krylov smooth is robust on nonsymmetric/
        indefinite levels at ~krylov_m matvecs per smooth.  The outer
        Krylov must be FGMRES for either (the bottom solve iterates).

    cycle:
      'v' — one recursive correction per level (V-cycle).
      'w' — two corrections with a residual update between (W-cycle;
        the reference's `amg w cycles` Trilinos-ML knob).
      'k' — the coarse correction is ``cycle_m`` FGMRES iterations on
        the coarse system preconditioned by the recursive cycle
        (Notay's K-cycle).  A residual-minimizing wrapper CANNOT
        amplify: on steady convective decks the rediscretized coarse
        operator over-corrects smooth convective modes (the r4 sphere
        ladder's block-Jacobi fallback), and the K-wrap line-searches
        the correction instead of trusting it.
    ``cycle_levels`` bounds how many coarse levels get the w/k wrap
    (top-down).  The recursion is UNROLLED under jit, so the compiled
    program grows ~2^cycle_levels bottom solves; the smooth convective
    modes the wrap exists for live on the first coarse level(s), so the
    default wraps only level 1 and stays V-shaped below.
    ``level_offset``: set to 1 when ``level_ops[0]`` is already the
    first COARSE level of a larger hierarchy (the sharded path, whose
    fine level lives outside this builder) — the wrap then applies at
    this builder's root so 1-vs-N device iterates match.

    ``builder.state(u, uprev, fq, alpha0, sdt, fine_mask, mg)`` returns
    the once-per-linearization pure-array state (per-level restricted
    states + node-block inverses — the jvp probes and inversions, the
    expensive part); pass it back as ``builder(..., pstate=...)`` so
    host-chunked drivers build it ONCE per Newton iteration instead of
    once per Krylov restart cycle (the fused driver's behavior).
    """
    n_levels = len(level_ops)

    def _level_consts(mgl):
        # pass EVERY level array through (incl. the pallas geometry
        # rows pg_xe/pg_h on the fine level) — anything missing here
        # would fall back to a closure constant and blow up the HLO
        return {k: v for k, v in mgl.items()
                if k not in ("bh_mask", "masters", "weights", "inject",
                             "inj_masters", "inj_weights",
                             "hc_ids", "hc_masters", "hc_weights")}

    def _lin_states(u, uprev, fq, fine_mask, mg):
        states = [(u, uprev, fq, fine_mask)]
        for li in range(1, n_levels):
            uf, upf, _, _ = states[-1]
            if "inject" in mg[li]:
                inj = mg[li]["inject"]
                uc = uf[inj]
                upc = upf[inj]
            else:
                # forest path: interpolate the fine state at the coarse
                # nodes (GLL lattices are not nested under bisection)
                iw, im = mg[li]["inj_weights"], mg[li]["inj_masters"]
                uc = jnp.einsum("nm,nmc->nc", iw, uf[im])
                upc = jnp.einsum("nm,nmc->nc", iw, upf[im])
            op = level_ops[li]
            fqc = jnp.zeros((op.space.n_elements, op.n_q, op.dim),
                            u.dtype)
            states.append((uc, upc, fqc, mg[li]["bh_mask"]))
        return states

    def build_state(u, uprev, fq, alpha0, sdt, fine_mask, mg):
        from .preconditioners import node_blocks_to_state
        states = _lin_states(u, uprev, fq, fine_mask, mg)
        bstates = []
        for li, (ul, upl, fql, mask) in enumerate(states):
            op = level_ops[li]
            C = _level_consts(mg[li])
            blocks = op.node_blocks(ul, mask, upl, fql, alpha0, sdt,
                                    C=C)
            bstates.append(node_blocks_to_state("block_jacobi", blocks,
                                                mask))
        return (tuple((s[0], s[1], s[2]) for s in states),
                tuple(bstates))

    def builder(u, uprev, fq, alpha0, sdt, fine_mask, mg, pstate=None):
        from .preconditioners import apply_node_block_state
        hcs = [_hc_ops(mg[li]) for li in range(n_levels)]

        if pstate is None:
            pstate = build_state(u, uprev, fq, alpha0, sdt, fine_mask,
                                 mg)
        lin, bstates = pstate
        masks = [fine_mask] + [mg[li]["bh_mask"]
                               for li in range(1, n_levels)]

        mats = []
        for li in range(n_levels):
            ul, upl, fql = lin[li]
            mask = masks[li]
            op = level_ops[li]
            hcD, hcT = hcs[li]
            C = _level_consts(mg[li])
            # NB: named sm_apply, NOT 'smoother' — that would shadow the
            # make_vcycle(smoother=...) option inside this scope and
            # silently disable the krylov branch (a bug this renaming
            # fixed; the string compare in smooth() saw a function)
            bst = bstates[li]
            sm_apply = (lambda v, bst=bst:
                        apply_node_block_state(bst, v))

            def matvec(v, op=op, ul=ul, upl=upl, fql=fql, mask=mask,
                       C=C, hcD=hcD, hcT=hcT):
                f = lambda w: jnp.where(
                    mask, 0.0,
                    hcT(op.residual_free(hcD(w), upl, fql,
                                         alpha0, sdt, C=C)))
                return jax.jvp(f, (ul,),
                               (jnp.where(mask, 0.0, v),))[1] \
                    + jnp.where(mask, v, 0.0)

            mats.append((matvec, sm_apply, mask))

        def prolong(li, vc):
            # constrained coarse rows carry zeros in the cycle: fill
            # them from their masters before interpolating
            vc = hcs[li][0](vc)
            return jnp.einsum("fm,fmc->fc", mg[li]["weights"],
                              vc[mg[li]["masters"]])

        def restrict(li, rf, Nc):
            out = jnp.zeros((Nc, rf.shape[-1]), rf.dtype)
            out = out.at[mg[li]["masters"]].add(
                mg[li]["weights"][:, :, None] * rf[:, None, :])
            # move residual landing on constrained coarse rows to masters
            return hcs[li][1](out)

        def smooth(level, r, z=None):
            """One pre/post smoothing application: z ~ A_level^{-1} r."""
            matvec, sm, mask = mats[level]
            if smoother == "krylov":
                x0 = None if z is None else z.reshape(-1)
                sol, _, _ = gmres(
                    lambda x: matvec(x.reshape(r.shape)).reshape(-1),
                    r.reshape(-1), x0=x0,
                    precond=lambda x: sm(x.reshape(r.shape)).reshape(-1),
                    m=krylov_m, max_restarts=1, atol=1e-30)
                return sol.reshape(r.shape)
            z0 = omega * sm(r) if z is None else z + omega * sm(
                r - matvec(z))
            for _ in range(n_smooth - 1):
                z0 = z0 + omega * sm(r - matvec(z0))
            return z0

        def vcycle(level, r):
            matvec, sm, mask = mats[level]
            if level + 1 == n_levels:
                sol, _, _ = gmres(
                    lambda x: matvec(x.reshape(r.shape)).reshape(-1),
                    r.reshape(-1),
                    precond=lambda x: sm(
                        x.reshape(r.shape)).reshape(-1),
                    m=coarse_iters, max_restarts=1, atol=1e-30)
                return sol.reshape(r.shape)
            z = smooth(level, r)
            res = r - matvec(z)
            rc = restrict(level + 1, res, level_ops[level + 1].n_nodes)
            rc = jnp.where(mats[level + 1][2], 0.0, rc)
            zc = coarse_correct(level + 1, rc)
            z = z + jnp.where(mask, 0.0, prolong(level + 1, zc))
            z = smooth(level, r, z=z)
            return z

        def coarse_correct(level, rc):
            """The level-``level`` correction inside the parent cycle:
            plain recursion (v), doubled (w), or FGMRES-wrapped (k)."""
            wrapped = cycle in ("w", "k") \
                and level + level_offset <= cycle_levels \
                and level + 1 < n_levels
            if not wrapped:
                return vcycle(level, rc)
            if cycle == "w":
                zc = vcycle(level, rc)
                return zc + vcycle(level, rc - mats[level][0](zc))
            mvl = mats[level][0]
            shp = rc.shape
            sol, _, _ = gmres(
                lambda x: mvl(x.reshape(shp)).reshape(-1),
                rc.reshape(-1),
                precond=lambda x: vcycle(level,
                                         x.reshape(shp)).reshape(-1),
                m=cycle_m, max_restarts=1, atol=1e-30, flexible=True)
            return sol.reshape(shp)

        if level_offset > 0:
            return lambda v: coarse_correct(0, v)
        return lambda v: vcycle(0, v)

    builder.state = build_state
    return builder