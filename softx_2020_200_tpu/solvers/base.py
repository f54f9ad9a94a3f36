"""The solver engine: setup, steady/transient stepping, orchestration.

Rebuild of the reference's ``NavierStokesBase`` (SURVEY.md §2.2 — the
largest behavioral surface): mesh -> DoFs -> constraints -> initial
condition -> { steady AMR cycles | transient time loop } with
postprocessing, output, and checkpoint/restart.

TPU-first split of responsibilities (SURVEY.md §7.1):
- everything inside one step — residual, Jacobian-vector products, the
  Newton loop, GMRES, preconditioning, line search — is ONE jitted
  function with zero host sync;
- the host (this class) only steers outer loops: time stepping, mesh
  adaptation, output files, checkpointing.
"""

from __future__ import annotations

import json
import os
import time as _time
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.parameters import SimulationParameters, TimeSteppingMethod, Verbosity
from ..core.simulation_control import SimulationControl
from ..core.bdf import bdf_coefficients
from ..core.expressions import VectorExpression
from ..core.pvd_handler import PVDHandler
from ..fem.mesh import generate_mesh, Mesh, Manifold
from ..fem.dof import FESpace
from ..fem.forest import Forest
from ..fem.constraints import build_hanging_constraints, HangingConstraints
from ..fem.transfer import transfer_solution
from ..core.parameters import BoundaryType
from .kelly import kelly_estimate, flag_cells
from .gls import GLSOperator, StabFlags
from .boundary import BoundaryHandler
from .newton import newton_solve, NewtonConfig
from .analytical import l2_error
from ..ops.preconditioners import build_preconditioner, build_from_node_blocks
from ..core.timer import SectionTimer
from ..utils.tables import Table
from ..utils.vtu import write_vtu, subcell_connectivity
from . import postprocessing as post


class GLSNavierStokesSolver:
    """Monolithic equal-order GLS solver (GLSNavierStokesSolver<dim>)."""

    def __init__(self, prm: SimulationParameters, mesh: Mesh | None = None):
        self.prm = prm
        self.dim = prm.dim
        self.pvd = PVDHandler()
        self.control = SimulationControl(prm.simulation_control)
        self.timer = SectionTimer()
        self.tables: dict[str, list] = {"L2": [], "forces": [], "ke": [],
                                        "enstrophy": []}
        self._force_tables: dict[int, Table] = {}
        self._torque_tables: dict[int, Table] = {}
        self._ke_table: Table | None = None
        self._mesh = mesh
        self.setup()

    # ------------------------------------------------------------------
    def setup(self, mesh: Mesh | None = None, nc_faces=None) -> None:
        """read_mesh + setup_dofs + operator/BC construction."""
        prm = self.prm
        if mesh is not None:
            self._mesh = mesh
        if self._mesh is None:
            adaptive = prm.mesh_adaptation.type == "kelly"

            def _read_base(initial_refinement):
                if prm.mesh.type == "gmsh":
                    from ..fem.gmsh_io import read_msh
                    m = read_msh(prm.mesh.file_name, self.dim)
                    return m.refine_uniform(initial_refinement) \
                        if initial_refinement else m
                return generate_mesh(
                    prm.mesh.grid_type, prm.mesh.grid_arguments,
                    dim=self.dim, initial_refinement=initial_refinement)

            if adaptive:
                # the forest owns refinement: build the coarse base mesh
                # and pre-refine uniformly inside the forest
                base = _read_base(0)
                for m in prm.manifolds.manifolds:
                    center = np.array([float(x) for x in
                                       m.arg.replace(",", " ").split()]
                                      or [0.0] * self.dim)
                    base.boundary_manifolds[m.id] = Manifold(m.type, center)
                # periodic pairs must reach the BASE mesh before the
                # forest builds its (periodic) adjacency
                for bc in prm.boundary_conditions.bcs:
                    if bc.type == BoundaryType.periodic:
                        pair = (bc.id, bc.periodic_id,
                                bc.periodic_direction)
                        if pair not in base.periodic:
                            base.periodic.append(pair)
                self.forest = Forest(base)
                for _ in range(prm.mesh.initial_refinement):
                    self.forest.refine(np.column_stack(
                        self.forest._leaf_arrays_only()))
                self._mesh, self._elem_of, nc_faces = \
                    self.forest.build_mesh()
            else:
                self.forest = None
                self._mesh = _read_base(prm.mesh.initial_refinement)
                for m in prm.manifolds.manifolds:
                    center = np.array([float(x) for x in
                                       m.arg.replace(",", " ").split()]
                                      or [0.0] * self.dim)
                    self._mesh.boundary_manifolds[m.id] = \
                        Manifold(m.type, center)
        # periodic declarations reach the mesh before DoF numbering
        for bc in prm.boundary_conditions.bcs:
            if bc.type == BoundaryType.periodic:
                pair = (bc.id, bc.periodic_id, bc.periodic_direction)
                if pair not in self._mesh.periodic:
                    self._mesh.periodic.append(pair)

        self.space = FESpace(self._mesh, prm.fem.velocity_order)
        self._nc_faces = nc_faces or []
        self.hc = build_hanging_constraints(self.space, self._nc_faces)
        stab = StabFlags(
            supg=prm.stabilization.supg,
            pspg=prm.stabilization.pspg,
            gls_viscous_adjoint=prm.stabilization.gls_viscous_adjoint,
            lsic=prm.stabilization.lsic,
            frozen_tau=prm.stabilization.frozen_tau_jacobian)
        self.op = GLSOperator(
            self.space, prm.physical_properties.kinematic_viscosity,
            n_q1d=prm.fem.n_quadrature_points_1d, stab=stab)
        use_pallas = (prm.fem.kernel == "pallas"
                      or (prm.fem.kernel == "auto"
                          and jax.default_backend() == "tpu"))
        if use_pallas:
            sd = (jnp.bfloat16 if prm.linear_solver
                  .jacobian_state_precision == "bf16" else None)
            self.op.enable_pallas(state_dtype=sd)
        self.bh = BoundaryHandler(self.space, prm.boundary_conditions)

        self.source = (VectorExpression(prm.source_term.xyz)
                       if prm.source_term.enable else None)
        self.exact = (VectorExpression(prm.analytical_solution.uvwp)
                      if prm.analytical_solution.enable else None)
        # MMS: derive the forcing from the exact solution by autodiff when
        # the deck enables a source term with the magic expression 'mms'
        self._mms_source = None
        if (self.source is not None
                and prm.source_term.xyz.strip().lower().startswith("mms")):
            if self.exact is None:
                raise ValueError("source 'mms' requires an analytical solution")
            from .analytical import mms_source
            self._mms_source = mms_source(
                self.exact, prm.physical_properties.kinematic_viscosity,
                self.dim)

        ls = prm.linear_solver
        nls = prm.nonlinear_solver
        if ls.method == "amg" and not prm.test.enable:
            # reference decks select Trilinos-ML AMG here; the TPU
            # equivalent is GMG-preconditioned FGMRES (same
            # mesh-independence slot) — never run something else silently
            print("linear solver method 'amg' maps to geometric-multigrid"
                  " preconditioned FGMRES on TPU")
        self.newton_cfg = NewtonConfig(
            tolerance=nls.tolerance,
            max_iterations=nls.max_iterations,
            max_halvings=nls.max_line_search_halvings,
            method="bicgstab" if ls.method == "bicgstab" else "gmres",
            gmres_restart=ls.max_krylov_vectors,
            max_krylov_cycles=max(1, ls.max_iters // ls.max_krylov_vectors),
            relative_residual=ls.relative_residual,
            minimum_residual=ls.minimum_residual,
            skip_iterations=nls.skip_iterations)
        self.precond_kind = ls.resolved_preconditioner()
        self._mg_builder = None
        # a mesh rebuild invalidates any stashed fallen-back GMG state
        # (its level ops/transfers belong to the OLD mesh).  The strike
        # count SURVIVES adaptation: once GMG was evicted twice the
        # regime (steady strongly-convective — config #5) does not
        # change because the mesh refined, and rebuilding + recompiling
        # the hierarchy each Kelly cycle just to stagnate again cost
        # the flagship ~2x its linear-iteration budget per cycle plus
        # the relay compile bill of the V-cycle programs.
        self._gmg_stash = None
        self._gmg_strikes = getattr(self, "_gmg_strikes", 0)
        if self.precond_kind == "gmg" and self._gmg_strikes >= 2:
            print("linear solver: GMG stays evicted on the adapted mesh "
                  "(2 stagnation strikes); using block-Jacobi")
            self.precond_kind = "block_jacobi"
        if self.precond_kind == "gmg":
            from ..ops.multigrid import build_hierarchy, make_vcycle
            self._mg_ops, self._mg_consts = build_hierarchy(self)
            if len(self._mg_ops) < 2:
                # no hierarchy available: fall back to block-Jacobi
                self.precond_kind = "block_jacobi"
            else:
                self._mg_builder = make_vcycle(
                    self._mg_ops,
                    smoother=ls.resolved_mg_smoother(
                        self.control.is_steady(),
                        degree=self.space.degree),
                    krylov_m=ls.mg_krylov_vectors,
                    cycle=ls.resolved_mg_cycle())
                import dataclasses as _dc
                self.newton_cfg = _dc.replace(self.newton_cfg,
                                              flexible=True)

        self._rejit()
        self._zero_prev = jnp.zeros((self.space.n_nodes, self.dim))
        # all large arrays reach the jitted solve as ARGUMENTS (XLA embeds
        # closure arrays as literals -> O(N) HLO text, catastrophic
        # compile times at scale)
        self._consts = dict(self.op.consts())
        self._consts["bc_mask"] = self.bh.mask
        self._consts["nodes"] = self.bh.node_coords
        if self._mg_builder is not None:
            self._consts["mg"] = self._mg_consts

    # ------------------------------------------------------------------
    def _source_at(self, t, qpts=None):
        qpts = qpts if qpts is not None else self.op.qpts_phys
        if self._mms_source is not None:
            return self._mms_source(qpts, t)
        if self.source is None:
            return jnp.zeros_like(qpts)
        f = self.source.spatial(qpts, t)
        return f[..., :self.dim]

    def _make_problem(self, uprev_combo, t, alpha0, sdt, C):
        """(constrain, residual, precond_builder, mask, fq) for one
        nonlinear solve — shared by the fused jit driver
        (``_solve_impl``) and the host-chunked driver
        (``_newton_chunked``)."""
        op, bh, hc = self.op, self.bh, self.hc
        mask = C["bc_mask"]
        if hc.n:
            # constrained (hanging) dofs act like extra Dirichlet rows
            # for masking/preconditioning purposes
            mask = mask | jnp.zeros_like(mask).at[hc.ids].set(True)

        def constrain(u0):
            u0 = bh.constrain(u0, t, mask=C["bc_mask"],
                              node_coords=C["nodes"])
            return bh.slip_project(hc.distribute(u0))

        fq = self._source_at(t, qpts=C["qpts_phys"])

        def residual(u):
            u = hc.distribute(u)
            R = op.residual_free(u, uprev_combo, fq, alpha0, sdt, C=C)
            R = hc.distribute_transpose(R)
            R = jnp.where(mask, 0.0, R)
            # rotated slip rows: tangential residual + u.n identity
            return bh.slip_residual(R, u)

        def precond_builder(u):
            if self._mg_builder is not None:
                return self._mg_builder(hc.distribute(u), uprev_combo,
                                        fq, alpha0, sdt, mask, C["mg"])
            if self.precond_kind in ("jacobi", "block_jacobi"):
                blocks = op.node_blocks(hc.distribute(u), mask,
                                        uprev_combo, fq,
                                        alpha0, sdt, C=C)
                blocks = bh.slip_project_blocks(blocks)
                return build_from_node_blocks(
                    self.precond_kind, blocks, mask).apply
            A_e = op.element_matrices(u, mask, uprev_combo, fq, alpha0, sdt)
            P = build_preconditioner(
                self.precond_kind, A_e, C["elem_nodes"], op.n_nodes,
                op.nn, op.nc, inv_mult=op.inv_mult, bc_mask=mask,
                amap=op.amap)
            return P.apply

        return constrain, residual, precond_builder, mask, fq

    def _solve_impl(self, u0, uprev_combo, t, alpha0, sdt, C):
        """One nonlinear solve (steady: alpha0=sdt=0). Fully jitted;
        C carries every large constant array (see setup())."""
        op, bh, hc = self.op, self.bh, self.hc
        constrain, residual, precond_builder, mask, fq = \
            self._make_problem(uprev_combo, t, alpha0, sdt, C)
        u0 = constrain(u0)

        # skip-Newton (reference SkipNewtonNonLinearSolver): carry the
        # preconditioner state and rebuild it every `skip iterations`
        use_skip = (self.prm.nonlinear_solver.solver == "skip_newton"
                    and self._mg_builder is None
                    and self.precond_kind in ("jacobi", "block_jacobi"))
        if use_skip:
            from ..ops.preconditioners import (
                node_blocks_to_state, apply_node_block_state)

            def pstate(u):
                blocks = op.node_blocks(hc.distribute(u), mask,
                                        uprev_combo, fq, alpha0, sdt, C=C)
                blocks = bh.slip_project_blocks(blocks)
                return node_blocks_to_state(self.precond_kind, blocks,
                                            mask)

            res = newton_solve(
                residual, u0, precond_builder=precond_builder,
                config=self.newton_cfg,
                precond_state_fn=pstate,
                precond_apply_fn=apply_node_block_state)
        else:
            res = newton_solve(residual, u0,
                               precond_builder=precond_builder,
                               config=self.newton_cfg)
        if hc.n:
            res = res._replace(u=hc.distribute(res.u))
        return res

    # ------------------------------------------------------------------
    # Host-chunked Newton.  The fused driver above runs the WHOLE
    # Newton solve as one device program (zero host sync — the
    # BASELINE north star).  Some TPU runtimes bound single-program
    # wall time (the axon relay kills programs at ~60 s,
    # scripts/probe_tpu_fault.py); the chunked driver issues ONE
    # device program per Newton iteration instead, with one host sync
    # between iterations, so large validation runs complete.  Same
    # math, same kernels — only the loop lives on host.
    def _rejit(self):
        self._solve_jit = jax.jit(self._solve_impl)
        self._chunk_init_jit = jax.jit(self._chunk_init_impl)
        self._chunk_cycle_jit = jax.jit(self._chunk_cycle_impl)
        self._chunk_update_jit = jax.jit(self._chunk_update_impl)
        self._chunk_pstate_jit = jax.jit(self._chunk_pstate_impl)
        self._chunk_cycle_state_jit = jax.jit(self._chunk_cycle_state_impl)

    def _chunk_has_pstate(self) -> bool:
        """Pure-array preconditioner state exists for the node-block
        kinds AND for GMG (per-level linearization states + node-block
        inverses via ``builder.state``): lets the chunked driver build
        the preconditioner ONCE per Newton iteration instead of once
        per Krylov restart cycle, and carry it across iterations under
        skip-Newton."""
        if self._mg_builder is not None:
            return hasattr(self._mg_builder, "state")
        return self.precond_kind in ("jacobi", "block_jacobi")

    def _chunk_pstate_impl(self, u, uprev_combo, t, alpha0, sdt, C):
        from ..ops.preconditioners import node_blocks_to_state
        _, _, _, mask, fq = self._make_problem(
            uprev_combo, t, alpha0, sdt, C)
        if self._mg_builder is not None:
            return self._mg_builder.state(
                self.hc.distribute(u), uprev_combo, fq, alpha0, sdt,
                mask, C["mg"])
        blocks = self.op.node_blocks(self.hc.distribute(u), mask,
                                     uprev_combo, fq, alpha0, sdt, C=C)
        blocks = self.bh.slip_project_blocks(blocks)
        return node_blocks_to_state(self.precond_kind, blocks, mask)

    def _chunk_cycle_state_impl(self, u, R, x, atol, pstate,
                                uprev_combo, t, alpha0, sdt, C):
        from .newton import newton_linear_cycle
        from ..ops.preconditioners import apply_node_block_state
        _, residual, _, mask, fq = self._make_problem(
            uprev_combo, t, alpha0, sdt, C)
        if self._mg_builder is not None:
            precond = self._mg_builder(
                self.hc.distribute(u), uprev_combo, fq, alpha0, sdt,
                mask, C["mg"], pstate=pstate)
        else:
            precond = lambda v: apply_node_block_state(pstate, v)
        return newton_linear_cycle(
            residual, u, R, x, atol, precond=precond,
            config=self.newton_cfg)

    def _chunk_init_impl(self, u0, uprev_combo, t, alpha0, sdt, C):
        constrain, residual, _, _, _ = self._make_problem(
            uprev_combo, t, alpha0, sdt, C)
        u0 = constrain(u0)
        R = residual(u0)
        return u0, R, jnp.sqrt(jnp.sum(R * R))

    def _chunk_cycle_impl(self, u, R, x, atol, uprev_combo, t, alpha0,
                          sdt, C):
        from .newton import newton_linear_cycle
        _, residual, precond_builder, _, _ = self._make_problem(
            uprev_combo, t, alpha0, sdt, C)
        return newton_linear_cycle(residual, u, R, x, atol,
                                   precond=precond_builder(u),
                                   config=self.newton_cfg)

    def _chunk_update_impl(self, u, d, rnorm, uprev_combo, t, alpha0,
                           sdt, C):
        from .newton import newton_apply_update
        _, residual, _, _, _ = self._make_problem(
            uprev_combo, t, alpha0, sdt, C)
        return newton_apply_update(residual, u, d, rnorm,
                                   config=self.newton_cfg)

    def _use_chunked_newton(self) -> bool:
        import os
        flag = os.environ.get("SOFTX_NEWTON_CHUNK", "")
        if flag == "1":
            return True
        if flag == "0":
            return False
        # auto: real-TPU backend + big enough that one fused solve may
        # exceed the runtime's single-program wall-time bound.  The
        # watchdog is a TPU-relay property; GPUs and other backends keep
        # the zero-host-sync fused driver unless forced by env.
        try:
            backend = jax.default_backend()
        except Exception:
            return False
        thresh = int(os.environ.get("SOFTX_CHUNK_THRESHOLD", "100000"))
        n_dofs = self.space.n_nodes * (self.dim + 1)
        return backend == "tpu" and n_dofs >= thresh

    def _gmg_fallback(self):
        """Swap a stagnating GMG preconditioner for block-Jacobi.

        Measured (scripts/diag_sphere_gmg.py): on steady strongly
        convective decks — the config-#5 sphere — the V-cycle's
        rediscretized coarse correction amplifies smooth convective
        modes (stationary factor ~2 regardless of smoother strength or
        bottom-solve accuracy) and FGMRES stagnates, while plain
        block-Jacobi FGMRES converges.  The reference's ILU/AMG slot is
        robust there; detecting linear-solve stagnation at runtime and
        dropping to block-Jacobi restores that parity without giving up
        GMG where it is measured far stronger (transient/mass-dominated
        and diffusion-dominated steady decks: 9x fewer iterations on
        the cavity)."""
        print("linear solver: GMG stagnated (linear budget exhausted); "
              "falling back to block-Jacobi preconditioning")
        self._gmg_strikes = getattr(self, "_gmg_strikes", 0) + 1
        self._gmg_stash = (self._mg_builder, self._consts.get("mg"),
                           self.precond_kind)
        self._mg_builder = None
        self.precond_kind = "block_jacobi"
        self._consts.pop("mg", None)
        self._rejit()

    def _gmg_probation(self):
        """Restore a fallen-back GMG preconditioner for the NEXT
        nonlinear solve — once.

        A single stagnated solve (the impulsive first transient step,
        say) must not doom every later solve to block-Jacobi: on the
        developed transient cylinder system GMG is measured ~100x
        stronger (scripts/diag_sphere_gmg.py CASE=cylinder DT=0.01:
        16 vs 2000 FGMRES iters).  After a second stagnation the swap
        is permanent — the steady convection-dominated regime where
        block-Jacobi is the robust choice (config #5)."""
        if (getattr(self, "_gmg_stash", None) is not None
                and getattr(self, "_gmg_strikes", 0) < 2):
            builder, mg, kind = self._gmg_stash
            self._gmg_stash = None
            self._mg_builder = builder
            self.precond_kind = kind
            self._consts["mg"] = mg
            self._rejit()

    def _newton_chunked(self, u0, uprev_combo, t, alpha0, sdt):
        import numpy as _np
        self._gmg_probation()
        cfg = self.newton_cfg
        u, R, rnorm = self._chunk_init_jit(
            u0, uprev_combo, t, alpha0, sdt, self._consts)
        hist = _np.full(cfg.max_iterations + 1, _np.nan)
        alphas = _np.full(cfg.max_iterations, _np.nan)
        rn = float(rnorm)          # host sync bounds program wall time
        hist[0] = rn
        it = lin_total = 0
        # node-block preconditioner state: built once per Newton
        # iteration (not per Krylov cycle); under skip_newton rebuilt
        # only every `skip iterations` (reference
        # SkipNewtonNonLinearSolver semantics)
        pstate = None
        skip = (max(1, cfg.skip_iterations)
                if self.prm.nonlinear_solver.solver == "skip_newton"
                else 1)
        def _stalled():
            # windowed f32-floor guard (NewtonConfig.stall_window)
            W = cfg.stall_window
            return it >= W and rn > cfg.stall_factor * hist[it - W]

        u_best, n_best = u, rn     # best-iterate tracking (see
        #                            newton.py body — same semantics)
        while (rn > cfg.tolerance and it < cfg.max_iterations
               and not _stalled()):
            # linear solve, host-chunked at the restart-cycle level: one
            # device program per GMRES(m) cycle (<= gmres_restart
            # matvecs each) so no single program can outlive the
            # runtime's wall-time bound
            atol = jnp.asarray(
                max(cfg.relative_residual * rn, cfg.minimum_residual),
                u.dtype)
            x = jnp.zeros(u.size, u.dtype)
            use_pstate = self._chunk_has_pstate()
            if use_pstate and (pstate is None or it % skip == 0):
                pstate = self._chunk_pstate_jit(
                    u, uprev_combo, t, alpha0, sdt, self._consts)
            for _cyc in range(cfg.max_krylov_cycles):
                if use_pstate:
                    x, lrn, j = self._chunk_cycle_state_jit(
                        u, R, x, atol, pstate, uprev_combo, t, alpha0,
                        sdt, self._consts)
                else:
                    x, lrn, j = self._chunk_cycle_jit(
                        u, R, x, atol, uprev_combo, t, alpha0, sdt,
                        self._consts)
                j = int(j)
                lin_total += j
                if j == 0 or float(lrn) <= float(atol):
                    break
            else:
                if self._mg_builder is not None:
                    # budget exhausted without convergence: GMG is
                    # hurting on this system — retry the iteration
                    # with block-Jacobi
                    self._gmg_fallback()
                    continue
            u, R, rnorm, alpha = self._chunk_update_jit(
                u, x, rnorm, uprev_combo, t, alpha0, sdt, self._consts)
            rn = float(rnorm)
            it += 1
            hist[it] = rn
            alphas[it - 1] = float(alpha)
            if rn < n_best:
                u_best, n_best = u, rn
        u = u_best
        if self.hc.n:
            u = jax.jit(self.hc.distribute)(u)
        from .newton import NewtonResult
        return NewtonResult(
            u=u, res_history=jnp.asarray(hist, u.dtype),
            n_iterations=jnp.asarray(it),
            linear_iters=jnp.asarray(lin_total),
            alphas=jnp.asarray(alphas, u.dtype))

    def _newton(self, u0, uprev_combo, t, alpha0, sdt):
        """One nonlinear solve via the fused driver (default) or the
        host-chunked driver (watchdog-bounded runtimes / env)."""
        if self._use_chunked_newton():
            return self._newton_chunked(u0, uprev_combo, t, alpha0, sdt)
        return self._solve_jit(u0, uprev_combo, t, alpha0, sdt,
                               self._consts)

    # ------------------------------------------------------------------
    def initial_condition(self):
        """set_initial_condition (nodal / none; viscous pre-solve below)."""
        prm = self.prm
        N, c = self.space.n_nodes, self.dim + 1
        u = jnp.zeros((N, c))
        if prm.initial_conditions.type == "nodal":
            expr = VectorExpression(prm.initial_conditions.uvwp)
            pts = jnp.asarray(self.space.nodes)
            vals = expr.spatial(pts, 0.0)
            u = vals[:, :c] if vals.shape[-1] >= c else \
                jnp.pad(vals, ((0, 0), (0, c - vals.shape[-1])))
        elif prm.initial_conditions.type == "L2projection":
            expr = VectorExpression(prm.initial_conditions.uvwp)
            u = self._l2_project(expr)
        elif prm.initial_conditions.type == "viscous":
            # steady pre-solve with the IC viscosity, then restore the
            # run operator (reference: solve with inflated nu, restore nu)
            op_run = self.op
            self.op = GLSOperator(self.space,
                                  prm.initial_conditions.viscosity,
                                  n_q1d=prm.fem.n_quadrature_points_1d,
                                  stab=op_run.stab)
            self._rejit()
            res = self._newton(self.bh.constrain(u, 0.0),
                               self._zero_prev, 0.0, 0.0, 0.0)
            u = res.u
            self.op = op_run
            self._rejit()
        return self.bh.constrain(u, 0.0)

    # ------------------------------------------------------------------
    def _l2_project(self, expr):
        """True L2 projection onto the FE space (reference IC type
        'L2projection'): matrix-free mass solve with CG + lumped-mass
        Jacobi preconditioning."""
        from ..fem.geometry import det_and_inv
        from ..ops.operators import gather_elements, scatter_add_elements
        op = self.op
        c = self.dim + 1
        J = jnp.einsum("eni,qnj->eqij", op.xe, op.G)
        detJ, _ = det_and_inv(J)
        wdet = detJ * op.w[None, :]                      # [E, nq]

        fvals = expr.spatial(op.qpts_phys, 0.0)[..., :c]  # [E, nq, c]
        rhs_el = jnp.einsum("qn,eq,eqc->enc", op.B, wdet, fvals)
        rhs = scatter_add_elements(rhs_el, op.elem_nodes, op.n_nodes,
                                   amap=op.amap)
        lump_el = jnp.einsum("qn,eq->en", op.B, wdet)[:, :, None]
        lumped = scatter_add_elements(lump_el, op.elem_nodes,
                                      op.n_nodes, amap=op.amap)[:, 0]

        def mass_apply(v_flat):
            v = v_flat.reshape(op.n_nodes, c)
            ve = gather_elements(v, op.elem_nodes)
            vq = jnp.einsum("qn,enc->eqc", op.B, ve)
            back = jnp.einsum("qn,eq,eqc->enc", op.B, wdet, vq)
            Mv = scatter_add_elements(back, op.elem_nodes, op.n_nodes,
                                      amap=op.amap)
            return Mv.reshape(-1)

        from ..ops.linalg import gmres
        lumped_flat = jnp.repeat(lumped, c)
        x, rnorm, it = gmres(
            mass_apply, rhs.reshape(-1),
            precond=lambda v: v / lumped_flat,
            m=50, max_restarts=10,
            atol=1e-10 * float(jnp.linalg.norm(rhs)))
        return x.reshape(op.n_nodes, c)

    def solve_steady(self, u0=None, verbose: bool | None = None):
        """One steady nonlinear solve; returns (u, NewtonResult)."""
        if u0 is None:
            u0 = self.initial_condition()
        if self.prm.nonlinear_solver.solver == "pseudo_transient":
            res = self.solve_steady_ptc(u0, verbose=verbose)
            return res.u, res
        res = self._newton(u0, self._zero_prev, 0.0, 0.0, 0.0)
        self._log_newton(res, verbose)
        return res.u, res

    def solve_steady_ptc(self, u0, verbose: bool | None = None):
        """Pseudo-transient continuation (deck: non-linear solver
        ``solver = pseudo_transient``).

        One backward-Euler Newton iteration per pseudo-step with the dt
        grown by SER (dt_{k+1} = dt_k ||R_{k-1}||/||R_k||, capped) until
        the STEADY residual meets the nonlinear tolerance.  As dt -> inf
        the pseudo-step IS a plain Newton step, so terminal convergence
        is quadratic; early steps are mass-dominated systems where the
        block-Jacobi/GMG preconditioners are strongest (plain Newton on
        strongly convective steady decks — the config-#5 sphere — stalls
        with any of them, scripts/diag_sphere_gmg.py).  The reference
        has no PTC; its ILU-preconditioned Newton slot covers these
        cases (SURVEY §7.3 hard part #2) — this is the TPU-native
        equivalent in robustness, built from the same chunked-driver
        primitives (one bounded device program per Krylov cycle).
        """
        import numpy as _np
        self._gmg_probation()
        nls = self.prm.nonlinear_solver
        cfg = self.newton_cfg
        d = self.dim
        C = self._consts
        if verbose is None:
            verbose = (nls.verbosity is Verbosity.verbose
                       and not self.prm.test.enable)
        u, _, rs0 = self._chunk_init_jit(u0, self._zero_prev, 0.0,
                                         0.0, 0.0, C)
        rs = float(rs0)
        dt = nls.ptc_initial_dt
        maxk = nls.ptc_max_steps
        hist = _np.full(maxk + 1, _np.nan)
        alphas = _np.full(maxk, _np.nan)
        hist[0] = rs
        lin_total = 0
        k = 0
        def _ptc_stalled():
            # windowed f32-floor guard, active once the pseudo-step is
            # effectively infinite (the PTC residual is not monotone
            # while dt ramps)
            W = cfg.stall_window
            return (dt >= nls.ptc_max_dt and k >= W
                    and rs > cfg.stall_factor * hist[k - W])

        u_best, n_best = u, rs     # best-iterate tracking (newton.py)
        while (rs > cfg.tolerance and k < maxk
               and not _ptc_stalled()):
            alpha0 = 1.0 / dt
            combo = -u[:, :d] * alpha0
            _, Rbe, rbe = self._chunk_init_jit(u, combo, 0.0, alpha0,
                                               alpha0, C)
            rbe_f = float(rbe)
            atol = jnp.asarray(
                max(cfg.relative_residual * rbe_f, cfg.minimum_residual),
                u.dtype)
            x = jnp.zeros(u.size, u.dtype)
            use_pstate = self._chunk_has_pstate()
            if use_pstate:
                pstate = self._chunk_pstate_jit(
                    u, combo, 0.0, alpha0, alpha0, C)
            for _cyc in range(cfg.max_krylov_cycles):
                if use_pstate:
                    x, lrn, j = self._chunk_cycle_state_jit(
                        u, Rbe, x, atol, pstate, combo, 0.0, alpha0,
                        alpha0, C)
                else:
                    x, lrn, j = self._chunk_cycle_jit(
                        u, Rbe, x, atol, combo, 0.0, alpha0, alpha0, C)
                j = int(j)
                lin_total += j
                if j == 0 or float(lrn) <= float(atol):
                    break
            else:
                if self._mg_builder is not None:
                    self._gmg_fallback()
                    continue
            u, _, _, alpha = self._chunk_update_jit(
                u, x, rbe, combo, 0.0, alpha0, alpha0, C)
            u, _, rs_new = self._chunk_init_jit(u, self._zero_prev, 0.0,
                                                0.0, 0.0, C)
            rs_new = float(rs_new)
            # SER growth on the steady residual, clamped
            growth = min(nls.ptc_growth,
                         max(0.1, rs / max(rs_new, 1e-300)))
            dt = min(nls.ptc_max_dt, dt * growth)
            rs = rs_new
            k += 1
            hist[k] = rs
            alphas[k - 1] = float(alpha)
            if rs < n_best:
                u_best, n_best = u, rs
            if verbose:
                prec = self.prm.simulation_control.log_precision
                print(f"PTC step {k:3d}  dt = {dt:.3e}  "
                      f"Residual: {rs:.{prec}e}")
        from .newton import NewtonResult
        return NewtonResult(
            u=u_best, res_history=jnp.asarray(hist, u.dtype),
            n_iterations=jnp.asarray(k),
            linear_iters=jnp.asarray(lin_total),
            alphas=jnp.asarray(alphas, u.dtype))

    def solve_sdirk_step(self, u, t_old, dt, order, verbose=None):
        """One SDIRK22/SDIRK33 step (reference: sdirk_coefficients +
        stage sequencing in iterate(), SURVEY.md §2.1/§2.2).

        Each stage solves the implicit system with
        udot = (u_s - u_n - dt sum_{j<s} A[s,j] k_j) / (dt A[s,s]),
        i.e. alpha0 = 1/(dt*A[s,s]) and the rest in the combo term;
        stage derivatives k_j are recovered after each stage.  Both
        schemes are stiffly accurate: u_{n+1} = last stage.
        """
        from ..core.sdirk import sdirk_coefficients
        table = sdirk_coefficients(order, dt)
        n_stage = order
        A = table[:, :n_stage]
        c = table[:, n_stage]
        d = self.dim
        u_n = u
        ks = []
        res = None
        for s_i in range(n_stage):
            gamma = A[s_i, s_i]
            alpha0 = 1.0 / (dt * gamma)
            combo = -u_n[:, :d] * alpha0
            for j in range(s_i):
                combo = combo - (A[s_i, j] / gamma) * ks[j]
            t_stage = t_old + c[s_i] * dt
            res = self._newton(u, combo, t_stage, alpha0, 1.0 / dt)
            self._log_newton(res, verbose)
            u_s = res.u
            k_s = alpha0 * u_s[:, :d] + combo
            ks.append(k_s)
            u = u_s
        return u, res

    def solve_transient_step(self, u, previous, t, dts, order, verbose=None):
        """One implicit BDF step.

        previous: list of earlier solutions, newest first (u^{n-1}, ...).
        dts: step sizes, dts[0] = current. order: effective BDF order.
        Returns (u_new, NewtonResult).
        """
        alpha = bdf_coefficients(order, dts)
        combo = jnp.zeros_like(self._zero_prev)
        for i in range(1, order + 1):
            combo = combo + alpha[i] * previous[i - 1][:, :self.dim]
        res = self._newton(u, combo, t, float(alpha[0]),
                           1.0 / float(dts[0]))
        self._log_newton(res, verbose)
        return res.u, res

    # ------------------------------------------------------------------
    def run_transient(self, u0=None, on_step=None, verbose=None,
                      history_from_exact: bool = False):
        """Transient BDF time loop (reference §3.2 call stack).

        BDF startup ramps the order 1 -> target using available history
        (the reference's first_iteration() startup analogue); with
        ``history_from_exact`` the BDF history is seeded from the
        analytical solution at negative times instead (full order from
        the first step — used by temporal-order verification).  CFL-driven
        dt adaptation via SimulationControl.  ``on_step(solver, u, t)``
        is the postprocess/output hook.  Returns the final solution.
        """
        ctrl = self.control
        sdirk_order = (int(ctrl.method.value[-1])
                       if ctrl.method.is_sdirk else 0)
        target_order = ctrl.method.bdf_order
        if target_order == 0 and sdirk_order == 0:
            raise ValueError("run_transient requires a bdf/sdirk method")
        target_order = max(target_order, 1)
        if u0 is None:
            u0 = self.initial_condition()
        u = u0
        previous = [u0] * 3    # newest first
        if history_from_exact:
            if self.exact is None:
                raise ValueError("history_from_exact needs an analytical "
                                 "solution")
            pts = jnp.asarray(self.space.nodes)
            c = self.dim + 1
            previous = [u0] + [
                self.exact.spatial(pts, ctrl.time - i * ctrl.dt)[:, :c]
                for i in (1, 2)]
            # pre-fill the dt history so the first step runs at full order
            ctrl.dt_history = [ctrl.dt] * target_order

        prm = self.prm
        if prm.restart.restart:
            u, previous = self.read_checkpoint()

        # reference first_iteration() semantics: `startup time scaling`
        # subdivides the first step(s) into lower-order sub-steps of
        # sizes (s*dt, (1-s)*dt), building genuine history so the target
        # order starts with full temporal accuracy (SURVEY §2.1/§3.2)
        s_scale = prm.simulation_control.startup_timestep_scaling
        startup_left = 0
        if (target_order >= 2 and not sdirk_order
                and 0.0 < s_scale < 1.0
                and not history_from_exact and not prm.restart.restart):
            startup_left = target_order - 1

        while not ctrl.is_at_end():
            ctrl.integrate()
            order = ctrl.effective_bdf_order()
            t = ctrl.time
            if startup_left > 0 and not sdirk_order:
                k = target_order - startup_left   # 1st split: k=1, ...
                dt_full = ctrl.dt_history[0]
                dt_a = s_scale * dt_full
                dt_b = dt_full - dt_a
                dts_a = [dt_a] + ctrl.dt_history[1:]
                with self.timer.section("solve"):
                    u, _ = self.solve_transient_step(
                        u, previous, t - dt_b, dts_a,
                        min(k, len(dts_a)), verbose=verbose)
                previous = [u] + previous[:2]
                dts_b = [dt_b, dt_a] + ctrl.dt_history[1:]
                with self.timer.section("solve"):
                    u, res = self.solve_transient_step(
                        u, previous, t, dts_b,
                        min(k + 1, len(dts_b)), verbose=verbose)
                previous = [u] + previous[:2]
                # record the true sub-step sizes for later variable-dt
                # BDF weights (and for restart fidelity)
                ctrl.dt_history = ([dt_b, dt_a]
                                   + ctrl.dt_history[1:])[:4]
                startup_left -= 1
                ctrl.cfl = float(self.op.cfl(u, ctrl.dt))
                with self.timer.section("postprocess"):
                    self.postprocess(u, t)
                    if self.exact is not None and (
                            prm.analytical_solution.verbosity
                            is Verbosity.verbose or prm.test.enable):
                        ev, ep = self.l2_errors(u, t)
                        prec = prm.simulation_control.log_precision
                        print(f"L2 error velocity : {ev:.{prec}e}")
                if ctrl.is_output_iteration():
                    self.write_output(u, t)
                if prm.restart.checkpoint and \
                        ctrl.iteration % prm.restart.frequency == 0:
                    self.write_checkpoint(u, previous)
                if on_step is not None:
                    on_step(self, u, t)
                continue
            if (prm.simulation_control.method is not TimeSteppingMethod.steady
                    and not prm.test.enable and verbose is not False):
                prec = prm.simulation_control.log_precision
                print(f"*** Time step : {ctrl.iteration}  "
                      f"time = {t:.{prec}g}  dt = {ctrl.dt:.{prec}g} ***")
            with self.timer.section("solve"):
                if sdirk_order:
                    u, res = self.solve_sdirk_step(
                        u, t - ctrl.dt, ctrl.dt, sdirk_order,
                        verbose=verbose)
                else:
                    u, res = self.solve_transient_step(
                        u, previous, t, ctrl.dts(), order, verbose=verbose)
            ctrl.cfl = float(self.op.cfl(u, ctrl.dt))
            previous = [u] + previous[:2]
            with self.timer.section("postprocess"):
                self.postprocess(u, t)
                if self.exact is not None and (
                        prm.analytical_solution.verbosity is Verbosity.verbose
                        or prm.test.enable):
                    ev, ep = self.l2_errors(u, t)
                    prec = prm.simulation_control.log_precision
                    print(f"L2 error velocity : {ev:.{prec}e}")
            if ctrl.is_output_iteration():
                self.write_output(u, t)
            if (prm.mesh_adaptation.type == "kelly"
                    and prm.mesh_adaptation.frequency > 0
                    and ctrl.iteration % prm.mesh_adaptation.frequency == 0):
                # transfer the solution AND the BDF history (hard part #4)
                fields = self.refine_mesh_kelly([u] + previous)
                u, previous = fields[0], list(fields[1:])
            # checkpoint AFTER adaptation: a restart must resume on the
            # adapted forest, or the same-iteration adaptation is lost
            # and the restarted trajectory diverges from the full run
            if prm.restart.checkpoint and \
                    ctrl.iteration % prm.restart.frequency == 0:
                self.write_checkpoint(u, previous)
            if on_step is not None:
                on_step(self, u, t)
            if prm.timer.type == "iteration":
                print(self.timer.report())
                self.timer.reset()
        self.write_tables()
        if prm.timer.type == "end":
            print(self.timer.report())
        return u

    def solve(self, on_cycle=None):
        """Full reference-style orchestration (steady path).

        Steady: mesh-adaptation cycles (uniform implemented; kelly lands
        with the AMR subsystem), each cycle solve + L2-error table row.
        Transient: delegates to run_transient.
        Returns the final solution.
        """
        prm = self.prm
        if not self.control.is_steady():
            return self.run_transient(on_step=on_cycle)
        n_cycles = prm.simulation_control.number_mesh_adaptation + 1
        u = None
        for cycle in range(n_cycles):
            u0 = None
            if cycle > 0:
                if prm.mesh_adaptation.type == "kelly":
                    u0 = self.refine_mesh_kelly([u])[0]
                elif prm.mesh_adaptation.type in ("uniform", "none"):
                    self.setup(self._mesh.refine_uniform(1))
                else:
                    raise ValueError(
                        f"unknown adaptation type "
                        f"{prm.mesh_adaptation.type!r}")
            with self.timer.section("solve"):
                u, res = self.solve_steady(u0=u0)
            if self.exact is not None:
                ev, ep = self.l2_errors(u)
                self.tables["L2"].append(
                    {"cells": self.space.n_elements,
                     "dofs": self.space.n_dofs(self.dim + 1),
                     "error_velocity": ev, "error_pressure": ep})
                if (prm.analytical_solution.verbosity is Verbosity.verbose
                        or prm.test.enable):
                    prec = prm.simulation_control.log_precision
                    print(f"L2 error velocity : {ev:.{prec}e}  "
                          f"L2 error pressure: {ep:.{prec}e}")
            with self.timer.section("postprocess"):
                self.postprocess(u, 0.0)
            if prm.simulation_control.output_frequency > 0:
                self.write_output(u, 0.0)
            if on_cycle is not None:
                on_cycle(self, u, 0.0)
        self.write_tables()
        if self.tables["L2"]:
            t = Table(["cells", "dofs", "error_velocity", "error_pressure"])
            for row in self.tables["L2"]:
                t.add_row(row)
            t.write(os.path.join(prm.simulation_control.output_path,
                                 prm.analytical_solution.filename + ".dat"))
        if prm.timer.type == "end":
            print(self.timer.report())
        return u

    # ------------------------------------------------------------------
    # adaptive mesh refinement (reference: refine_mesh_kelly, §2.2)
    # ------------------------------------------------------------------
    def refine_mesh_kelly(self, fields: list):
        """Kelly estimate -> flag -> forest refine/coarsen/balance ->
        rebuild space -> transfer all fields (incl. BDF history).

        fields: list of [N, c*] arrays on the CURRENT space.
        Returns the transferred fields on the new space.
        """
        if self.forest is None:
            raise ValueError("kelly adaptation requires the forest path "
                             "(set mesh adaptation type = kelly)")
        ma = self.prm.mesh_adaptation
        u = fields[0]
        with self.timer.section("kelly_estimate"):
            eta = kelly_estimate(self.op, u, variable=ma.variable,
                                 nc_faces=self._nc_faces)
        refine_mask, coarsen_mask = flag_cells(
            eta, fraction_type=ma.fraction_type,
            refine_fraction=ma.fraction_refinement,
            coarsen_fraction=ma.fraction_coarsening)

        b_arr, lvl_arr, idx_arr = self.forest._leaf_arrays_only()
        E = len(b_arr)
        d = self.dim
        # level clamps + element budget (all-array: the python
        # tuple-indexed marking was a measured cost at 10^6 leaves)
        ref_idx = np.where(refine_mask
                           & (lvl_arr < ma.max_refinement_level))[0]
        budget = (ma.max_number_elements - E) // (2 ** d - 1)
        if budget < len(ref_idx):
            sel = np.argsort(-eta[ref_idx], kind="stable")
            ref_idx = ref_idx[sel[:max(0, budget)]]
        coa_idx = np.where(coarsen_mask
                           & (lvl_arr > ma.min_refinement_level))[0]
        rows = np.column_stack([b_arr, lvl_arr, idx_arr])
        marked_ref = rows[ref_idx]
        marked_coa = rows[coa_idx]

        # snapshot the old forest/space for the transfer
        old_space, old_elem_of = self.space, self._elem_of
        snap = Forest.__new__(Forest)
        snap.base = self.forest.base
        snap.dim = self.forest.dim
        snap.leaves = [set(s) for s in self.forest.leaves]
        snap._adjacency = self.forest._adjacency

        with self.timer.section("refine"):
            self.forest.coarsen(marked_coa)
            self.forest.refine(marked_ref)
            self.forest.balance()
            mesh, elem_of, ncf = self.forest.build_mesh()
            self._elem_of = elem_of
        with self.timer.section("setup"):
            self.setup(mesh=mesh, nc_faces=ncf)
        with self.timer.section("transfer"):
            out = transfer_solution(old_space, snap, old_elem_of,
                                    self.space, self.forest, elem_of,
                                    fields)
        if not self.prm.test.enable:
            print(f"Mesh adaptation: {E} -> {self.space.n_elements} "
                  f"cells, {self.space.n_dofs(self.dim + 1)} dofs")
        return out

    # ------------------------------------------------------------------
    # postprocessing (reference: postprocess() in §3.1/3.2 call stacks)
    # ------------------------------------------------------------------
    def _pin_pressure(self, u):
        """Remove the constant-pressure nullspace component before force
        and torque integration on decks where nothing fixes the pressure
        level (no outlet BC): on all-Dirichlet problems the discrete GLS
        system leaves the constant mode free, so the Newton path (driver
        variant, device count, f32 vs f64) would otherwise leak an
        arbitrary offset into the pressure-containing force components
        (Fx on x-walls, Fy on y-walls).  The analytical-solution L2 path
        already mean-shifts pressure; this is the forces analogue.
        Volume-weighted mean via the operator's quadrature (host NumPy —
        one shot per output step, no device compiles)."""
        from ..core.parameters import BoundaryType
        if any(bc.type == BoundaryType.outlet
               for bc in self.prm.boundary_conditions.bcs):
            return u
        cache = getattr(self, "_pin_cache", None)
        if cache is None or cache[0] is not self.op:
            op = self.op
            J = np.einsum("eni,qnj->eqij", np.asarray(op.xe, np.float64),
                          np.asarray(op.G, np.float64))
            wdet = np.linalg.det(J) * np.asarray(op.w, np.float64)
            cache = (op, wdet, float(wdet.sum()),
                     np.asarray(op.B, np.float64))
            self._pin_cache = cache
        _, wdet, vol, B = cache
        u_np = np.asarray(u)
        pe = u_np[np.asarray(self.op.elem_nodes), -1]        # [E, nn]
        pq = np.einsum("qn,en->eq", B, pe)
        mean = float(np.sum(wdet * pq) / vol)
        return jnp.asarray(u_np - mean * np.eye(u_np.shape[1])[-1],
                           dtype=u.dtype if hasattr(u, "dtype") else None)

    def postprocess(self, u, t: float) -> None:
        prm = self.prm
        prec = prm.forces.output_precision
        it = self.control.iteration
        if (prm.forces.calculate_forces
                or prm.forces.calculate_torques) and \
                it % prm.forces.calculation_frequency == 0:
            u = self._pin_pressure(u)
        if prm.forces.calculate_forces and \
                it % prm.forces.calculation_frequency == 0:
            with self.timer.section("calculate_forces"):
                for bid, faces in sorted(self.space.boundary_faces.items()):
                    f = np.asarray(post.forces_on_boundary(self.op, u, faces))
                    tab = self._force_tables.setdefault(
                        bid, Table(["time"] + [f"f_{ax}" for ax in
                                               "xyz"[:self.dim]],
                                   precision=prec))
                    tab.add_row([t] + list(map(float, f)))
                    if prm.forces.verbosity is Verbosity.verbose \
                            or prm.test.enable:
                        comps = " ".join(f"{v:.{prm.simulation_control.log_precision}e}"
                                         for v in f)
                        print(f"Force boundary {bid} : {comps}")
        if prm.forces.calculate_torques and \
                it % prm.forces.calculation_frequency == 0:
            # torques about the PER-BOUNDARY center of rotation (deck
            # keys `cor x/y/z` in each bc block — reference §2.2)
            cor = {bc.id: np.asarray(bc.center_of_rotation(self.dim))
                   for bc in prm.boundary_conditions.bcs}
            with self.timer.section("calculate_torques"):
                for bid, faces in sorted(self.space.boundary_faces.items()):
                    tq = np.asarray(post.torques_on_boundary(
                        self.op, u, faces,
                        center=cor.get(bid, np.zeros(self.dim))))
                    tab = self._torque_tables.setdefault(
                        bid, Table(["time"] + [f"T_{i}" for i in
                                               range(tq.shape[0])],
                                   precision=prec))
                    tab.add_row([t] + list(map(float, tq)))
        pp = prm.post_processing
        if (pp.calculate_kinetic_energy or pp.calculate_enstrophy) and \
                it % pp.calculation_frequency == 0:
            with self.timer.section("postprocess_energy"):
                row = {"time": t}
                if pp.calculate_kinetic_energy:
                    row["kinetic-energy"] = float(post.kinetic_energy(self.op, u))
                    self.tables["ke"].append((t, row["kinetic-energy"]))
                if pp.calculate_enstrophy:
                    row["enstrophy"] = float(post.enstrophy(self.op, u))
                    self.tables["enstrophy"].append((t, row["enstrophy"]))
                if pp.verbosity is Verbosity.verbose or prm.test.enable:
                    msg = "  ".join(f"{k}: {v:.6e}" for k, v in row.items()
                                    if k != "time")
                    print(msg)

    def write_tables(self) -> None:
        """Write force/torque/KE tables as .dat files (reference format)."""
        prm = self.prm
        outdir = prm.simulation_control.output_path
        for bid, tab in self._force_tables.items():
            tab.write(os.path.join(
                outdir, f"{prm.forces.force_output_name}.{bid}.dat"))
        for bid, tab in self._torque_tables.items():
            tab.write(os.path.join(
                outdir, f"{prm.forces.torque_output_name}.{bid}.dat"))
        pp = prm.post_processing
        if self.tables["ke"]:
            t = Table(["time", pp.kinetic_energy_name])
            for row in self.tables["ke"]:
                t.add_row(list(row))
            t.write(os.path.join(outdir, f"{pp.kinetic_energy_name}.dat"))
        if self.tables["enstrophy"]:
            t = Table(["time", pp.enstrophy_name])
            for row in self.tables["enstrophy"]:
                t.add_row(list(row))
            t.write(os.path.join(outdir, f"{pp.enstrophy_name}.dat"))

    # ------------------------------------------------------------------
    # field output (reference: write_output_results)
    # ------------------------------------------------------------------
    def write_output(self, u, t: float) -> None:
        prm = self.prm
        sc = prm.simulation_control
        with self.timer.section("output"):
            it = self.control.iteration
            un = np.asarray(u)
            pdata = {"velocity": un[:, :self.dim],
                     "pressure": un[:, self.dim]}
            pdata["vorticity"] = np.asarray(
                post.vorticity_field(self.op, u))
            pdata["q_criterion"] = np.asarray(
                post.q_criterion_field(self.op, u))
            s = max(1, sc.subdivision)
            if s in (1, self.space.degree):
                # shared-node path: Qk elements as k^dim linear subcells
                points = self.space.nodes
                cells = subcell_connectivity(self.space.elem_nodes,
                                             self.space.degree, self.dim)
            else:
                # deck `subdivision`: per-element (s+1)^dim patches
                # (reference DataOut::build_patches high-order viz)
                from ..utils.vtu import subdivide_patches
                points, cells, pdata = subdivide_patches(
                    self.space, pdata, s)
            basename = f"{sc.output_name}.{it:05d}"
            if sc.group_files > 1:
                # grouped pieces + .pvtu master (reference
                # write_vtu_with_pvtu_record / MPI I/O groups; at the
                # default `group files = 1` a single .vtu is the whole
                # group, so no master is needed)
                from ..utils.vtu import write_grouped_output
                name = write_grouped_output(
                    sc.output_path, basename, points, cells, pdata,
                    sc.group_files)
            else:
                name = basename + ".vtu"
                write_vtu(os.path.join(sc.output_path, name),
                          points, cells, pdata)
            self.pvd.append(t, name)
            self.pvd.write(os.path.join(
                sc.output_path, sc.output_name + ".pvd"))

    # ------------------------------------------------------------------
    # checkpoint / restart (reference §3.4, §5.4)
    # ------------------------------------------------------------------
    def write_checkpoint(self, u, previous) -> None:
        prm = self.prm
        path = os.path.join(prm.simulation_control.output_path,
                            prm.restart.filename)
        with self.timer.section("checkpoint"):
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            # atomic write (temp + rename): a crash mid-write never
            # corrupts the last good checkpoint (reference §5.4 parity)
            tmp = path + ".tmp.npz"
            extras = {}
            if self.forest is not None:
                # forest topology (triangulation.save equivalent,
                # reference §3.4): base mesh + leaf set restore an
                # ADAPTED mesh exactly, so mid-AMR transients resume
                rows = []
                for b, leafset in enumerate(self.forest.leaves):
                    for leaf in sorted(leafset):
                        rows.append((b,) + leaf)
                extras["forest_leaves"] = np.asarray(rows, np.int64)
                extras["base_vertices"] = self.forest.base.vertices
                extras["base_cells"] = self.forest.base.cells
            if u is not None:
                extras["u"] = np.asarray(u)
                extras["previous"] = np.stack(
                    [np.asarray(p) for p in previous])
            # u=None: manifest-only (forest/control/pvd) — the sharded
            # CLI stores fields in per-shard files (reference §5.4
            # parallel restart; write high-water ~1/P of global state)
            np.savez(
                tmp,
                control=json.dumps(self.control.serialize()),
                pvd=json.dumps(self.pvd.serialize()),
                n_nodes=self.space.n_nodes,
                degree=self.space.degree,
                **extras)
            os.replace(tmp, path + ".npz")

    def read_checkpoint(self):
        prm = self.prm
        path = os.path.join(prm.simulation_control.output_path,
                            prm.restart.filename) + ".npz"
        data = np.load(path, allow_pickle=False)
        if "forest_leaves" in data:
            if self.forest is None:
                raise ValueError(
                    "checkpoint holds an adapted forest but the deck "
                    "does not enable kelly adaptation")
            base = self.forest.base
            if (data["base_vertices"].shape != base.vertices.shape
                    or not np.allclose(data["base_vertices"],
                                       base.vertices)
                    or not np.array_equal(data["base_cells"],
                                          base.cells)):
                raise ValueError("checkpoint base mesh does not match "
                                 "the deck's")
            leaves = [set() for _ in range(base.n_cells)]
            for row in data["forest_leaves"]:
                leaves[int(row[0])].add(tuple(int(x) for x in row[1:]))
            self.forest.leaves = leaves
            mesh, elem_of, ncf = self.forest.build_mesh()
            self._elem_of = elem_of
            self.setup(mesh=mesh, nc_faces=ncf)
        if int(data["n_nodes"]) != self.space.n_nodes or \
                int(data["degree"]) != self.space.degree:
            raise ValueError("checkpoint does not match current mesh/space")
        self.control.deserialize(json.loads(str(data["control"])))
        self.pvd.deserialize(json.loads(str(data["pvd"])))
        if "u" not in data:          # manifest-only (sharded fields)
            return None, None
        u = jnp.asarray(data["u"])
        previous = [jnp.asarray(p) for p in data["previous"]]
        return u, previous

    def _log_newton(self, res, verbose=None):
        if verbose is None:
            verbose = (self.prm.nonlinear_solver.verbosity
                       is Verbosity.verbose and not self.prm.test.enable)
        if not verbose:
            return
        hist = np.asarray(res.res_history)
        prec = self.prm.simulation_control.log_precision
        for i, r in enumerate(hist):
            if np.isnan(r):
                break
            print(f"Newton iteration: {i:2d}  - Residual:  {r:.{prec}e}")

    def l2_errors(self, u, t=0.0):
        if self.exact is None:
            return None
        ev, ep = l2_error(self.op, u, self.exact, t)
        return float(ev), float(ep)
