"""Diagnose the config-#5 blocker: why GMG-FGMRES stalls on the sphere
O-grid (VERDICT r3 Missing #1).

Measures, on the FIRST Newton linear system of the sphere deck at a
small refinement (CPU, f64):
  1. FGMRES iteration count with the production V-cycle vs block-Jacobi;
  2. the V-cycle's stationary contraction factor rho(I - M^-1 J)
     (power iteration) — mesh-independent GMG has rho ~ 0.1-0.5;
  3. where the un-contracted error lives (O-grid cells vs background,
     velocity vs pressure) to localize the failure;
  4. the same numbers with the smoother applied more times / stronger,
     via env knobs.

Run:  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
          python scripts/diag_sphere_gmg.py
Knobs: REF (initial refinement, default 1), X64=0, CASE=sphere|cavity
"""

import os
import sys
import time

os.environ.setdefault("SOFTX_NEWTON_CHUNK", "0")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

if os.environ.get("X64", "1") == "1":
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

ROOT = os.path.join(os.path.dirname(__file__), "..")
CASE = os.environ.get("CASE", "sphere")
REF = int(os.environ.get("REF", "1"))

if CASE == "sphere":
    prm = SimulationParameters.from_file(
        os.path.join(ROOT, "examples", "sphere_re100.prm"), dim=3)
elif CASE == "cylinder":
    prm = SimulationParameters.from_file(
        os.path.join(ROOT, "examples", "cylinder_re100.prm"), dim=2)
    prm.fem.velocity_order = int(os.environ.get("ORDER", "2"))
    prm.fem.pressure_order = prm.fem.velocity_order
else:
    prm = SimulationParameters.from_file(
        os.path.join(ROOT, "examples", "cavity_re400.prm"), dim=2)
    if CASE == "cavity_forest":
        # route the cavity through the FOREST hierarchy (same machinery
        # as the sphere) instead of the structured lattice path — the
        # control that separates forest-path defects from physics
        prm.mesh_adaptation.type = "kelly"
        prm.linear_solver.preconditioner = "gmg"
prm.mesh.initial_refinement = REF
prm.simulation_control.output_frequency = 0
prm.forces.calculate_forces = False
prm.restart.checkpoint = False
if os.environ.get("NOSLIP_WALLS") == "1":
    from softx_2020_200_tpu.core.parameters import BoundaryType
    for bc in prm.boundary_conditions.bcs:
        if bc.type == BoundaryType.slip:
            bc.type = BoundaryType.noslip

t0 = time.time()
s = GLSNavierStokesSolver(prm)
n_levels = len(getattr(s, "_mg_ops", [])) if s._mg_builder else 1
print(f"case={CASE} ref={REF} elements={s.space.n_elements} "
      f"dofs={s.space.n_dofs(s.dim + 1)} precond={s.precond_kind} "
      f"mg_levels={n_levels} setup={time.time()-t0:.0f}s", flush=True)

u0 = s.initial_condition()
C = s._consts
# DT>0 diagnoses the TRANSIENT (BDF) linear system: alpha0 = 1.5/dt
# (BDF2 weight), sdt = 1/dt — the system the cylinder deck solves.
DT = float(os.environ.get("DT", "0"))
alpha0, sdt = (1.5 / DT, 1.0 / DT) if DT > 0 else (0.0, 0.0)
constrain, residual, precond_builder, mask, fq = s._make_problem(
    s._zero_prev, 0.0, alpha0, sdt, C)
u0 = constrain(u0)
shape = u0.shape
R0 = residual(u0)
b = -R0.reshape(-1)
bnorm = float(jnp.linalg.norm(b))
print(f"||R0|| = {bnorm:.4e}")

flat_res = lambda uf: residual(uf.reshape(shape)).reshape(-1)
_, matvec = jax.linearize(flat_res, u0.reshape(-1))
matvec = jax.jit(matvec)

from softx_2020_200_tpu.ops.linalg import gmres


def run_fgmres(pre, label, max_restarts=40):
    t1 = time.time()
    x, rn, it = gmres(matvec, b, precond=pre, m=50,
                      max_restarts=max_restarts, atol=1e-4 * bnorm,
                      flexible=True)
    x.block_until_ready()
    print(f"  {label}: iters={int(it)} rel={float(rn)/bnorm:.3e} "
          f"({time.time()-t1:.0f}s)", flush=True)
    return x


def power_iter(pre, label, n=30):
    """rho(I - M^-1 J) via power iteration; also report where the
    dominant error mode lives."""
    Efn = jax.jit(lambda v: v - pre(matvec(v)))
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (u0.size,), dtype=u0.dtype)
    v = jnp.where(mask.reshape(-1) if mask.size == u0.size
                  else jnp.repeat(mask.reshape(-1), 1), 0.0, v)
    v = v / jnp.linalg.norm(v)
    rho = None
    for i in range(n):
        w = Efn(v)
        rho = float(jnp.linalg.norm(w))
        v = w / rho
    print(f"  {label}: rho ~= {rho:.3f}", flush=True)
    # localize the dominant mode
    vm = np.abs(np.asarray(v).reshape(shape))
    node_mag = vm.sum(axis=1)
    nodes = np.asarray(s.space.nodes)
    # O-grid region = within 2.5R of the sphere center (sphere case)
    if CASE == "sphere":
        center = np.array([5.0, 0.0, 0.0])
        r = np.linalg.norm(nodes - center, axis=1)
        inner = r < 1.25
        print(f"    |mode| mass: O-grid={node_mag[inner].sum():.3f} "
              f"background={node_mag[~inner].sum():.3f} "
              f"(O-grid nodes: {inner.sum()}/{len(r)})")
    elif CASE == "cylinder":
        center = np.array([0.2, 0.2])
        r = np.linalg.norm(nodes - center, axis=1)
        inner = r < 0.1
        print(f"    |mode| mass: O-ring={node_mag[inner].sum():.3f} "
              f"background={node_mag[~inner].sum():.3f} "
              f"(O-ring nodes: {inner.sum()}/{len(r)}); "
              f"peak node r={r[np.argmax(node_mag)]:.3f} "
              f"x={nodes[np.argmax(node_mag)]}")
    print(f"    |mode| by component: u={vm[:, 0].sum():.3f} "
          f"v={vm[:, 1].sum():.3f} "
          + (f"w={vm[:, 2].sum():.3f} p={vm[:, 3].sum():.3f}"
             if s.dim == 3 else f"p={vm[:, 2].sum():.3f}"))
    return v


# --- transfer exactness: prolongation must reproduce linears ---
if s._mg_builder is not None and len(s._mg_ops) >= 2:
    mg = s._mg_consts
    cop = s._mg_ops[1]
    cn = np.asarray(cop.space.nodes)
    fn = np.asarray(s.space.nodes)
    lin_c = jnp.asarray(cn @ np.arange(1, s.dim + 1, dtype=float)
                        + 0.5)[:, None] * jnp.ones((1, s.dim + 1))
    lin_f = fn @ np.arange(1, s.dim + 1, dtype=float) + 0.5
    Pv = jnp.einsum("fm,fmc->fc", mg[1]["weights"],
                    lin_c[mg[1]["masters"]])
    err = float(jnp.max(jnp.abs(Pv[:, 0] - lin_f)))
    print(f"  prolongation linear-exactness err = {err:.2e}")

# --- production GMG V-cycle ---
if s._mg_builder is not None:
    P = precond_builder(u0)
    pre = jax.jit(lambda v: P(v.reshape(shape)).reshape(-1))
    run_fgmres(pre, "GMG-FGMRES(default)")
    power_iter(pre, "GMG rho (default jacobi smoother)")

    from softx_2020_200_tpu.ops.multigrid import make_vcycle
    from softx_2020_200_tpu.fem.constraints import HangingConstraints

    def variant(label, levels=None, **kw):
        ops = s._mg_ops if levels is None else s._mg_ops[:levels]
        mgc = C["mg"] if levels is None else C["mg"][:levels]
        bld = make_vcycle(ops, **kw)
        Pk = bld(s.hc.distribute(u0), s._zero_prev, fq, alpha0, sdt,
                 mask, mgc)
        prek = jax.jit(lambda v: Pk(v.reshape(shape)).reshape(-1))
        run_fgmres(prek, f"GMG-FGMRES({label})", max_restarts=10)
        power_iter(prek, f"GMG rho ({label})", n=20)

    if os.environ.get("LEVELS_SWEEP") == "1":
        for lv in range(2, len(s._mg_ops) + 1):
            variant(f"jacobi, levels={lv}", levels=lv, coarse_iters=300)
    elif os.environ.get("CYCLE_SWEEP") == "1":
        # r5: cycle-shape comparison on the steady convective system
        # (VERDICT r4 missing #4 — the rediscretized coarse correction
        # amplifies smooth convective modes; K-wrap line-searches it)
        for cyc in ("v", "k", "w"):
            variant(f"krylov m=4, cycle={cyc}", smoother="krylov",
                    krylov_m=4, coarse_iters=300, cycle=cyc)
    else:
        variant("jacobi, coarse=300", coarse_iters=300)
        variant("krylov m=4, coarse=300", smoother="krylov", krylov_m=4,
                coarse_iters=300)

# --- block-Jacobi for reference ---
from softx_2020_200_tpu.ops.preconditioners import build_from_node_blocks
from softx_2020_200_tpu.fem.constraints import HangingConstraints

mask_full = mask
blocks = s.op.node_blocks(s.hc.distribute(u0), mask_full, s._zero_prev,
                          fq, alpha0, sdt, C=C)
blocks = s.bh.slip_project_blocks(blocks)
Pbj = build_from_node_blocks("block_jacobi", blocks, mask_full).apply
pre_bj = jax.jit(lambda v: Pbj(v.reshape(shape)).reshape(-1))
run_fgmres(pre_bj, "blockJacobi-FGMRES", max_restarts=40)
power_iter(pre_bj, "blockJacobi rho (expect >1: unpreconditioned modes)")
