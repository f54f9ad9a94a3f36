"""Newton nonlinear driver with line search — fully jit-resident.

Rebuild of the reference's ``NewtonNonLinearSolver`` /
``SkipNewtonNonLinearSolver`` (``include/core/*newton*`` — SURVEY.md
§2.1): loop { build preconditioner; solve J d = -R matrix-free (jvp);
alpha-halving line search on ||R||; update } until ||R|| < tol.

Differences from the reference, by design:
- The Jacobian is exact via ``jax.jvp`` through the residual (no hand
  assembly); "skip" mode reuses the *preconditioner* across iterations
  (the expensive part here) while J.v stays exact.
- The entire Newton solve is one jitted region (lax.while_loop): zero
  host synchronization per Newton iteration (BASELINE north star).

Returns per-iteration residual-norm history so the host can print the
reference-style convergence log afterwards without syncing mid-solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.linalg import gmres, bicgstab


@dataclass(frozen=True)
class NewtonConfig:
    tolerance: float = 1e-6
    max_iterations: int = 10
    max_halvings: int = 4
    # linear solver
    method: str = "gmres"            # gmres | bicgstab
    gmres_restart: int = 50
    max_krylov_cycles: int = 20
    relative_residual: float = 1e-3
    minimum_residual: float = 1e-10
    # preconditioner refresh cadence (1 = every iteration; >1 = skip-Newton)
    skip_iterations: int = 1
    # floating-point floor stagnation: stop when the last `stall_window`
    # Newton steps together reduced ||R|| by less than a factor
    # 1/`stall_factor`.  In f32 the assembled residual carries an
    # absolute noise floor (cancellation of O(1) element contributions,
    # ~1e-6 for O(1) data); when `tolerance` sits below it the iteration
    # grinds at rate ~1 with the line search collapsing — measured on
    # the config-#5 sphere (scripts/diag_newton_rate.py: res stalls at
    # 1.85e-6 with alpha -> 1/16 while lin solves converge).  Stopping
    # there is the honest f32 analogue of the reference's f64 1e-6.
    # The factor is deliberately conservative (stop only when 4 steps
    # together gain < 10%): an 0.5 factor measurably degraded transient
    # f32 L2 errors by clipping slow-but-real tail convergence
    # (mms_bdf2 CLI A/B, round 4), while at the floor the 4-step
    # product is 0.97-1.00 and still trips this.
    stall_window: int = 4
    stall_factor: float = 0.9
    # FGMRES (required when the preconditioner itself iterates, e.g. the
    # multigrid bottom-level Krylov solve)
    flexible: bool = False


class NewtonResult(NamedTuple):
    u: jax.Array
    res_history: jax.Array       # [max_iterations+1] residual norms (nan-pad)
    n_iterations: jax.Array
    linear_iters: jax.Array
    alphas: jax.Array            # line-search alpha per iteration


def newton_linear_cycle(residual_fn: Callable, u, R, x, atol, *,
                        precond: Callable, config: NewtonConfig,
                        reduce_fn=lambda x: x):
    """ONE Krylov restart cycle of ``J(u) d = -R`` from iterate ``x``.

    Building block of the host-chunked Newton driver
    (``solvers/base.py`` ``_newton_chunked``): runtimes that bound
    single-program wall time (the axon relay kills device programs at
    60 s — scripts/probe_tpu_fault.py) cannot run a whole Newton
    iteration (up to ``gmres_restart * max_krylov_cycles`` matvecs) as
    one program, so the host loops over restart cycles of at most
    ``gmres_restart`` matvecs each.  ``atol`` is a traced scalar so the
    per-Newton-iteration tolerance does not retrigger compilation.

    Returns ``(x_new, lin_rnorm, n_matvecs)``; ``n_matvecs == 0`` means
    the cycle's entry residual was already below ``atol``.
    """
    shape = u.shape

    def flat_residual(u_flat):
        return residual_fn(u_flat.reshape(shape)).reshape(-1)

    # LINEARIZE once per cycle so the per-matvec work is the tangent
    # kernel alone — jvp per Krylov vector would re-run the primal
    # residual (kernel + gathers) every application
    _, matvec = jax.linearize(flat_residual, u.reshape(-1))

    def pre_flat(v_flat):
        return precond(v_flat.reshape(shape)).reshape(-1)

    if config.method == "bicgstab":
        return bicgstab(matvec, -R.reshape(-1), x0=x, precond=pre_flat,
                        max_iters=config.gmres_restart, atol=atol,
                        reduce_fn=reduce_fn)
    return gmres(matvec, -R.reshape(-1), x0=x, precond=pre_flat,
                 m=config.gmres_restart, max_restarts=1, atol=atol,
                 reduce_fn=reduce_fn, flexible=config.flexible)


def newton_apply_update(residual_fn: Callable, u, d_flat, rnorm, *,
                        config: NewtonConfig, reduce_fn=lambda x: x):
    """Line search + update for a computed Newton direction.

    The second chunked-driver building block: alpha-halving on
    ``||R(u + alpha d)||`` (reference NewtonNonLinearSolver semantics).
    Returns ``(u_new, R_new, rnorm_new, alpha)``.
    """
    d = d_flat.reshape(u.shape)

    def norm(Rv):
        return jnp.sqrt(reduce_fn(jnp.sum(Rv * Rv)))

    R1 = residual_fn(u + d)
    n1 = norm(R1)

    def ls_cond(s):
        k, alpha, Rt, nt = s
        return (nt >= rnorm) & (k < config.max_halvings)

    def ls_body(s):
        k, alpha, Rt, nt = s
        alpha = alpha * 0.5
        Rt = residual_fn(u + alpha * d)
        return (k + 1, alpha, Rt, norm(Rt))

    k, alpha, Rt, nt = lax.while_loop(
        ls_cond, ls_body, (0, jnp.asarray(1.0, u.dtype), R1, n1))
    return u + alpha * d, Rt, nt, alpha


def newton_solve(residual_fn: Callable, u0, *,
                 precond_builder: Callable,
                 config: NewtonConfig,
                 reduce_fn=lambda x: x,
                 precond_state_fn: Callable | None = None,
                 precond_apply_fn: Callable | None = None) -> NewtonResult:
    """Solve R(u) = 0.

    residual_fn:     u[N, c] -> R[N, c] (constrained; zero at Dirichlet)
    precond_builder: u[N, c] -> (v[N, c] -> M^{-1} v)   (rebuilt every
                     iteration — the plain Newton path)
    reduce_fn:       cross-shard sum for norms/dots (psum under shard_map)

    Skip-Newton (reference SkipNewtonNonLinearSolver): pass
    ``precond_state_fn(u) -> state`` (a pytree of arrays) and
    ``precond_apply_fn(state, v) -> v`` instead; the state is then
    carried in the Newton loop and rebuilt only every
    ``config.skip_iterations`` iterations (frozen preconditioner /
    linearization point; the J.v products stay exact).
    """
    shape = u0.shape
    nflat = u0.size

    def norm(R):
        return jnp.sqrt(reduce_fn(jnp.sum(R * R)))

    def flat_residual(u_flat):
        return residual_fn(u_flat.reshape(shape)).reshape(-1)

    maxit = config.max_iterations
    stateful = precond_state_fn is not None
    skip = max(1, config.skip_iterations)

    def body(state):
        (u, R, rnorm, it, lin_total, hist, alphas, pstate,
         u_best, n_best) = state

        # matrix-free Jacobian-vector products at the current iterate:
        # LINEARIZE once per Newton iteration so the per-matvec work is
        # the tangent kernel alone — jvp per Krylov vector would re-run
        # the primal residual (kernel + gathers) every application,
        # nearly doubling matvec cost
        _, matvec = jax.linearize(flat_residual, u.reshape(-1))

        if stateful:
            if skip > 1:
                pstate = lax.cond(it % skip == 0,
                                  lambda _: precond_state_fn(
                                      u.reshape(shape)),
                                  lambda s: s, pstate)
            else:
                pstate = precond_state_fn(u.reshape(shape))
            precond = lambda v: precond_apply_fn(pstate, v)
        else:
            precond = precond_builder(u.reshape(shape))

        def pre_flat(v_flat):
            return precond(v_flat.reshape(shape)).reshape(-1)

        lin_atol = jnp.maximum(config.relative_residual * rnorm,
                               config.minimum_residual)
        if config.method == "bicgstab":
            d, lin_r, lin_it = bicgstab(
                matvec, -R.reshape(-1), precond=pre_flat,
                max_iters=config.gmres_restart * config.max_krylov_cycles,
                atol=lin_atol, reduce_fn=reduce_fn)
        else:
            d, lin_r, lin_it = gmres(
                matvec, -R.reshape(-1), precond=pre_flat,
                m=config.gmres_restart,
                max_restarts=config.max_krylov_cycles,
                atol=lin_atol, reduce_fn=reduce_fn,
                flexible=config.flexible)
        d = d.reshape(shape)

        # alpha-halving line search on ||R(u + alpha d)||
        R1 = residual_fn(u + d)
        n1 = norm(R1)

        def ls_cond(s):
            k, alpha, Rt, nt = s
            return (nt >= rnorm) & (k < config.max_halvings)

        def ls_body(s):
            k, alpha, Rt, nt = s
            alpha = alpha * 0.5
            Rt = residual_fn(u + alpha * d)
            return (k + 1, alpha, Rt, norm(Rt))

        k, alpha, Rt, nt = lax.while_loop(
            ls_cond, ls_body, (0, jnp.asarray(1.0, u.dtype), R1, n1))

        u_new = u + alpha * d
        hist = hist.at[it + 1].set(nt)
        alphas = alphas.at[it].set(alpha)
        # best-iterate tracking: when max_halvings exhausts, the step is
        # taken even if ||R|| grew (reference line-search semantics), so
        # near the f32 floor the iteration can limit-cycle; returning
        # the minimum-||R|| iterate makes the result the best visited
        # point instead of wherever the cycle stopped.  Monotone solves
        # (every f64 golden) have best == last, so outputs are unchanged.
        better = nt < n_best
        u_best = jnp.where(better, u_new, u_best)
        n_best = jnp.where(better, nt, n_best)
        return (u_new, Rt, nt, it + 1, lin_total + lin_it, hist, alphas,
                pstate, u_best, n_best)

    def cond(state):
        rnorm, it, hist = state[2], state[3], state[5]
        W = config.stall_window
        # windowed floor-stagnation guard (see NewtonConfig.stall_window)
        ref = lax.dynamic_index_in_dim(
            hist, jnp.maximum(it - W, 0), keepdims=False)
        stalled = (it >= W) & (rnorm > config.stall_factor * ref)
        return (rnorm > config.tolerance) & (it < maxit) & ~stalled

    R0 = residual_fn(u0)
    n0 = norm(R0)
    hist0 = jnp.full(maxit + 1, jnp.nan, dtype=u0.dtype).at[0].set(n0)
    alphas0 = jnp.full(maxit, jnp.nan, dtype=u0.dtype)
    pstate0 = precond_state_fn(u0) if stateful else 0

    (u, R, rnorm, it, lin_total, hist, alphas, _, u_best,
     n_best) = lax.while_loop(
        cond, body, (u0, R0, n0, 0, 0, hist0, alphas0, pstate0,
                     u0, n0))
    return NewtonResult(u=u_best, res_history=hist, n_iterations=it,
                        linear_iters=lin_total, alphas=alphas)
