"""Matrix-free Krylov solvers as jitted lax loops.

Replaces the reference's ``SolverGMRES``/``SolverBicgstab`` over Trilinos
(SURVEY.md §3.3): restarted right-preconditioned GMRES with CGS2
re-orthogonalization (two batched matmuls against the Krylov basis — far
more MXU/ICI-friendly than modified Gram-Schmidt's sequential dots) and
Givens-rotation residual tracking, all inside ``lax.while_loop`` so an
entire Newton step stays on device with zero host syncs (BASELINE north
star).

Distribution: callers running under ``shard_map`` pass ``reduce_fn=psum``;
all inner products become local-then-psum, nothing else changes.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def _identity(x):
    return x


def gmres(matvec, b, x0=None, *, precond=None, m: int = 30,
          max_restarts: int = 10, atol: float = 1e-12,
          reduce_fn=_identity, flexible: bool = False):
    """Solve A x = b with restarted right-preconditioned GMRES(m).

    matvec:    v -> A v              (flat vectors [n])
    precond:   v -> M^{-1} v         (defaults to identity)
    atol:      absolute residual-norm target (the reference's linear
               tolerance semantics: max(rel*|R|, minimum_residual))
    reduce_fn: cross-shard reduction applied to inner products (psum
               under shard_map; identity on one device)
    flexible:  FGMRES — store the preconditioned vectors Z_j so the
               preconditioner may vary between applications (required
               when M itself contains an inner Krylov solve, e.g. the
               multigrid bottom level)

    Returns (x, rnorm, iterations).
    """
    if precond is None:
        precond = _identity
    if x0 is None:
        x0 = jnp.zeros_like(b)
    n = b.shape[0]
    dtype = b.dtype

    def dot(a, c):
        return reduce_fn(jnp.sum(a * c))

    def norm(a):
        return jnp.sqrt(dot(a, a))

    def arnoldi_cycle(x):
        r = b - matvec(x)
        beta = norm(r)

        V0 = jnp.zeros((m + 1, n), dtype=dtype)
        V0 = V0.at[0].set(r / jnp.maximum(beta, 1e-300))
        Z0 = jnp.zeros((m, n), dtype=dtype) if flexible else None
        Hc0 = jnp.zeros((m + 1, m), dtype=dtype)
        cs0 = jnp.zeros(m, dtype=dtype)
        sn0 = jnp.zeros(m, dtype=dtype)
        g0 = jnp.zeros(m + 1, dtype=dtype).at[0].set(beta)

        def cond(state):
            j, V, Z, Hc, cs, sn, g, rnorm = state
            return (j < m) & (rnorm > atol)

        def body(state):
            j, V, Z, Hc, cs, sn, g, rnorm = state
            z = precond(V[j])
            if flexible:
                Z = Z.at[j].set(z)
            w = matvec(z)
            # CGS2: two passes of projection against V[0..j]
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h1 = reduce_fn(V @ w) * mask
            w = w - h1 @ V
            h2 = reduce_fn(V @ w) * mask
            w = w - h2 @ V
            h = h1 + h2
            hnext = norm(w)
            V = V.at[j + 1].set(w / jnp.maximum(hnext, 1e-300))
            h = h.at[j + 1].set(hnext)

            # apply stored Givens rotations to the new column
            def rot_body(i, hcol):
                hi = cs[i] * hcol[i] + sn[i] * hcol[i + 1]
                hip = -sn[i] * hcol[i] + cs[i] * hcol[i + 1]
                return hcol.at[i].set(hi).at[i + 1].set(hip)

            h = lax.fori_loop(0, j, rot_body, h)
            denom = jnp.sqrt(h[j] ** 2 + hnext ** 2)
            c_new = jnp.where(denom > 0, h[j] / jnp.maximum(denom, 1e-300), 1.0)
            s_new = jnp.where(denom > 0, h[j + 1] / jnp.maximum(denom, 1e-300), 0.0)
            h = h.at[j].set(c_new * h[j] + s_new * h[j + 1]).at[j + 1].set(0.0)
            g_j = g[j]
            g = g.at[j].set(c_new * g_j)
            g = g.at[j + 1].set(-s_new * g_j)
            cs = cs.at[j].set(c_new)
            sn = sn.at[j].set(s_new)
            Hc = Hc.at[:, j].set(h)
            return (j + 1, V, Z, Hc, cs, sn, g, jnp.abs(g[j + 1]))

        j, V, Z, Hc, cs, sn, g, rnorm = lax.while_loop(
            cond, body, (0, V0, Z0, Hc0, cs0, sn0, g0, beta))

        # solve the (masked) upper-triangular system R y = g
        idx = jnp.arange(m)
        active = idx < j
        R = Hc[:m, :m]
        R = jnp.where((active[:, None] & active[None, :]), R, 0.0)
        R = R + jnp.diag(jnp.where(active, 0.0, 1.0).astype(dtype))
        rhs = jnp.where(active, g[:m], 0.0)
        y = jax.scipy.linalg.solve_triangular(R, rhs, lower=False)
        if flexible:
            x_new = x + y @ Z
        else:
            x_new = x + precond(y @ V[:m])
        return x_new, rnorm, j

    def outer_cond(state):
        x, rnorm, it, restarts = state
        return (rnorm > atol) & (restarts < max_restarts)

    def outer_body(state):
        x, rnorm, it, restarts = state
        x, rnorm, j = arnoldi_cycle(x)
        return (x, rnorm, it + j, restarts + 1)

    r0 = norm(b - matvec(x0))
    x, rnorm, iters, _ = lax.while_loop(
        outer_cond, outer_body, (x0, r0, 0, 0))
    return x, rnorm, iters


def bicgstab(matvec, b, x0=None, *, precond=None, max_iters: int = 1000,
             atol: float = 1e-12, reduce_fn=_identity):
    """Right-preconditioned BiCGStab (reference: solve_system_BiCGStab)."""
    if precond is None:
        precond = _identity
    if x0 is None:
        x0 = jnp.zeros_like(b)

    def dot(a, c):
        return reduce_fn(jnp.sum(a * c))

    r0 = b - matvec(x0)
    rhat = r0

    def cond(s):
        x, r, p, v, rho, alpha, omega, k, rnorm = s
        return (rnorm > atol) & (k < max_iters)

    def body(s):
        x, r, p, v, rho, alpha, omega, k, rnorm = s
        rho_new = dot(rhat, r)
        beta = (rho_new / jnp.where(rho == 0, 1e-300, rho)) * \
               (alpha / jnp.where(omega == 0, 1e-300, omega))
        p = r + beta * (p - omega * v)
        ph = precond(p)
        v = matvec(ph)
        alpha = rho_new / jnp.where(dot(rhat, v) == 0, 1e-300, dot(rhat, v))
        s_vec = r - alpha * v
        sh = precond(s_vec)
        t = matvec(sh)
        tt = dot(t, t)
        omega = dot(t, s_vec) / jnp.where(tt == 0, 1e-300, tt)
        x = x + alpha * ph + omega * sh
        r = s_vec - omega * t
        rnorm = jnp.sqrt(dot(r, r))
        return (x, r, p, v, rho_new, alpha, omega, k + 1, rnorm)

    z = jnp.zeros_like(b)
    one = jnp.asarray(1.0, b.dtype)
    init = (x0, r0, z, z, one, one, one, 0,
            jnp.sqrt(dot(r0, r0)))
    x, r, p, v, rho, alpha, omega, k, rnorm = lax.while_loop(cond, body, init)
    return x, rnorm, k
