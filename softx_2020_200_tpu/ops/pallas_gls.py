"""Fused Pallas TPU kernel for the GLS Navier-Stokes element operator.

Why: the XLA path lowers the element physics to ~30 separate TPU kernels;
per-launch overhead then dominates (measured ~0.3 ms/launch through this
environment's TPU tunnel, and it is pure win on bare metal too — fewer
HBM round-trips between fusions).  This kernel evaluates the ENTIRE
stabilized weak form — geometry, interpolation, strong residual, tau,
Galerkin + SUPG/PSPG/GLS terms, transpose contractions — in ONE launch.

Data layout ("element-everywhere"): each field row (a (node, component)
pair) is stored as tiles [S=8 sublanes, L=128*k lanes] with the element
batch spread across BOTH sublane and lane axes — every VPU op runs at
full width.  Arrays are shaped [rows, E/(S*L), S, L]; the grid walks the
second axis.  The small tabulation tables (B, G, H, w) live in SMEM and
are read as scalars inside unrolled loops.

Differentiation: ``residual`` carries a custom_jvp whose tangent rule is
the hand-linearized weak form with FROZEN tau — exactly the reference's
Newton Jacobian (assembleGLS's tau treatment).  The line-search residual
stays exact.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile shape: 16 sublanes x 256 lanes keeps BLK = 4096 while making the
# sublane count a multiple of EVERY dtype's minimum tile (f32 needs 8,
# bf16 needs 16) — so the frozen linearization-state rows can be stored
# in bf16 (VERDICT r3 matvec lever: halves the dominant constant stream
# of the Jacobian matvec) without Mosaic padding them 2x.
S = 16         # sublanes per tile
L = 256        # lanes per tile
BLK = S * L    # elements per grid step


def _physics(dim, nn, nq, nu, supg, pspg, gls_adjoint, lsic,
             tangent, B_ref, G_ref, H_ref, w_ref, alpha0, sdt,
             ue, xe, up, due, fqv, h):
    """Evaluate the stabilized GLS element weak form on a tile batch.

    Layout-agnostic core used by the row-layout kernel below (and
    designed so a fused-gather lattice kernel can reuse it): ``ue``/``xe``/
    ``up``/``due`` are lists of 2D element-batch tiles of ANY shape,
    ``fqv`` a list of nq*dim tiles, ``h`` one tile; B/G/H/w are SMEM
    tabulation refs.  Returns the nn*(dim+1) accumulated output tiles
    (Galerkin + SUPG/PSPG/GLS terms; with ``tangent`` the frozen-tau
    directional derivative, reading the direction from ``due``).
    """
    d = dim
    c = d + 1
    h2 = h * h
    inv_h2 = 1.0 / h2
    visc_term = 9.0 * (4.0 * nu) ** 2 * inv_h2 * inv_h2

    acc = [jnp.zeros(ue[0].shape, dtype=ue[0].dtype)
           for _ in range(nn * c)]

    for q in range(nq):
        Bq = [B_ref[q, n] for n in range(nn)]
        Gq = [[G_ref[q, n * d + a] for a in range(d)]
              for n in range(nn)]
        wq = w_ref[0, q]

        # ---- geometry: J[i][j] = sum_n xe[n,i] G[n,j] -------------
        J = [[sum(xe[n * d + i] * Gq[n][j] for n in range(nn))
              for j in range(d)] for i in range(d)]
        if d == 2:
            det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
            idet = 1.0 / det
            Ji = [[J[1][1] * idet, -J[0][1] * idet],
                  [-J[1][0] * idet, J[0][0] * idet]]
        else:
            c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
            c01 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
            c02 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
            c10 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
            c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
            c12 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
            c20 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
            c21 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
            c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
            det = J[0][0] * c00 + J[0][1] * c01 + J[0][2] * c02
            idet = 1.0 / det
            Ji = [[c00 * idet, c10 * idet, c20 * idet],
                  [c01 * idet, c11 * idet, c21 * idet],
                  [c02 * idet, c12 * idet, c22 * idet]]
        scale = det * wq

        # K[a][b] = sum_i Ji[a][i] Ji[b][i] (for laplacians)
        K = [[sum(Ji[a][i] * Ji[b][i] for i in range(d))
              for b in range(d)] for a in range(d)]
        # needed for r_m's viscous term regardless of gls_adjoint
        lap_phi = [sum(H_ref[q, n * d * d + a * d + b] * K[a][b]
                       for a in range(d) for b in range(d))
                   for n in range(nn)]

        def fields(coeffs, ncomp):
            """values + reference gradients of a nodal field."""
            vals = [sum(Bq[n] * coeffs[n * ncomp + k]
                        for n in range(nn)) for k in range(ncomp)]
            dref = [[sum(Gq[n][a] * coeffs[n * ncomp + k]
                         for n in range(nn)) for a in range(d)]
                    for k in range(ncomp)]
            grad = [[sum(dref[k][a] * Ji[a][i] for a in range(d))
                     for i in range(d)] for k in range(ncomp)]
            return vals, grad

        uq, grad_all = fields(ue, c)
        vel = uq[:d]
        p = uq[d]
        gvel = grad_all[:d]
        gp = grad_all[d]
        lap = [sum(lap_phi[n] * ue[n * c + i] for n in range(nn))
               for i in range(d)]
        upq = [sum(Bq[n] * up[n * d + i] for n in range(nn))
               for i in range(d)]
        fqv_q = [fqv[q * d + i] for i in range(d)]

        udot = [alpha0 * vel[i] + upq[i] for i in range(d)]
        conv = [sum(gvel[i][j] * vel[j] for j in range(d))
                for i in range(d)]
        r_m = [udot[i] + conv[i] + gp[i] - nu * lap[i] - fqv_q[i]
               for i in range(d)]
        div = sum(gvel[i][i] for i in range(d))

        umag2 = sum(vel[i] * vel[i] for i in range(d))
        tau = lax.rsqrt(sdt * sdt + 4.0 * umag2 * inv_h2 + visc_term)

        if tangent:
            # ---- frozen-tau directional derivative ----------------
            duq, dgrad_all = fields(due, c)
            dvel = duq[:d]
            dp = duq[d]
            dgvel = dgrad_all[:d]
            dgp = dgrad_all[d]
            dlap = [sum(lap_phi[n] * due[n * c + i] for n in range(nn))
                    for i in range(d)]
            dudot = [alpha0 * dvel[i] for i in range(d)]
            dconv = [sum(dgvel[i][j] * vel[j] + gvel[i][j] * dvel[j]
                         for j in range(d)) for i in range(d)]
            dr_m = [dudot[i] + dconv[i] + dgp[i] - nu * dlap[i]
                    for i in range(d)]
            ddiv = sum(dgvel[i][i] for i in range(d))

            a_v = [scale * (dudot[i] + dconv[i]) for i in range(d)]
            a_g = [[scale * nu * dgvel[i][j]
                    - (scale * dp if i == j else 0.0)
                    for j in range(d)] for i in range(d)]
            if supg:
                st = scale * tau
                for i in range(d):
                    for j in range(d):
                        a_g[i][j] = a_g[i][j] + st * (
                            dr_m[i] * vel[j] + r_m[i] * dvel[j])
            if lsic:
                tl = 0.5 * jnp.sqrt(umag2) * h * scale
                for i in range(d):
                    a_g[i][i] = a_g[i][i] + tl * ddiv
            a_p = scale * ddiv
            a_pg = ([scale * tau * dr_m[j] for j in range(d)]
                    if pspg else None)
            a_lap = ([-scale * tau * nu * dr_m[i] for i in range(d)]
                     if gls_adjoint else None)
        else:
            a_v = [scale * (udot[i] + conv[i] - fqv_q[i])
                   for i in range(d)]
            a_g = [[scale * nu * gvel[i][j]
                    - (scale * p if i == j else 0.0)
                    for j in range(d)] for i in range(d)]
            if supg:
                st = scale * tau
                for i in range(d):
                    for j in range(d):
                        a_g[i][j] = a_g[i][j] + st * r_m[i] * vel[j]
            if lsic:
                tl = 0.5 * jnp.sqrt(umag2) * h * scale
                for i in range(d):
                    a_g[i][i] = a_g[i][i] + tl * div
            a_p = scale * div
            a_pg = ([scale * tau * r_m[j] for j in range(d)]
                    if pspg else None)
            a_lap = ([-scale * tau * nu * r_m[i] for i in range(d)]
                     if gls_adjoint else None)

        # ---- transpose contractions back to nodes -----------------
        # reference-coordinate coefficients of d(phi)/d(xi_a)
        ag_ref = [[sum(a_g[i][j] * Ji[a][j] for j in range(d))
                   for a in range(d)] for i in range(d)]
        apg_ref = ([sum(a_pg[j] * Ji[a][j] for j in range(d))
                    for a in range(d)] if a_pg is not None else None)

        for n in range(nn):
            for i in range(d):
                contrib = Bq[n] * a_v[i]
                for a in range(d):
                    contrib = contrib + Gq[n][a] * ag_ref[i][a]
                if a_lap is not None:
                    contrib = contrib + lap_phi[n] * a_lap[i]
                acc[n * c + i] = acc[n * c + i] + contrib
            contrib_p = Bq[n] * a_p
            if apg_ref is not None:
                for a in range(d):
                    contrib_p = contrib_p + Gq[n][a] * apg_ref[a]
            acc[n * c + d] = acc[n * c + d] + contrib_p

    return acc


def _build_kernel(dim: int, nn: int, nq: int, nu: float,
                  supg: bool, pspg: bool, gls_adjoint: bool, lsic: bool,
                  tangent: bool, compute_dtype=jnp.float32):
    """Return the pallas kernel body (row layout).

    Row layouts: ue[nn*c], xe[nn*d], up[nn*d], fq[nq*d], h[1]; out[nn*c].
    With ``tangent=True`` an extra ``due[nn*c]`` input follows ue and the
    output is the frozen-tau directional derivative.  Input rows may
    arrive in a NARROWER dtype (bf16 state arrays): every tile is cast
    to ``compute_dtype`` on read, so all arithmetic runs full-precision.
    """
    d = dim
    c = d + 1

    def kernel(alpha0_ref, sdt_ref, B_ref, G_ref, H_ref, w_ref,
               *refs):
        if tangent:
            (ue_ref, due_ref, xe_ref, up_ref, fq_ref, h_ref,
             out_ref) = refs
        else:
            ue_ref, xe_ref, up_ref, fq_ref, h_ref, out_ref = refs
            due_ref = None

        alpha0 = alpha0_ref[0, 0].astype(compute_dtype)
        sdt = sdt_ref[0, 0].astype(compute_dtype)

        def row(ref, i):
            return ref[i, 0].astype(compute_dtype)   # [S, L] tile

        ue = [row(ue_ref, i) for i in range(nn * c)]
        xe = [row(xe_ref, i) for i in range(nn * d)]
        up = [row(up_ref, i) for i in range(nn * d)]
        due = ([row(due_ref, i) for i in range(nn * c)]
               if tangent else None)
        fqv = [row(fq_ref, i) for i in range(nq * d)]
        h = row(h_ref, 0)

        acc = _physics(d, nn, nq, nu, supg, pspg, gls_adjoint, lsic,
                       tangent, B_ref, G_ref, H_ref, w_ref, alpha0,
                       sdt, ue, xe, up, due, fqv, h)
        for i in range(nn * c):
            out_ref[i, 0] = acc[i]

    return kernel


class PallasGLS:
    """Fused residual / Jacobian-vector operator for one FESpace.

    Prepares padded, tile-shaped geometry once; exposes
    ``residual(u, uprev, fq2, alpha0, sdt)`` with a custom_jvp whose
    tangent is the frozen-tau matvec kernel.
    """

    def __init__(self, space, nu: float, n_q1d: int | None = None,
                 supg=True, pspg=True, gls_adjoint=True, lsic=False,
                 dtype=jnp.float32, interpret=False, elem_coords=None,
                 n_elements: int | None = None, state_dtype=None):
        d = space.dim
        c = d + 1
        self.dim, self.nc = d, c
        self.nu = float(nu)
        self.space = space
        nq1 = n_q1d or (space.degree + 1)
        pts, wts, B, G, H = space.basis.quadrature(nq1)
        self.nq = wts.shape[0]
        nn = space.basis.n_nodes
        self.nn = nn
        self.dtype = dtype
        # Narrow storage dtype for the FROZEN linearization-state rows
        # (ue/up/fq/xe/h) of the TANGENT kernel only — the GMRES matvec's
        # dominant HBM stream.  Compute stays in ``dtype`` (cast-on-read
        # in VMEM); the tangent direction, primal residual, and output
        # stay full precision, so the line-search residual is exact and
        # the Jacobian is merely a rounded-coefficient Jacobian (inexact
        # Newton).  Under ``jax.linearize`` the casts are primal-side,
        # i.e. they run once per Newton iteration, not per matvec.
        self.state_dtype = state_dtype
        self.interpret = interpret
        self.flags = (supg, pspg, gls_adjoint, lsic)

        # n_elements overrides the batch size (sharded path: E = the
        # per-shard padded element count, not the global space's)
        E = n_elements if n_elements is not None else space.n_elements
        self.E = E
        self.Eg = (E + BLK - 1) // BLK
        Ep = self.Eg * BLK
        self.Ep = Ep

        # SMEM tables
        self.tB = jnp.asarray(B, dtype)                        # [q, nn]
        self.tG = jnp.asarray(G.reshape(self.nq, nn * d), dtype)
        self.tH = jnp.asarray(H.reshape(self.nq, nn * d * d), dtype)
        self.tw = jnp.asarray(wts[None, :], dtype)             # [1, q]

        # geometry rows [nn*d, Eg, S, L], padded with unit reference cells
        # (elem_coords overrides the element ordering — structured path)
        xe = (elem_coords if elem_coords is not None
              else space.element_coords()).astype(np.float64)  # [E, nn, d]
        self.xe_t, self.h_t = self.prep_geometry(xe)

        self._primal = self._make_call(tangent=False)
        self._tangent = self._make_call(tangent=True)

        # the custom_jvp residual over row-layout operands; geometry rows
        # (xe2, h2) are explicit args so jitted callers can pass them as
        # runtime parameters instead of HLO literals (compile-time
        # hygiene at scale) — their tangents are ignored (geometry is
        # constant within a solve)
        @jax.custom_jvp
        def residual_rows_g(ue2, up2, fq2, xe2, h2, alpha0, sdt):
            return self._primal(ue2, up2, fq2, xe2, h2, alpha0, sdt)

        @residual_rows_g.defjvp
        def _jvp(primals, tangents):
            ue2, up2, fq2, xe2, h2, alpha0, sdt = primals
            due2 = tangents[0]
            out = residual_rows_g(ue2, up2, fq2, xe2, h2, alpha0, sdt)
            if self.state_dtype is not None:
                # primal-side casts: hoisted to once-per-linearize by
                # jax.linearize's partial evaluation, so every GMRES
                # matvec streams the state at the narrow width
                sd = self.state_dtype
                ue2, up2, fq2 = (ue2.astype(sd), up2.astype(sd),
                                 fq2.astype(sd))
                xe2, h2 = xe2.astype(sd), h2.astype(sd)
            dout = self._tangent(ue2, due2, up2, fq2, xe2, h2,
                                 alpha0, sdt)
            return out, dout

        self.residual_rows_g = residual_rows_g

        def residual_rows(ue2, up2, fq2, alpha0, sdt,
                          xe2=None, h2=None):
            xe2 = xe2 if xe2 is not None else self.xe_t
            h2 = h2 if h2 is not None else self.h_t
            return residual_rows_g(ue2, up2, fq2, xe2, h2, alpha0, sdt)

        self.residual_rows = residual_rows

    # ------------------------------------------------------------------
    def prep_geometry(self, xe):
        """Element coordinates [E, nn, d] -> row-layout geometry
        (xe2 [nn*d, Eg, S, L], h2 [1, Eg, S, L]).

        Host-side; used at init and per shard by the distributed path
        (each shard has its own geometry but the same padded shape).
        """
        xe = np.asarray(xe, np.float64)
        E, nn, d = xe.shape
        if E != self.E:
            raise ValueError(f"expected {self.E} elements, got {E}")
        ref = self.space.basis.nodes                           # [nn, d]
        pad = np.broadcast_to(ref, (self.Ep - E, nn, d))
        xep = np.concatenate([xe, pad], axis=0)
        xe2 = np.transpose(xep, (1, 2, 0)).reshape(nn * d, self.Eg, S, L)

        vol = self._element_volumes(xe)
        if d == 2:
            h = np.sqrt(4.0 * vol / math.pi) / self.space.degree
        else:
            h = np.cbrt(6.0 * vol / math.pi) / self.space.degree
        hp = np.concatenate([h, np.ones(self.Ep - E)])
        h2 = hp.reshape(1, self.Eg, S, L)
        return jnp.asarray(xe2, self.dtype), jnp.asarray(h2, self.dtype)

    # ------------------------------------------------------------------
    def _element_volumes(self, xe):
        pts, wts, B, G, H = self.space.basis.quadrature(
            self.space.degree + 1)
        J = np.einsum("eni,qnj->eqij", xe, G)
        det = np.linalg.det(J)
        return np.einsum("eq,q->e", det, wts)

    # ------------------------------------------------------------------
    def _make_call(self, tangent: bool):
        supg, pspg, gls_adjoint, lsic = self.flags
        kern = _build_kernel(self.dim, self.nn, self.nq, self.nu,
                             supg, pspg, gls_adjoint, lsic, tangent,
                             compute_dtype=self.dtype)
        nn, c, d, nq = self.nn, self.nc, self.dim, self.nq
        Eg = self.Eg

        def smem_spec(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.SMEM)

        def rows_spec(r):
            return pl.BlockSpec((r, 1, S, L), lambda i: (0, i, 0, 0),
                                memory_space=pltpu.VMEM)

        n_data = 6 if tangent else 5
        row_counts = ([nn * c, nn * c, nn * d, nn * d, nq * d, 1]
                      if tangent else [nn * c, nn * d, nn * d, nq * d, 1])

        call = pl.pallas_call(
            kern,
            grid=(Eg,),
            in_specs=[smem_spec((1, 1)), smem_spec((1, 1)),
                      smem_spec(self.tB.shape), smem_spec(self.tG.shape),
                      smem_spec(self.tH.shape), smem_spec(self.tw.shape)]
            + [rows_spec(r) for r in row_counts],
            out_specs=rows_spec(nn * c),
            out_shape=jax.ShapeDtypeStruct((nn * c, Eg, S, L), self.dtype),
            interpret=self.interpret,
        )

        if tangent:
            def run(ue2, due2, up2, fq2, xe2, h2, alpha0, sdt):
                a = jnp.asarray(alpha0, self.dtype).reshape(1, 1)
                s_ = jnp.asarray(sdt, self.dtype).reshape(1, 1)
                return call(a, s_, self.tB, self.tG, self.tH, self.tw,
                            ue2, due2, xe2, up2, fq2, h2)
        else:
            def run(ue2, up2, fq2, xe2, h2, alpha0, sdt):
                a = jnp.asarray(alpha0, self.dtype).reshape(1, 1)
                s_ = jnp.asarray(sdt, self.dtype).reshape(1, 1)
                return call(a, s_, self.tB, self.tG, self.tH, self.tw,
                            ue2, xe2, up2, fq2, h2)
        return run

    # ------------------------------------------------------------------
    def node_block_rows(self, ue2, up2, fq2, alpha0, sdt,
                        xe2=None, h2=None):
        """Element node-diagonal Jacobian blocks via tangent-kernel
        probes: [nn, c*c, Eg, S, L] with the (i, j) pair row-major.

        blocks[n, i*c+j] = d r[n, i] / d ue[n, j] — one fused tangent
        launch per (n, j) probe (nn*c launches total).  Replaces the
        chunked XLA-jvp probe loop that dominated the Newton step
        (measured 2.2 s -> ~45 ms at 1.1M DoF)."""
        xe2 = xe2 if xe2 is not None else self.xe_t
        h2 = h2 if h2 is not None else self.h_t
        if self.state_dtype is not None:
            sd = self.state_dtype
            ue2, up2, fq2 = (ue2.astype(sd), up2.astype(sd),
                             fq2.astype(sd))
            xe2, h2 = xe2.astype(sd), h2.astype(sd)
        nn, c = self.nn, self.nc
        out_n = []
        for n0 in range(nn):
            per_j = []
            for j in range(c):
                # one-hot probe direction as broadcast-of-small: a full
                # zeros().at[row].set(1.0) is a static-index scatter that
                # XLA CONSTANT-FOLDS into an O(E) literal — 32 of them
                # grew the compiled executable ~1.2 KB/DoF and broke the
                # 2 GiB proto cap at 2.9-3.5M DoF (docs/tgv96_gmg_run.log,
                # scripts/diag_hlo_size.py).  Broadcasts are never folded.
                due = jnp.broadcast_to(
                    jnp.zeros((nn * c, 1, 1, 1), self.dtype)
                    .at[n0 * c + j, 0, 0, 0].set(1.0),
                    (nn * c, self.Eg, S, L))
                out = self._tangent(ue2, due, up2, fq2, xe2, h2,
                                    alpha0, sdt)
                per_j.append(out[n0 * c:(n0 + 1) * c])   # [c(i), ...]
            # order (i, j) row-major
            rows = jnp.stack([per_j[j][i] for i in range(c)
                              for j in range(c)])
            out_n.append(rows)
        return jnp.stack(out_n)                  # [nn, cc, Eg, S, L]

    # ------------------------------------------------------------------
    # layout adapters: [E, rows-ish] AoS <-> [rows, Eg, S, L]
    # ------------------------------------------------------------------
    def to_rows(self, arr_e):
        """[E, k1, k2] -> [k1*k2, Eg, S, L] with zero padding."""
        E = arr_e.shape[0]
        k = int(np.prod(arr_e.shape[1:]))
        flat = arr_e.reshape(E, k)
        pad = self.Ep - E
        if pad:
            flat = jnp.concatenate(
                [flat, jnp.zeros((pad, k), flat.dtype)], axis=0)
        return jnp.transpose(flat, (1, 0)).reshape(k, self.Eg, S, L)

    def from_rows(self, rows):
        """[k, Eg, S, L] -> [E, k] (padding dropped)."""
        k = rows.shape[0]
        flat = rows.reshape(k, self.Ep).T
        return flat[:self.E]
