"""Fused-gather GLS lattice kernel: affine geometry + MXU contractions.

The structured path (ops/structured.py) only ever runs on generator
lattices — `subdivided_hyper_rectangle`-family meshes whose elements are
all TRANSLATES of one axis-aligned box.  On such a mesh the element
Jacobian is one GLOBAL constant, which collapses the general row-layout
kernel (ops/pallas_gls.py) dramatically:

- the per-element geometry stream (xe: nn*d rows, h: 1 row — ~50 B/elem
  at 3D Q1 bf16) disappears: J, J^{-1}, det, h are ~20 python floats;
- the per-quad-point Jacobian inversion (~1.5 kFLOP/elem of VPU work)
  disappears;
- value/physical-gradient/Laplacian interpolation become CONSTANT
  matrices, so interpolation and the transpose projection lower to
  `jnp.dot` with a constant [(d+2)*nq, nn] operand — i.e. they run on
  the MXU, freeing the VPU for the pointwise physics.  The quadrature
  weights (det*w) fold into the projection matrix columns, so the
  kernel never multiplies by `scale` at all.

This matters because the row-layout kernel is VPU-compute-bound, not
HBM-bound: at 0.87 GDoF/s its ~10 kFLOP/elem of unrolled scalar
broadcasts run the VPU near saturation while HBM sits at 45% of stream
rate — which is also why bf16 state storage bought only 1.057x
(BENCH_r04; docs/roofline.json).  Moving the contractions (the FLOP
majority) to the MXU attacks the actual bottleneck.

On sum-factorization (SURVEY §7.1): the tensor-product factorization of
a Qk basis reduces interpolation FLOPs ~(k+1)^d/(d*(k+1)) per point but
shrinks the contraction depth to K = k+1 (2 or 3) — hopeless fill for a
128-deep systolic array, so the factors would run on the VPU, which is
the saturated unit.  The dense collocation operator [(d+2)*nq, nn] with
K = nn (8 for Q1, 27 for Q2) is the MXU-right formulation: Q2's K = 27
uses the array 3.4x better than Q1, which is how Q2 closes its per-DoF
gap (VERDICT r4 missing #2; the 0.112 GDoF/s Q2 number was the same
unrolled VPU loops at 27 nodes).

Physics parity: this kernel evaluates the identical stabilized weak
form as make_element_kernel (solvers/gls.py — the reference's
assembleGLS loop, SURVEY §3.1) and pallas_gls._physics; the tangent is
the frozen-tau linearization (the reference's Newton Jacobian).

Data layout: plain 2D rows [rows, Ep] with the element batch entirely
in lanes; block = [rows, BLK].  Rows are COMPONENT-MAJOR (row = k*nn+n
for nodal fields, i*nq+q for quad fields) so each component slices out
contiguously as an [nn, BLK] / [nq, BLK] tile — matmul-ready without
any in-kernel relayout, and pointwise physics runs on [nq, BLK] arrays
(every q at once, full VPU width).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget the block-size heuristic targets (bytes).  ~16 MB/core on
# v5e; leave headroom for Mosaic's own temporaries and double buffering.
_VMEM_TARGET = 8 * 1024 * 1024


def _affine_tables(dim, nn, nq, B, G, H, w, xe0, degree):
    """Constant interpolation/projection operators for one affine
    element whose node coordinates are ``xe0`` [nn, d].

    Returns (T_all [(d+2)*nq, nn], T_proj [nn, (d+2)*nq], h, detJ):
      rows [0:nq]              values            (B)
      rows [(1+i)*nq:(2+i)*nq] d/dx_i            (G @ Jinv)
      rows [(1+d)*nq:(2+d)*nq] laplacian         (H : Jinv Jinv^T)
    T_proj is T_all transposed with det*w folded into its columns, so
    ``out = T_proj @ coeffs`` IS the quadrature sum.
    """
    d = dim
    J = np.einsum("ni,qnj->qij", xe0, G)             # [nq, d, d]
    if np.abs(J - J[0]).max() > 1e-9 * max(np.abs(J).max(), 1e-30):
        raise ValueError("element is not affine")
    J0 = J[0]
    detJ = float(np.linalg.det(J0))
    Jinv = np.linalg.inv(J0)                          # dxi/dx
    K = Jinv @ Jinv.T                                 # [a, b]

    Gphys = np.einsum("qna,ai->qni", G, Jinv)         # [nq, nn, d]
    lap_phi = np.einsum("qnab,ab->qn", H, K)          # [nq, nn]

    T = np.concatenate(
        [B] + [Gphys[:, :, i] for i in range(d)] + [lap_phi], axis=0)
    detw = detJ * w                                   # [nq]
    scale_col = np.tile(detw, d + 2)                  # per T row
    T_proj = (T * scale_col[:, None]).T               # [nn, (d+2)nq]

    vol = detJ * float(np.sum(w))
    if d == 2:
        h = math.sqrt(4.0 * vol / math.pi) / degree
    else:
        h = (6.0 * vol / math.pi) ** (1.0 / 3.0) / degree
    return T, T_proj, h, detJ


def _build_kernel(dim, nn, nq, nu, supg, pspg, gls_adjoint, lsic,
                  tangent, h, compute_dtype=jnp.float32,
                  dot_precision=None):
    """Kernel body over component-major 2D row blocks.

    Refs: alpha0, sdt (SMEM); T_all [(d+2)nq, nn], T_proj [nn, (d+2)nq]
    (VMEM consts); ue [c*nn, BLK] (, due), up [d*nn, BLK],
    fq [d*nq, BLK]; out [c*nn, BLK].
    """
    d = dim
    c = d + 1
    M = (d + 2) * nq
    Mnl = (d + 1) * nq            # value+gradient rows (pressure: no lap)
    h2 = h * h
    inv_h2 = 1.0 / h2
    visc_term = 9.0 * (4.0 * nu) ** 2 * inv_h2 * inv_h2

    # Mosaic requires a 32-bit matmul accumulator and rejects HIGHEST
    # precision for bf16 operands: with bf16 refs the dots stream bf16
    # operands into the MXU but accumulate (and run the pointwise
    # physics) in f32; only the final store rounds back to bf16.
    acc_dtype = compute_dtype
    if compute_dtype == jnp.bfloat16:
        acc_dtype = jnp.float32
        if dot_precision == lax.Precision.HIGHEST:
            dot_precision = lax.Precision.DEFAULT

    if dot_precision == "bf16x3":
        # 3-pass bf16 split product (a_hi b_hi + a_hi b_lo + a_lo b_hi):
        # ~1.5e-6 relative accuracy at half the MXU passes of Mosaic's
        # HIGHEST (which Mosaic lowers as a 6-pass f32 decomposition);
        # Mosaic has no native HIGH for pallas dots.
        def dot(a, b):
            a = a.astype(compute_dtype)
            b = b.astype(compute_dtype)
            ahi = a.astype(jnp.bfloat16)
            alo = (a - ahi.astype(compute_dtype)).astype(jnp.bfloat16)
            bhi = b.astype(jnp.bfloat16)
            blo = (b - bhi.astype(compute_dtype)).astype(jnp.bfloat16)

            def d(x, y):
                # explicit DEFAULT: the package-global 'highest' matmul
                # precision is invalid for bf16 operands in Mosaic
                return jnp.dot(x, y,
                               preferred_element_type=acc_dtype,
                               precision=lax.Precision.DEFAULT)

            return d(ahi, bhi) + (d(ahi, blo) + d(alo, bhi))
    else:
        def dot(a, b):
            return jnp.dot(a.astype(compute_dtype),
                           b.astype(compute_dtype),
                           preferred_element_type=acc_dtype,
                           precision=dot_precision)

    def kernel(alpha0_ref, sdt_ref, T_ref, P_ref, *refs):
        if tangent:
            ue_ref, due_ref, up_ref, fq_ref, out_ref = refs
        else:
            ue_ref, up_ref, fq_ref, out_ref = refs

        alpha0 = alpha0_ref[0, 0].astype(acc_dtype)
        sdt = sdt_ref[0, 0].astype(acc_dtype)
        T_all = T_ref[...]
        T_proj = P_ref[...]

        def comp(ref, k, n_rows):
            return ref[k * n_rows:(k + 1) * n_rows, :].astype(
                compute_dtype)

        # ---- interpolation (MXU): every linear operator at once ------
        prim = [dot(T_all, comp(ue_ref, k, nn)) for k in range(d)]
        prim_p = dot(T_all[:Mnl], comp(ue_ref, d, nn))
        upv = [dot(T_all[:nq], comp(up_ref, i, nn)) for i in range(d)]

        vel = [prim[i][:nq] for i in range(d)]
        gvel = [[prim[i][(1 + j) * nq:(2 + j) * nq] for j in range(d)]
                for i in range(d)]
        lap = [prim[i][(1 + d) * nq:] for i in range(d)]
        p = prim_p[:nq]
        gp = [prim_p[(1 + j) * nq:(2 + j) * nq] for j in range(d)]
        fqv = [comp(fq_ref, i, nq) for i in range(d)]

        # ---- pointwise physics (VPU), [nq, BLK] per quantity ---------
        udot = [alpha0 * vel[i] + upv[i] for i in range(d)]
        conv = [sum(gvel[i][j] * vel[j] for j in range(d))
                for i in range(d)]
        r_m = [udot[i] + conv[i] + gp[i] - nu * lap[i] - fqv[i]
               for i in range(d)]
        div = sum(gvel[i][i] for i in range(d))
        umag2 = sum(vel[i] * vel[i] for i in range(d))
        tau = lax.rsqrt(sdt * sdt + 4.0 * umag2 * inv_h2 + visc_term)

        if tangent:
            dprm = [dot(T_all, comp(due_ref, k, nn)) for k in range(d)]
            dprm_p = dot(T_all[:Mnl], comp(due_ref, d, nn))
            dvel = [dprm[i][:nq] for i in range(d)]
            dgvel = [[dprm[i][(1 + j) * nq:(2 + j) * nq]
                      for j in range(d)] for i in range(d)]
            dlap = [dprm[i][(1 + d) * nq:] for i in range(d)]
            dp = dprm_p[:nq]
            dgp = [dprm_p[(1 + j) * nq:(2 + j) * nq] for j in range(d)]

            dudot = [alpha0 * dvel[i] for i in range(d)]
            dconv = [sum(dgvel[i][j] * vel[j] + gvel[i][j] * dvel[j]
                         for j in range(d)) for i in range(d)]
            dr_m = [dudot[i] + dconv[i] + dgp[i] - nu * dlap[i]
                    for i in range(d)]
            ddiv = sum(dgvel[i][i] for i in range(d))

            a_v = [dudot[i] + dconv[i] for i in range(d)]
            a_g = [[nu * dgvel[i][j] - (dp if i == j else 0.0)
                    for j in range(d)] for i in range(d)]
            if supg:
                for i in range(d):
                    for j in range(d):
                        a_g[i][j] = a_g[i][j] + tau * (
                            dr_m[i] * vel[j] + r_m[i] * dvel[j])
            if lsic:
                tl = 0.5 * jnp.sqrt(umag2) * h
                for i in range(d):
                    a_g[i][i] = a_g[i][i] + tl * ddiv
            a_p = ddiv
            a_pg = [tau * dr_m[j] for j in range(d)] if pspg else None
            a_lap = ([-tau * nu * dr_m[i] for i in range(d)]
                     if gls_adjoint else None)
        else:
            a_v = [udot[i] + conv[i] - fqv[i] for i in range(d)]
            a_g = [[nu * gvel[i][j] - (p if i == j else 0.0)
                    for j in range(d)] for i in range(d)]
            if supg:
                for i in range(d):
                    for j in range(d):
                        a_g[i][j] = a_g[i][j] + tau * r_m[i] * vel[j]
            if lsic:
                tl = 0.5 * jnp.sqrt(umag2) * h
                for i in range(d):
                    a_g[i][i] = a_g[i][i] + tl * div
            a_p = div
            a_pg = [tau * r_m[j] for j in range(d)] if pspg else None
            a_lap = ([-tau * nu * r_m[i] for i in range(d)]
                     if gls_adjoint else None)

        # ---- projection (MXU): quadrature sum via det*w-scaled T^T ---
        zero = jnp.zeros_like(a_p)
        for i in range(d):
            stack = jnp.concatenate(
                [a_v[i]] + a_g[i]
                + [a_lap[i] if a_lap is not None else zero], axis=0)
            out_ref[i * nn:(i + 1) * nn, :] = dot(
                T_proj, stack).astype(compute_dtype)
        pstack = jnp.concatenate(
            [a_p] + (a_pg if a_pg is not None
                     else [zero for _ in range(d)]), axis=0)
        out_ref[d * nn:(d + 1) * nn, :] = dot(
            T_proj[:, :Mnl], pstack).astype(compute_dtype)

    return kernel


class PallasLatticeGLS:
    """Affine-lattice GLS operator: MXU interpolation/projection, no
    per-element geometry stream.

    Drop-in analogue of ops.pallas_gls.PallasGLS for the structured
    path, with 2D component-major row layout [rows, Ep]:
    ``residual_rows(ue2, up2, fq2, alpha0, sdt)`` carries a custom_jvp
    whose tangent is the frozen-tau matvec; ``node_block_rows`` probes
    the per-node Jacobian blocks.  Raises ValueError if the mesh
    elements are not all translates of one affine box (caller falls
    back to PallasGLS).
    """

    def __init__(self, space, nu: float, elem_coords, n_q1d=None,
                 supg=True, pspg=True, gls_adjoint=True, lsic=False,
                 dtype=jnp.float32, interpret=False, state_dtype=None):
        d = space.dim
        c = d + 1
        self.dim, self.nc = d, c
        self.nu = float(nu)
        self.space = space
        nq1 = n_q1d or (space.degree + 1)
        pts, wts, B, G, H = space.basis.quadrature(nq1)
        self.nq = nq = wts.shape[0]
        self.nn = nn = space.basis.n_nodes
        self.dtype = dtype
        self.state_dtype = state_dtype
        self.interpret = interpret
        self.flags = (supg, pspg, gls_adjoint, lsic)

        xe = np.asarray(elem_coords, np.float64)       # [E, nn, d]
        E = xe.shape[0]
        self.E = E
        Hq = H.reshape(nq, nn, d, d)
        T, T_proj, h, detJ = _affine_tables(
            d, nn, nq, B, G, Hq, wts, xe[0], space.degree)
        # uniformity: every element must be a translate of element 0
        # (sample at scale; exact offsets need only node-0 comparison)
        sample = np.unique(np.linspace(0, E - 1, 4096).astype(np.int64))
        rel = xe[sample] - xe[sample, :1]              # node offsets
        if np.abs(rel - rel[0]).max() > 1e-9 * max(
                np.abs(rel[0]).max(), 1e-30):
            raise ValueError("lattice is not uniform (non-translate "
                             "elements); use PallasGLS")
        self.h = h
        self.T_all = jnp.asarray(T, dtype)
        self.T_proj = jnp.asarray(T_proj, dtype)

        # block size: largest lane count fitting the VMEM target
        rows_in = c * nn * 2 + d * nn + d * nq + c * nn
        rows_inter = 2 * d * (d + 2) * nq + 2 * (d + 1) * nq \
            + d * nq + (d + 2) * nq * (d + 1) + 14 * nq
        bytes_per_lane = (2 * rows_in + rows_inter) * 4
        blk = 8192
        while blk > 128 and blk * bytes_per_lane > _VMEM_TARGET:
            blk //= 2
        self.BLK = blk
        self.Eg = (E + blk - 1) // blk
        self.Ep = self.Eg * blk

        # Dot-precision policy: the PRIMAL residual keeps full-f32
        # contractions (HIGHEST — package default; the physics bands sit
        # exactly in the bf16 error range, softx_2020_200_tpu/__init__).
        # When the user opts into the bf16 Jacobian state (linear solver
        # 'jacobian state precision = bf16'), the TANGENT and node-block
        # probes also run the MXU at its native bf16-input rate
        # (DEFAULT, one pass) — the operator rounding (~4e-3 relative)
        # is then the same order as the state rounding already accepted,
        # and the tangent kernel measures 1.73x faster (1421 -> 822 us
        # at 1.1M DoF).  NOT default-on: with f32 state the golden MMS
        # deck's 8-iteration Newton budget cannot absorb the inexact
        # Jacobian (CLI L2 degrades 100x, measured).  Escape hatch:
        # SOFTX_LATTICE_TANGENT_PRECISION=default|highest.
        import os
        env = os.environ.get("SOFTX_LATTICE_TANGENT_PRECISION")
        if env is not None:
            tp = {"highest": lax.Precision.HIGHEST,
                  "default": lax.Precision.DEFAULT}[env]
        else:
            tp = (lax.Precision.DEFAULT if state_dtype is not None
                  else lax.Precision.HIGHEST)
        self._primal = self._make_call(
            tangent=False, dot_precision=lax.Precision.HIGHEST)
        self._tangent = self._make_call(tangent=True, dot_precision=tp)

        @jax.custom_jvp
        def residual_rows(ue2, up2, fq2, alpha0, sdt):
            return self._primal(ue2, up2, fq2, alpha0, sdt)

        @residual_rows.defjvp
        def _jvp(primals, tangents):
            ue2, up2, fq2, alpha0, sdt = primals
            due2 = tangents[0]
            out = residual_rows(ue2, up2, fq2, alpha0, sdt)
            if self.state_dtype is not None:
                sd = self.state_dtype
                ue2, up2, fq2 = (ue2.astype(sd), up2.astype(sd),
                                 fq2.astype(sd))
            dout = self._tangent(ue2, due2, up2, fq2, alpha0, sdt)
            return out, dout

        self.residual_rows = residual_rows

    # ------------------------------------------------------------------
    def _make_call(self, tangent: bool, dot_precision=None):
        supg, pspg, gls_adjoint, lsic = self.flags
        kern = _build_kernel(self.dim, self.nn, self.nq, self.nu,
                             supg, pspg, gls_adjoint, lsic, tangent,
                             self.h, compute_dtype=self.dtype,
                             dot_precision=dot_precision)
        nn, c, d, nq = self.nn, self.nc, self.dim, self.nq
        BLK, Eg = self.BLK, self.Eg

        def smem_spec(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.SMEM)

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        def rows_spec(r):
            return pl.BlockSpec((r, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        row_counts = ([c * nn, c * nn, d * nn, d * nq] if tangent
                      else [c * nn, d * nn, d * nq])

        call = pl.pallas_call(
            kern,
            grid=(Eg,),
            in_specs=[smem_spec((1, 1)), smem_spec((1, 1)),
                      const_spec(self.T_all.shape),
                      const_spec(self.T_proj.shape)]
            + [rows_spec(r) for r in row_counts],
            out_specs=rows_spec(c * nn),
            out_shape=jax.ShapeDtypeStruct((c * nn, self.Ep), self.dtype),
            interpret=self.interpret,
        )

        if tangent:
            def run(ue2, due2, up2, fq2, alpha0, sdt):
                a = jnp.asarray(alpha0, self.dtype).reshape(1, 1)
                s_ = jnp.asarray(sdt, self.dtype).reshape(1, 1)
                return call(a, s_, self.T_all, self.T_proj,
                            ue2, due2, up2, fq2)
        else:
            def run(ue2, up2, fq2, alpha0, sdt):
                a = jnp.asarray(alpha0, self.dtype).reshape(1, 1)
                s_ = jnp.asarray(sdt, self.dtype).reshape(1, 1)
                return call(a, s_, self.T_all, self.T_proj,
                            ue2, up2, fq2)
        return run

    # ------------------------------------------------------------------
    def node_block_rows(self, ue2, up2, fq2, alpha0, sdt):
        """Per-node Jacobian blocks via tangent probes:
        [nn, c*c, Ep] with (i, j) row-major (see PallasGLS)."""
        if self.state_dtype is not None:
            sd = self.state_dtype
            ue2, up2, fq2 = (ue2.astype(sd), up2.astype(sd),
                             fq2.astype(sd))
        nn, c = self.nn, self.nc
        out_n = []
        for n0 in range(nn):
            per_j = []
            for j in range(c):
                # broadcast-of-small one-hot: never constant-folded into
                # an O(E) literal (scripts/diag_hlo_size.py)
                due = jnp.broadcast_to(
                    jnp.zeros((nn * c, 1), self.dtype)
                    .at[j * nn + n0, 0].set(1.0),
                    (nn * c, self.Ep))
                out = self._tangent(ue2, due, up2, fq2, alpha0, sdt)
                # component-major output: row i*nn+n0 per velocity i
                per_j.append(jnp.stack(
                    [out[i * nn + n0] for i in range(c)]))   # [c(i), Ep]
            rows = jnp.stack([per_j[j][i] for i in range(c)
                              for j in range(c)])
            out_n.append(rows)
        return jnp.stack(out_n)                      # [nn, cc, Ep]

    # ------------------------------------------------------------------
    def rows_from_list(self, lst, comp_counts):
        """Node-major list (n-major, comp-minor — gather_rows_list
        order) -> component-major [rows, Ep] array.

        comp_counts = (n_groups, group_size): the list has n_groups*gs
        entries indexed n*gs + k; output row order is k*n_groups + n.
        """
        ng, gs = comp_counts
        order = [n * gs + k for k in range(gs) for n in range(ng)]
        arr = jnp.stack([lst[i] for i in order], axis=0)
        pad = self.Ep - arr.shape[1]
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.zeros((arr.shape[0], pad), arr.dtype)], axis=1)
        return arr

    def rows_to_list(self, rows, comp_counts):
        """Component-major [rows, Ep] -> node-major list of [E] rows
        (scatter_rows_list order)."""
        ng, gs = comp_counts
        return [rows[k * ng + n, :self.E]
                for n in range(ng) for k in range(gs)]
