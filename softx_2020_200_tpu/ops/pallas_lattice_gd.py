"""Fused affine-lattice kernel for the grad-div Taylor-Hood operator.

GD analogue of ops/pallas_lattice.py (same design notes apply): on a
uniform generator lattice the element Jacobian is one global constant,
so interpolation/physical-gradient evaluation and the transpose
projection for BOTH spaces (Q(k+1) velocity, Qk pressure) lower to
``jnp.dot`` with constant operands — MXU work — while the pointwise
Galerkin + grad-div physics (solvers/gd.py::gd_soa_residual — the
reference's ``assemble_matrix_and_rhs`` in
source/solvers/gd_navier_stokes.cc, SURVEY.md §2.2) runs on the VPU
over [nq, BLK] tiles.

The mixed state is ONE component-major row block so the Newton tangent
is a single custom_jvp input:

    rows [i*nnv : (i+1)*nnv]          velocity component i   (i < d)
    rows [d*nnv : d*nnv + nnp]        pressure

The tangent is the EXACT Jacobian action (the GD weak form has no
nonlinear stabilization parameter — convection is the only bilinear
term), matching jax.jvp of gd_soa_residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_TARGET = 8 * 1024 * 1024


def _gd_affine_tables(dim, Bv, Gv, Bp, w, xe0):
    """Constant tables for one affine element (velocity coords xe0).

    Returns (Tv [(d+1)nq, nnv], Pv [nnv, (d+1)nq], Tp [nq, nnp],
    Pp [nnp, nq]): Tv rows are [values; d/dx_0; ...; d/dx_{d-1}]; the
    P matrices are transposes with det*w folded into the columns."""
    d = dim
    J = np.einsum("ni,qnj->qij", xe0, Gv)
    if np.abs(J - J[0]).max() > 1e-9 * max(np.abs(J).max(), 1e-30):
        raise ValueError("element is not affine")
    J0 = J[0]
    detJ = float(np.linalg.det(J0))
    Jinv = np.linalg.inv(J0)
    Gphys = np.einsum("qna,ai->qni", Gv, Jinv)          # [nq, nnv, d]
    Tv = np.concatenate([Bv] + [Gphys[:, :, i] for i in range(d)],
                        axis=0)
    detw = detJ * w                                     # [nq]
    Pv = (Tv * np.tile(detw, d + 1)[:, None]).T
    Tp = Bp
    Pp = (Bp * detw[:, None]).T
    return Tv, Pv, Tp, Pp


def _build_gd_kernel(dim, nnv, nnp, nq, nu, gamma, tangent,
                     compute_dtype=jnp.float32, dot_precision=None):
    """Kernel body over mixed component-major 2D row blocks.

    Refs: alpha0 (SMEM); Tv, Pv, Tp, Pp (VMEM consts);
    ue [d*nnv+nnp, BLK] (, due), vpe [d*nnv, BLK], fq [d*nq, BLK];
    out [d*nnv+nnp, BLK].
    """
    d = dim

    def dot(a, b):
        return jnp.dot(a, b, preferred_element_type=compute_dtype,
                       precision=dot_precision)

    def kernel(alpha0_ref, Tv_ref, Pv_ref, Tp_ref, Pp_ref, *refs):
        if tangent:
            ue_ref, due_ref, vpe_ref, fq_ref, out_ref = refs
        else:
            ue_ref, vpe_ref, fq_ref, out_ref = refs

        alpha0 = alpha0_ref[0, 0].astype(compute_dtype)
        Tv = Tv_ref[...]
        Pv = Pv_ref[...]
        Tp = Tp_ref[...]
        Pp = Pp_ref[...]

        def vcomp(ref, i):
            return ref[i * nnv:(i + 1) * nnv, :].astype(compute_dtype)

        def pcomp(ref):
            return ref[d * nnv:d * nnv + nnp, :].astype(compute_dtype)

        # ---- interpolation (MXU) --------------------------------------
        prim = [dot(Tv, vcomp(ue_ref, i)) for i in range(d)]
        vel = [prim[i][:nq] for i in range(d)]
        gvel = [[prim[i][(1 + j) * nq:(2 + j) * nq] for j in range(d)]
                for i in range(d)]

        # ---- pointwise physics (VPU) ----------------------------------
        if tangent:
            dprm = [dot(Tv, vcomp(due_ref, i)) for i in range(d)]
            dpq = dot(Tp, pcomp(due_ref))
            dvel = [dprm[i][:nq] for i in range(d)]
            dgvel = [[dprm[i][(1 + j) * nq:(2 + j) * nq]
                      for j in range(d)] for i in range(d)]
            ddiv = sum(dgvel[i][i] for i in range(d))
            a_v = [alpha0 * dvel[i]
                   + sum(dgvel[i][j] * vel[j] + gvel[i][j] * dvel[j]
                         for j in range(d)) for i in range(d)]
            gd_p = gamma * ddiv - dpq
            a_g = [[nu * dgvel[i][j] + (gd_p if i == j else 0.0)
                    for j in range(d)] for i in range(d)]
            a_p = ddiv
        else:
            pq = dot(Tp, pcomp(ue_ref))
            upv = [dot(Tv[:nq], vcomp(vpe_ref, i)) for i in range(d)]
            fqv = [fq_ref[i * nq:(i + 1) * nq, :].astype(compute_dtype)
                   for i in range(d)]
            div = sum(gvel[i][i] for i in range(d))
            a_v = [alpha0 * vel[i] + upv[i]
                   + sum(gvel[i][j] * vel[j] for j in range(d))
                   - fqv[i] for i in range(d)]
            gd_p = gamma * div - pq
            a_g = [[nu * gvel[i][j] + (gd_p if i == j else 0.0)
                    for j in range(d)] for i in range(d)]
            a_p = div

        # ---- projection (MXU): quadrature sum via det*w-scaled P ------
        for i in range(d):
            stack = jnp.concatenate([a_v[i]] + a_g[i], axis=0)
            out_ref[i * nnv:(i + 1) * nnv, :] = dot(Pv, stack)
        out_ref[d * nnv:d * nnv + nnp, :] = dot(Pp, a_p)

    return kernel


class PallasLatticeGD:
    """Affine-lattice grad-div Taylor-Hood operator core.

    ``residual_rows(ue2, vpe2, fq2, alpha0)`` evaluates the mixed
    residual in component-major row layout with a custom_jvp whose
    tangent is the exact GD Jacobian action.  Raises ValueError when
    the velocity lattice is not uniform (caller keeps the SoA path).
    """

    def __init__(self, space_v, space_p, nu: float, gamma: float,
                 elem_coords_v, n_q1d: int, dtype=jnp.float32,
                 interpret=False):
        d = space_v.dim
        self.dim = d
        self.nu = float(nu)
        self.gamma = float(gamma)
        self.dtype = dtype
        self.interpret = interpret

        _, wts, Bv, Gv, _ = space_v.basis.quadrature(n_q1d)
        _, _, Bp, _, _ = space_p.basis.quadrature(n_q1d)
        self.nq = nq = wts.shape[0]
        self.nnv = nnv = space_v.basis.n_nodes
        self.nnp = nnp = space_p.basis.n_nodes
        self.rows_state = d * nnv + nnp

        xe = np.asarray(elem_coords_v, np.float64)
        E = xe.shape[0]
        self.E = E
        Tv, Pv, Tp, Pp = _gd_affine_tables(d, Bv, Gv, Bp, wts, xe[0])
        sample = np.unique(np.linspace(0, E - 1, 4096).astype(np.int64))
        rel = xe[sample] - xe[sample, :1]
        if np.abs(rel - rel[0]).max() > 1e-9 * max(
                np.abs(rel[0]).max(), 1e-30):
            raise ValueError("lattice is not uniform; keep the SoA path")
        self.Tv = jnp.asarray(Tv, dtype)
        self.Pv = jnp.asarray(Pv, dtype)
        self.Tp = jnp.asarray(Tp, dtype)
        self.Pp = jnp.asarray(Pp, dtype)

        rows_in = 2 * self.rows_state + d * nnv + d * nq \
            + self.rows_state
        rows_inter = 2 * d * (d + 1) * nq + 2 * nq + d * nq \
            + (d + 1) * nq * d + 8 * nq
        bytes_per_lane = (2 * rows_in + rows_inter) * 4
        blk = 8192
        while blk > 128 and blk * bytes_per_lane > _VMEM_TARGET:
            blk //= 2
        self.BLK = blk
        self.Eg = (E + blk - 1) // blk
        self.Ep = self.Eg * blk

        self._primal = self._make_call(tangent=False)
        self._tangent = self._make_call(tangent=True)

        @jax.custom_jvp
        def residual_rows(ue2, vpe2, fq2, alpha0):
            return self._primal(ue2, vpe2, fq2, alpha0)

        @residual_rows.defjvp
        def _jvp(primals, tangents):
            ue2, vpe2, fq2, alpha0 = primals
            due2 = tangents[0]
            out = residual_rows(ue2, vpe2, fq2, alpha0)
            dout = self._tangent(ue2, due2, vpe2, fq2, alpha0)
            return out, dout

        self.residual_rows = residual_rows

    # ------------------------------------------------------------------
    def _make_call(self, tangent: bool):
        kern = _build_gd_kernel(self.dim, self.nnv, self.nnp, self.nq,
                                self.nu, self.gamma, tangent,
                                compute_dtype=self.dtype,
                                dot_precision=lax.Precision.HIGHEST)
        d, nq = self.dim, self.nq
        BLK, Eg = self.BLK, self.Eg
        rs = self.rows_state

        def smem_spec(shape):
            return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                memory_space=pltpu.SMEM)

        def const_spec(shape):
            return pl.BlockSpec(shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM)

        def rows_spec(r):
            return pl.BlockSpec((r, BLK), lambda i: (0, i),
                                memory_space=pltpu.VMEM)

        row_counts = ([rs, rs, d * self.nnv, d * nq] if tangent
                      else [rs, d * self.nnv, d * nq])

        call = pl.pallas_call(
            kern,
            grid=(Eg,),
            in_specs=[smem_spec((1, 1)),
                      const_spec(self.Tv.shape),
                      const_spec(self.Pv.shape),
                      const_spec(self.Tp.shape),
                      const_spec(self.Pp.shape)]
            + [rows_spec(r) for r in row_counts],
            out_specs=rows_spec(rs),
            out_shape=jax.ShapeDtypeStruct((rs, self.Ep), self.dtype),
            interpret=self.interpret,
        )

        if tangent:
            def run(ue2, due2, vpe2, fq2, alpha0):
                a = jnp.asarray(alpha0, self.dtype).reshape(1, 1)
                return call(a, self.Tv, self.Pv, self.Tp, self.Pp,
                            ue2, due2, vpe2, fq2)
        else:
            def run(ue2, vpe2, fq2, alpha0):
                a = jnp.asarray(alpha0, self.dtype).reshape(1, 1)
                return call(a, self.Tv, self.Pv, self.Tp, self.Pp,
                            ue2, vpe2, fq2)
        return run

    # ------------------------------------------------------------------
    def pack_rows(self, v_list, p_list, fq_perm):
        """(velocity gather_rows_list order n*d+i, pressure list,
        fq [E, nq, d] in GRID order) -> (ue2, fq2) padded row blocks."""
        d, nnv = self.dim, self.nnv
        order = [n * d + i for i in range(d) for n in range(nnv)]
        rows = [v_list[k] for k in order] + list(p_list)
        arr = jnp.stack(rows, axis=0)
        fq_rows = jnp.stack(
            [fq_perm[:, q, i] for i in range(d) for q in range(self.nq)],
            axis=0)
        pad = self.Ep - arr.shape[1]
        if pad:
            z = jnp.zeros((arr.shape[0], pad), arr.dtype)
            arr = jnp.concatenate([arr, z], axis=1)
            zf = jnp.zeros((fq_rows.shape[0], pad), fq_rows.dtype)
            fq_rows = jnp.concatenate([fq_rows, zf], axis=1)
        return arr, fq_rows

    def pack_vrows(self, v_list):
        """Velocity-only rows (the vprev_combo stream)."""
        d, nnv = self.dim, self.nnv
        order = [n * d + i for i in range(d) for n in range(nnv)]
        arr = jnp.stack([v_list[k] for k in order], axis=0)
        pad = self.Ep - arr.shape[1]
        if pad:
            arr = jnp.concatenate(
                [arr, jnp.zeros((arr.shape[0], pad), arr.dtype)], axis=1)
        return arr

    def unpack_rows(self, rows):
        """[rs, Ep] -> (velocity scatter list n*d+i, pressure list)."""
        d, nnv, nnp = self.dim, self.nnv, self.nnp
        v_list = [rows[i * nnv + n, :self.E]
                  for n in range(nnv) for i in range(d)]
        p_list = [rows[d * nnv + m, :self.E] for m in range(nnp)]
        return v_list, p_list
