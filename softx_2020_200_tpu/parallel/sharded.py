"""Sharded GLS Navier-Stokes solve: SPMD Newton-Krylov under shard_map.

The distributed analogue of the single-device path in
``solvers/base.py`` (reference: the implicit MPI layer of SURVEY.md §3.1
— ghosted Trilinos vectors + Allreduce):

- state lives as ``[P, N_loc, c]`` stacks, one shard per device;
- ghost refresh and partial-sum combination are ``lax.ppermute`` hops
  using the static index plans from :mod:`.partition`;
- all reductions (Newton norms, GMRES dots) are ``lax.psum``;
- the SAME ``newton_solve`` / ``gmres`` / element kernel as the
  single-device path run inside ``shard_map`` — only gather/scatter and
  ``reduce_fn`` differ.

The entire Newton solve is one jitted SPMD program: zero host sync per
Newton iteration on any number of chips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs)
except ImportError:                                    # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_old

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_old(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs)

from ..solvers.gls import make_element_kernel, StabFlags
from ..solvers.newton import newton_solve, NewtonConfig
from ..ops.preconditioners import _node_diag_blocks
from .partition import ShardLayout, partition_space

AXIS = "shard"


class ShardedGLSSolver:
    """Distributed steady/transient GLS solve over a 1-D device mesh."""

    def __init__(self, space, nu: float, layout: ShardLayout | None = None,
                 devices=None, n_q1d: int | None = None,
                 stab: StabFlags = StabFlags(),
                 newton: NewtonConfig = NewtonConfig(), dtype=None):
        devices = devices if devices is not None else jax.devices()
        self.n_shards = len(devices)
        self.mesh = Mesh(np.array(devices), (AXIS,))
        self.layout = layout or partition_space(space, self.n_shards)
        L = self.layout
        self.space = space
        self.dim = space.dim
        self.nc = space.dim + 1
        self.nu = nu
        dtype = dtype or jnp.asarray(1.0).dtype
        self.dtype = dtype

        n_q1d = n_q1d or (space.degree + 1)
        pts, wts, B, G, H = space.basis.quadrature(n_q1d)
        from ..ops.batched_kernel import make_batched_kernel
        batched = make_batched_kernel(
            dim=space.dim, degree=space.degree, B=B, G=G, H=H, w=wts,
            nu=nu, stab=stab, dtype=dtype)

        def kernel_aos(ue, xe, upe, fq, alpha0, sdt):
            """[E, nn, c]-in/out wrapper over the batch-minor kernel."""
            r = batched(jnp.transpose(ue, (1, 2, 0)),
                        jnp.transpose(xe, (1, 2, 0)),
                        jnp.transpose(upe, (1, 2, 0)),
                        jnp.transpose(fq, (1, 2, 0)), alpha0, sdt)
            return jnp.transpose(r, (2, 0, 1))

        self._kernel_aos = kernel_aos
        # single-element kernel retained for the preconditioner jacfwd
        kernel = make_element_kernel(
            dim=space.dim, degree=space.degree,
            B=jnp.asarray(B, dtype), G=jnp.asarray(G, dtype),
            H=jnp.asarray(H, dtype), w=jnp.asarray(wts, dtype),
            nu=nu, stab=stab, dtype=dtype)
        self._kernel = kernel
        self.newton_cfg = newton
        self.n_q = wts.shape[0]

        # stacked device constants
        self.c_elem_nodes = jnp.asarray(L.elem_nodes)       # [P,E,nn] i32
        self.c_elem_valid = jnp.asarray(L.elem_valid, dtype)
        self.c_xe = jnp.asarray(L.xe, dtype)
        self.c_owned = jnp.asarray(L.owned_mask, dtype)
        self.c_amap = jnp.asarray(L.assembly_idx)          # [P,N,M] i32
        self.c_send = [jnp.asarray(ex.send_idx) for ex in L.exchanges]
        self.c_recv = [jnp.asarray(ex.recv_idx) for ex in L.exchanges]
        self.c_deltas = [ex.delta for ex in L.exchanges]

        self._step = jax.jit(self._build_step())

    # ------------------------------------------------------------------
    def _build_step(self):
        L = self.layout
        Pn = self.n_shards
        trash = L.N_loc - 1
        kernel = self._kernel
        cfg = self.newton_cfg
        nc = self.nc
        d = self.dim
        deltas = self.c_deltas

        def perm(delta):
            return [(i, (i + delta) % Pn) for i in range(Pn)]

        def make_local_fns(consts):
            (elem_nodes, elem_valid, xe, owned, amap_idx,
             sends, recvs) = consts

            def assemble(r_el):
                """Gather-based assembly (TPU-fast; see ops.operators)."""
                c = r_el.shape[-1]
                flat = r_el.reshape(-1, c)
                flat = jnp.concatenate(
                    [flat, jnp.zeros((1, c), flat.dtype)], axis=0)
                return jnp.sum(flat[amap_idx], axis=1)

            def zero_trash(a):
                return a.at[trash].set(0.0)

            def refresh(u):
                """Copy owner values into ghost slots (Import)."""
                for send_i, recv_i, delta in zip(sends, recvs, deltas):
                    payload = u[send_i]
                    got = lax.ppermute(payload, AXIS, perm(delta))
                    u = u.at[recv_i].set(got)
                return zero_trash(u)

            def combine(r):
                """Add ghost partial sums back into owner slots (Export/
                compress(add))."""
                for send_i, recv_i, delta in zip(sends, recvs, deltas):
                    payload = r[recv_i]
                    got = lax.ppermute(payload, AXIS, perm(-delta))
                    r = r.at[send_i].add(got)
                return zero_trash(r)

            def residual(u, bc_mask, uprev, fq, alpha0, sdt):
                u = refresh(u)
                ue = u[elem_nodes]
                upe = refresh(uprev)[elem_nodes]
                r_el = self._kernel_aos(ue, xe, upe, fq, alpha0, sdt)
                r_el = r_el * elem_valid[:, None, None]
                r = assemble(r_el)
                r = combine(r)
                r = r * owned[:, None]
                return jnp.where(bc_mask, 0.0, r)

            def precond_builder(u, bc_mask, uprev, fq, alpha0, sdt):
                u = refresh(u)
                ue = u[elem_nodes]
                upe = refresh(uprev)[elem_nodes]
                me = bc_mask.astype(u.dtype)[elem_nodes]
                A = jax.vmap(jax.jacfwd(kernel, argnums=0),
                             in_axes=(0, 0, 0, 0, None, None))(
                    ue, xe, upe, fq, alpha0, sdt)
                E, nn = elem_nodes.shape
                nloc = nn * nc
                A = A.reshape(E, nloc, nloc) * \
                    elem_valid[:, None, None]
                m = me.reshape(E, nloc)
                keep = 1.0 - m
                A = A * keep[:, :, None] * keep[:, None, :]
                A = A + jnp.einsum(
                    "ek,kl->ekl", m * elem_valid[:, None],
                    jnp.eye(nloc, dtype=u.dtype))
                blocks_local = _node_diag_blocks(
                    A.reshape(E, nn, nc, nn, nc))
                blocks = assemble(blocks_local.reshape(E, nn, nc * nc))
                blocks = combine(blocks).reshape(u.shape[0], nc, nc)
                eye = jnp.eye(nc, dtype=u.dtype)
                # unowned/trash/degenerate slots act as identity
                deg = (jnp.abs(jnp.linalg.det(blocks)) < 1e-300) | \
                    (owned < 0.5)
                blocks = jnp.where(deg[:, None, None], eye[None], blocks)
                binv = jnp.linalg.inv(blocks)

                def apply(v):
                    z = jnp.einsum("nij,nj->ni", binv, v)
                    return z * owned[:, None]

                return apply

            return residual, precond_builder, refresh

        def local_step(u, bc_mask, bc_vals, uprev, fq, alpha0, sdt,
                       *consts_flat):
            # shard_map keeps rank: per-shard blocks carry a leading axis
            # of size 1 — strip it here, restore on the outputs
            u, bc_mask, bc_vals, uprev, fq = (
                a[0] for a in (u, bc_mask, bc_vals, uprev, fq))
            consts_flat = [a[0] for a in consts_flat]
            consts = (consts_flat[0], consts_flat[1], consts_flat[2],
                      consts_flat[3], consts_flat[4],
                      list(consts_flat[5:5 + len(deltas)]),
                      list(consts_flat[5 + len(deltas):5 + 2 * len(deltas)]))
            residual, precond_builder, refresh = make_local_fns(consts)
            reduce_fn = partial(lax.psum, axis_name=AXIS)

            u = jnp.where(bc_mask, bc_vals, u)

            res_fn = lambda v: residual(v, bc_mask, uprev, fq, alpha0, sdt)
            pb = lambda v: precond_builder(v, bc_mask, uprev, fq,
                                           alpha0, sdt)
            out = newton_solve(res_fn, u, precond_builder=pb,
                               config=cfg, reduce_fn=reduce_fn)
            return (out.u[None], out.res_history[None],
                    out.n_iterations[None], out.linear_iters[None])

        sharded = shard_map(
            local_step, self.mesh,
            in_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(), P())
            + tuple([P(AXIS)] * (5 + 2 * len(deltas))),
            out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS)))

        def step(u_stack, mask_stack, vals_stack, prev_stack, fq_stack,
                 alpha0, sdt):
            return sharded(u_stack, mask_stack, vals_stack, prev_stack,
                           fq_stack, alpha0, sdt,
                           self.c_elem_nodes, self.c_elem_valid,
                           self.c_xe, self.c_owned, self.c_amap,
                           *self.c_send, *self.c_recv)

        return step

    # ------------------------------------------------------------------
    def solve(self, u0_global, bc_mask_global, bc_vals_global,
              uprev_combo_global=None, alpha0=0.0, sdt=0.0):
        """Run one (steady or transient) distributed Newton solve.

        Inputs are global [N, c] host/device arrays; returns
        (u_global [N, c], res_history, n_iterations, linear_iters).
        """
        L = self.layout
        u = jnp.asarray(L.to_local(np.asarray(u0_global, dtype=self.dtype)))
        mask = jnp.asarray(
            L.to_local(np.asarray(bc_mask_global, np.float64)) > 0.5)
        vals = jnp.asarray(
            L.to_local(np.asarray(bc_vals_global, dtype=self.dtype)))
        if uprev_combo_global is None:
            uprev_combo_global = np.zeros(
                (L.n_nodes_global, self.dim), dtype=self.dtype)
        prev = jnp.asarray(
            L.to_local(np.asarray(uprev_combo_global, dtype=self.dtype)))
        fq = jnp.zeros((self.n_shards, L.E_loc, self.n_q, self.dim),
                       dtype=self.dtype)
        u_new, hist, iters, lin = self._step(
            u, mask, vals, prev, fq,
            jnp.asarray(alpha0, self.dtype), jnp.asarray(sdt, self.dtype))
        u_g = L.to_global(np.asarray(u_new))
        return u_g, np.asarray(hist)[0], int(np.asarray(iters)[0]), \
            int(np.asarray(lin)[0])
