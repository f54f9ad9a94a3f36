"""Where does the Q2 lattice matvec time go? (VERDICT r4 missing #2)

Q2 takes the affine-lattice MXU kernel (PallasLatticeGLS — verified by
class dispatch), yet benches at ~0.117 GDoF/s, the same as the pre-
lattice VPU path, while Q1 went 0.83 -> 1.6 (bf16 state).  The matvec
is three stages — structured window gather (nn*c strided reads),
Pallas kernel (MXU collocation), pad-sum scatter (nn dilated pads +
adds) — and for Q2 nn jumps 8 -> 27.  This probe times each stage in
isolation at matched DoF (1.1M): Q1 refine 6 vs Q2 refine 5.

Run on the chip; prints one JSON line per config.
"""
import json
import time

import numpy as np


def probe(degree, refine, n_apps=50):
    import jax
    import jax.numpy as jnp
    from jax import lax
    from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
    from softx_2020_200_tpu.fem.dof import FESpace
    from softx_2020_200_tpu.solvers.gls import GLSOperator

    n = 2 ** refine
    mesh = subdivided_hyper_rectangle([0.0] * 3, [1.0] * 3, [n] * 3,
                                      colorize=True)
    space = FESpace(mesh, degree)
    op = GLSOperator(space, nu=0.01, dtype=jnp.float32)
    op.enable_pallas(structured=True)
    sl, pg = op._structured, op._pallas
    nn, nc, d, E = op.nn, op.nc, op.dim, space.n_elements
    N = space.n_nodes

    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((N, nc)) * 0.1, jnp.float32)
    prev = jnp.zeros((N, d), jnp.float32)
    fq = jnp.zeros_like(op.qpts_phys)

    def timeit(fn, *args):
        w = fn(*args)
        jax.block_until_ready(w)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            w = fn(*args)
            jax.block_until_ready(w)
            ts.append(time.perf_counter() - t0)
        return min(ts) / n_apps

    # --- stage 1: gather (window reads + rows_from_list relayout)
    @jax.jit
    def gather_loop(u):
        def body(i, acc):
            ue2 = pg.rows_from_list(sl.gather_rows_list(u + acc), (nn, nc))
            return jnp.sum(ue2) * 1e-30
        return lax.fori_loop(0, n_apps, body, jnp.float32(0.0))

    t_gather = timeit(gather_loop, u)

    # --- stage 2: kernel (linearized tangent on fixed row blocks)
    ue2 = pg.rows_from_list(sl.gather_rows_list(u), (nn, nc))
    up2 = pg.rows_from_list(sl.gather_rows_list(prev), (nn, d))
    fqg = fq[jnp.asarray(sl.elem_perm.astype(np.int32))]
    fq2 = pg.rows_from_list(
        [fqg[:, q, i] for q in range(op.n_q) for i in range(d)],
        (op.n_q, d))

    @jax.jit
    def kernel_loop(ue2, v2):
        f = lambda w: pg.residual_rows(w, up2, fq2, 0.0, 0.0)
        _, mv = jax.linearize(f, ue2)
        return lax.fori_loop(0, n_apps, lambda i, w: mv(w), v2)

    t_kernel = timeit(kernel_loop, ue2, ue2)

    # --- stage 3: scatter (pad-sum assembly)
    r2 = pg.residual_rows(ue2, up2, fq2, 0.0, 0.0)
    flat = r2.reshape(r2.shape[0], pg.Ep)[:, :E]

    @jax.jit
    def scatter_loop(flat):
        def body(i, acc):
            rows = [flat[j] + acc for j in range(flat.shape[0])]
            out = sl.scatter_rows_list(rows, nc)
            return jnp.sum(out) * 1e-30
        return lax.fori_loop(0, n_apps, body, jnp.float32(0.0))

    t_scatter = timeit(scatter_loop, flat)

    # --- full matvec, bench protocol
    import bench
    n_dofs, n_el, dt_full = bench.time_matvec(refine, "tpu",
                                              degree=degree)

    out = {
        "degree": degree, "refine": refine, "n_dofs": n_dofs,
        "n_elements": n_el, "nn": nn,
        "us_gather": round(t_gather * 1e6, 1),
        "us_kernel": round(t_kernel * 1e6, 1),
        "us_scatter": round(t_scatter * 1e6, 1),
        "us_full": round(dt_full * 1e6, 1),
        "gdofs_full": round(n_dofs / dt_full / 1e9, 4),
    }
    print(json.dumps(out), flush=True)
    return out


if __name__ == "__main__":
    import jax
    assert jax.default_backend() == "tpu"
    probe(1, 6)
    probe(2, 5)
