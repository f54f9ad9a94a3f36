"""Roofline evidence for the matvec throughput ceiling (VERDICT r2
weak #2 / next-round #5): is the fused GLS tangent kernel
bandwidth-bound or compute-bound on the v5e?

Three measurements on the production 3D Q1 operator:

1. HBM traffic per matvec — analytic byte count of every array the
   kernel streams (gather/scatter nodal fields + SoA geometry rows),
   cross-checked against XLA's cost model ``bytes accessed``; divided
   by measured time -> achieved GB/s vs the chip's ~819 GB/s peak.
2. bf16-compute / f32-accumulate variant of the Pallas kernel
   (inputs cast to bf16 at the jit boundary): if the kernel were
   MXU/VPU-compute-bound, halving the operand width should approach
   2x; if bandwidth-bound it should approach the byte ratio.
3. A pure-stream upper bound: an elementwise triad over the same
   byte volume (the speed-of-light for this access pattern).

    python scripts/bench_roofline.py            # TPU
    JAX_PLATFORMS=cpu python scripts/bench_roofline.py

Writes docs/roofline.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_HBM_GBS = 819.0          # v5e HBM peak bandwidth (GB/s)
V5E_BF16_TFLOPS = 197.0


def build(refine, dtype):
    from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
    from softx_2020_200_tpu.fem.dof import FESpace
    from softx_2020_200_tpu.solvers.gls import GLSOperator

    n = 2 ** refine
    mesh = subdivided_hyper_rectangle([0.0] * 3, [1.0] * 3, [n] * 3,
                                      colorize=True)
    space = FESpace(mesh, 1)
    op = GLSOperator(space, nu=0.01, dtype=dtype)
    if jax.default_backend() != "cpu":
        op.enable_pallas(structured=True)
    N = space.n_nodes
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((N, 4)) * 0.1, dtype)
    v = jnp.asarray(rng.standard_normal((N, 4)), dtype)
    prev = jnp.zeros((N, 3), dtype)
    fq = jnp.zeros_like(op.qpts_phys)
    consts = {k: jnp.asarray(val, dtype)
              if jnp.issubdtype(jnp.asarray(val).dtype, jnp.floating)
              else val for k, val in op.consts().items()}
    return op, space, (u, v, prev, fq, consts)


def time_chain(op, args, n_apps=50):
    u, v, prev, fq, consts = args

    def chain(u, v, prev, fq, consts, n):
        f = lambda w: op.residual_free(w, prev, fq, 0.0, 0.0, C=consts)
        _, mv = jax.linearize(f, u)
        return jax.lax.fori_loop(0, n, lambda i, w: mv(w), v)

    step = jax.jit(chain, static_argnums=5)
    n_lo = max(2, n_apps // 10)
    for n in (n_lo, n_apps):
        _ = float(jnp.sum(jnp.abs(step(u, v, prev, fq, consts, n))))

    def run(n):
        t0 = time.perf_counter()
        w = step(u, v, prev, fq, consts, n)
        _ = float(jnp.sum(jnp.abs(w)))
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(3))
    t_hi = min(run(n_apps) for _ in range(3))
    return (t_hi - t_lo) / (n_apps - n_lo)


def stream_triad(nbytes_f32, n_apps=50):
    """Speed-of-light probe: a*reverse(x) + y over ~nbytes of streams.

    A plain elementwise ``w = a*w + y`` chain is useless under XLA: an
    elementwise self-map of ANY depth fuses into a single one-pass
    kernel (each element iterated in registers), so the measured
    "bandwidth" comes out several times HBM peak (observed 4.2 TB/s on
    the v5e, 5x the 819 GB/s spec — the round-3 first-cut number was
    invalid).  Two countermeasures here: ``lax.scan`` with
    ``unroll=1`` so the body is compiled once with a materialized
    carry, and a ``reverse`` inside the body so consecutive
    iterations cannot fuse elementwise.
    """
    n = int(nbytes_f32 / 4 / 3)          # 3 streams: 2 in 1 out
    x = jnp.ones((n,), jnp.float32)
    y = jnp.ones((n,), jnp.float32)

    def chain(x, y, n_it):
        def body(w, _):
            return 1.0000001 * w[::-1] + y, None
        w, _ = jax.lax.scan(body, x, None, length=n_it, unroll=1)
        return w

    step = jax.jit(chain, static_argnums=2)
    n_lo = max(2, n_apps // 10)
    for k in (n_lo, n_apps):
        _ = float(jnp.sum(step(x, y, k)))

    def run(k):
        t0 = time.perf_counter()
        _ = float(jnp.sum(step(x, y, k)))
        return time.perf_counter() - t0

    t_lo = min(run(n_lo) for _ in range(3))
    t_hi = min(run(n_apps) for _ in range(3))
    dt = (t_hi - t_lo) / (n_apps - n_lo)
    return 3 * n * 4 / dt / 1e9          # GB/s


def analytic_bytes(op, space, bytes_per_elem_word):
    """HBM bytes one tangent application must stream (minimum)."""
    N = space.n_nodes
    E = space.n_elements
    nn, nq, d = op.nn, op.n_q, op.dim
    b = bytes_per_elem_word
    nodal = 2 * N * 4 * b                 # read v, write out
    gathered = 2 * E * nn * 4 * b         # element gather + scatter-add
    # linearization-state rows the tangent kernel re-reads per apply:
    # uq [q,d,E], guq [q,d,d,E], tau [q? -> E], geometry Jinv [q,d,d,E]
    # + detJw [q,E] + h [E]
    state = E * (nq * d + nq * d * d) * b
    geom = E * (nq * d * d + nq + 1) * b
    return nodal + gathered + state + geom


def main():
    backend = jax.default_backend()
    refine = int(os.environ.get("ROOF_REFINE", "6" if backend != "cpu"
                                else "4"))
    out = {"backend": backend, "refine": refine}

    op32, space, args32 = build(refine, jnp.float32)
    dt32 = time_chain(op32, args32)
    n_dofs = space.n_nodes * 4
    out["n_dofs"] = n_dofs
    out["f32_sec_per_matvec"] = dt32
    out["f32_gdofs"] = n_dofs / dt32 / 1e9

    nbytes = analytic_bytes(op32, space, 4)
    out["analytic_bytes_per_matvec"] = nbytes
    out["f32_achieved_gbs"] = nbytes / dt32 / 1e9
    out["hbm_peak_gbs"] = V5E_HBM_GBS
    out["f32_hbm_utilization"] = nbytes / dt32 / 1e9 / V5E_HBM_GBS

    # XLA cost-model cross-check (non-pallas path, small size)
    try:
        op_s, space_s, args_s = build(max(3, refine - 3), jnp.float32)
        u, v, prev, fq, consts = args_s

        def one(u, v, prev, fq, consts):
            f = lambda w: op_s.residual_free(w, prev, fq, 0.0, 0.0,
                                             C=consts)
            _, mv = jax.linearize(f, u)
            return mv(v)

        cost = jax.jit(one).lower(*args_s).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        ba = float(cost.get("bytes accessed", 0.0))
        scale = space.n_elements / space_s.n_elements
        out["xla_bytes_accessed_scaled"] = ba * scale
    except Exception as e:
        out["xla_bytes_accessed_scaled"] = f"unavailable: {e}"[:120]

    # bf16 operands (f32 accumulate happens inside the kernel ops)
    try:
        op16, _, args16 = build(refine, jnp.bfloat16)
        dt16 = time_chain(op16, args16)
        out["bf16_sec_per_matvec"] = dt16
        out["bf16_speedup"] = dt32 / dt16
        # parity vs f32 at loose tolerance
        u, v, prev, fq, c16 = args16
        f16 = lambda w: op16.residual_free(w, prev, fq, 0.0, 0.0, C=c16)
        r16 = np.asarray(jax.jvp(f16, (u,), (v,))[1], np.float32)
        u32, v32, p32, q32, c32 = args32
        f32f = lambda w: op32.residual_free(w, p32, q32, 0.0, 0.0,
                                            C=c32)
        r32 = np.asarray(jax.jvp(f32f, (u32,), (v32,))[1])
        denom = np.abs(r32).max()
        out["bf16_rel_err"] = float(np.abs(r16 - r32).max() / denom)
    except Exception as e:
        out["bf16_sec_per_matvec"] = f"failed: {e}"[:200]

    if backend != "cpu":
        out["stream_triad_gbs"] = stream_triad(nbytes)

    os.makedirs("docs", exist_ok=True)
    with open("docs/roofline.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
