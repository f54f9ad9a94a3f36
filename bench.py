"""Primary benchmark: matrix-free operator throughput (matvec GDoF/s).

BASELINE.json's primary metric is the throughput of the matrix-free
GLS Jacobian-vector product (the reference's assembled-SpMV equivalent —
SURVEY.md §3.3 hot loop) on real TPU hardware: 3D Q1 equal-order
Navier-Stokes operator, jvp through the full stabilized element kernel.

vs_baseline anchor: the reference's CPU path applies an assembled
Trilinos SpMV; published SpMV throughput on a ~2020 server core with the
reference's ~7x(d+1)-entry rows is O(0.05) GDoF/s (memory-bandwidth
bound). BASELINE.json.published is empty (mount was empty — SURVEY.md
§0), so that documented estimate is the denominator until a measured
reference number lands.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

CPU_REFERENCE_GDOFS = 0.05


def main() -> int:
    import jax
    import jax.numpy as jnp

    refine = int(os.environ.get("BENCH_REFINE", "6"))
    backend = jax.default_backend()
    if backend == "cpu":
        refine = min(refine, 5)

    from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
    from softx_2020_200_tpu.fem.dof import FESpace
    from softx_2020_200_tpu.solvers.gls import GLSOperator

    n = 2 ** refine
    mesh = subdivided_hyper_rectangle([0.0] * 3, [1.0] * 3, [n] * 3,
                                      colorize=True)
    space = FESpace(mesh, 1)
    op = GLSOperator(space, nu=0.01)
    if backend != "cpu":
        # fused Pallas element kernel + structured window gather/scatter
        op.enable_pallas(structured=True)
    N, c = space.n_nodes, 4
    n_dofs = N * c

    dtype = op.dtype
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((N, c)) * 0.1, dtype)
    v = jnp.asarray(rng.standard_normal((N, c)), dtype)
    prev = jnp.zeros((N, 3), dtype)
    fq = jnp.zeros_like(op.qpts_phys)
    consts = op.consts()

    # all large arrays as ARGUMENTS (not closures): closure arrays embed
    # as HLO literals and wreck compile time at scale
    def matvec(u, v, prev, fq, consts):
        f = lambda w: op.residual_free(w, prev, fq, 0.0, 0.0, C=consts)
        return jax.jvp(f, (u,), (v,))[1]

    step = jax.jit(matvec)
    out = step(u, v, prev, fq, consts)
    _ = float(jnp.sum(jnp.abs(out)))   # value fetch: forces completion
    # (block_until_ready does not synchronize on the axon backend)

    n_apps = 50
    t0 = time.perf_counter()
    w = v
    for _ in range(n_apps):
        w = step(u, w, prev, fq, consts)
    _ = float(jnp.sum(jnp.abs(w)))
    dt = time.perf_counter() - t0

    gdofs = n_dofs * n_apps / dt / 1e9
    result = {
        "metric": "gls_matvec_throughput",
        "value": round(gdofs, 4),
        "unit": "GDoF/s",
        "vs_baseline": round(gdofs / CPU_REFERENCE_GDOFS, 2),
        "detail": {
            "backend": backend,
            "n_dofs": n_dofs,
            "n_elements": space.n_elements,
            "dtype": str(dtype),
            "seconds_per_matvec": dt / n_apps,
        },
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
