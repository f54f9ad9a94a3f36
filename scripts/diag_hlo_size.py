"""Diagnose the O(N) compiled-executable wall (VERDICT r4 Missing #1).

The MLIR sent to the TPU compiler was SMALL (1.5-2.7 MB, see
docs/tgv96_gmg_run.log `code_len=`), yet the optimized HLO module
serialized to 3.3-4.2 GB: XLA's own optimization pipeline materializes
O(N) literal constants during compilation.  This script compiles the
failing program (`_chunk_pstate_jit` / `_chunk_cycle_state_jit`) at two
mesh sizes on CPU, measures the serialized optimized-module size, and
lists every large `constant` instruction with its source metadata.

    DIAG_CASE=tgv DIAG_NS="8,16" python scripts/diag_hlo_size.py
"""

import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("SOFTX_NEWTON_CHUNK", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from softx_2020_200_tpu.core.parameters import SimulationParameters
from softx_2020_200_tpu.solvers.base import GLSNavierStokesSolver

CASE = os.environ.get("DIAG_CASE", "tgv")
NS = [int(x) for x in os.environ.get("DIAG_NS", "8,16").split(",")]
PALLAS = os.environ.get("DIAG_PALLAS", "0") == "1"
PRECOND = os.environ.get("DIAG_PRECOND", "gmg")

# pin the hierarchy depth so size comparisons isolate the O(N) term
if os.environ.get("DIAG_MAXLEV"):
    import softx_2020_200_tpu.ops.multigrid as _mg
    _orig_bh = _mg.build_hierarchy
    _mg.build_hierarchy = lambda solver, **kw: _orig_bh(
        solver, max_levels=int(os.environ["DIAG_MAXLEV"]))


def build(n):
    prm = SimulationParameters.from_file(
        os.path.join(os.path.dirname(__file__), "..",
                     "examples", "tgv3d_re1600.prm"), dim=3)
    prm.simulation_control.output_frequency = 0
    L = 6.283185307179586
    prm.mesh.grid_arguments = (f"{n}, {n}, {n} : 0, 0, 0 : "
                               f"{L}, {L}, {L} : true")
    prm.restart.checkpoint = False
    prm.linear_solver.preconditioner = PRECOND
    if PALLAS:
        prm.fem.kernel = "pallas"
    s = GLSNavierStokesSolver(prm)
    if PALLAS:
        # CPU: run the pallas kernels in interpret mode but keep the
        # pallas call graph (closest to the TPU trace)
        s.op.enable_pallas(interpret=True)
    return s


def big_constants(txt, min_bytes=1 << 12):
    """Parse optimized HLO text for constant instructions, aggregate
    bytes by source metadata; returns (total, [(bytes, count, src)])."""
    agg = {}
    total = 0
    for line in txt.splitlines():
        if "= " not in line or "constant(" not in line:
            continue
        m = re.search(r"=\s+(\w+)\[([\d,]*)\]", line)
        if not m:
            continue
        dt, dims = m.groups()
        nbytes = int(np.dtype(
            {"f32": np.float32, "f64": np.float64, "s32": np.int32,
             "s64": np.int64, "u32": np.uint32, "u8": np.uint8,
             "pred": np.bool_, "bf16": np.float16,
             "s8": np.int8}.get(dt, np.float32)).itemsize)
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sz = n * nbytes
        total += sz
        if sz < min_bytes:
            continue
        ms = re.search(r'source_file="([^"]+)" source_line=(\d+)', line)
        key = (f"{ms.group(1)}:{ms.group(2)}" if ms else "<no-meta>",
               m.group(0)[2:])
        b, cnt = agg.get(key, (0, 0))
        agg[key] = (b + sz, cnt + 1)
    out = sorted(((b, c, k) for k, (b, c) in agg.items()), reverse=True)
    return total, out


results = {}
for n in NS:
    s = build(n)
    N = s.space.n_nodes
    c = s.dim + 1
    u = jnp.zeros((N, c))
    combo = jnp.zeros((N, s.dim))
    t, alpha0, sdt = 0.02, 75.0, 75.0

    progs = {
        "pstate": (s._chunk_pstate_impl,
                   (u, combo, t, alpha0, sdt, s._consts)),
    }
    # one Krylov cycle program needs a pstate value: trace-only via
    # eval_shape is not enough for compile; build it for real (CPU)
    pstate = s._chunk_pstate_jit(u, combo, t, alpha0, sdt, s._consts)
    R = jnp.zeros((N, c))
    x = jnp.zeros(N * c)
    atol = jnp.asarray(1e-8)
    progs["cycle_state"] = (
        s._chunk_cycle_state_impl,
        (u, R, x, atol, pstate, combo, t, alpha0, sdt, s._consts))

    row = {}
    for name, (fn, args) in progs.items():
        lowered = jax.jit(fn).lower(*args)
        mlir_len = len(lowered.as_text())
        compiled = lowered.compile()
        mods = compiled.runtime_executable().hlo_modules()
        proto_len = sum(len(m.as_serialized_hlo_module_proto())
                        for m in mods)
        txt = "\n".join(m.to_string() for m in mods)
        total_const, consts = big_constants(txt)
        n_instr = txt.count("\n  ")
        row[name] = dict(mlir=mlir_len, proto=proto_len,
                         n_dofs=N * c, consts=consts)
        print(f"N={n}^3 dofs={N*c} prog={name}: mlir={mlir_len/1e6:.2f}MB "
              f"optimized_proto={proto_len/1e6:.2f}MB "
              f"const_bytes={total_const/1e6:.2f}MB "
              f"hlo_text={len(txt)/1e6:.1f}MB instr~{n_instr}",
              flush=True)
        for b, cnt, key in consts[:12]:
            print(f"    {b/1e6:8.2f}MB x{cnt:4d}  {key[1]:24s} {key[0]}")
    results[n] = row

if len(NS) == 2:
    a, b = NS
    for name in results[a]:
        pa, pb = results[a][name]["proto"], results[b][name]["proto"]
        da, db = results[a][name]["n_dofs"], results[b][name]["n_dofs"]
        growth = (pb - pa) / max(db - da, 1)
        print(f"{name}: proto {pa/1e6:.2f} -> {pb/1e6:.2f} MB "
              f"({growth:.1f} B/DoF marginal)")
