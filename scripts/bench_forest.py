"""Forest (p4est-replacement) adaptation cost at scale — VERDICT r2
next-round #7 done-criterion: "documented adaptation cost table,
measured at >= 1M leaves".

Measures, per leaf count, the wall time of the full host adaptation
pipeline on a uniform 3D base cube with a spherical-shell refinement
band (a realistic AMR marking pattern):

    refine(marked) -> balance() (2:1 fixpoint) -> build_mesh()
    (vectorized node placement + non-conforming face extraction)

plus the hanging-constraint build on the resulting mesh.  Writes
docs/forest_cost.json and prints one JSON line per size.

    python scripts/bench_forest.py            # sizes up to ~1.2M leaves
    FOREST_MAX=200000 python scripts/bench_forest.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def run_case(n_base: int, dim: int, max_leaves: int):
    from softx_2020_200_tpu.fem.mesh import subdivided_hyper_rectangle
    from softx_2020_200_tpu.fem.forest import Forest

    mesh = subdivided_hyper_rectangle([0.0] * dim, [1.0] * dim,
                                      [n_base] * dim, colorize=True)
    f = Forest(mesh)
    rows = {}
    # refinement rounds: mark every leaf whose centroid sits in a
    # spherical band around r=0.35 (mimics a boundary-layer/shock band)
    rounds = 0
    while f.n_leaves() < max_leaves and rounds < 6:
        order, b_arr, lvl, idx = f._leaf_arrays()
        # centroid of each leaf from its Morton index at its level
        # (cheap reconstruction: base-cell lattice + within-cell offset)
        cents = _centroids(f, mesh, b_arr, lvl, idx, n_base, dim)
        r = np.abs(np.linalg.norm(cents - 0.5, axis=1) - 0.35)
        band = 0.25 / (2.0 ** lvl)
        marked_idx = np.nonzero(r < band)[0]
        budget = (max_leaves - f.n_leaves()) // (2 ** dim - 1)
        marked_idx = marked_idx[:max(0, budget)]
        if len(marked_idx) == 0:
            break
        marked = [order[i] for i in marked_idx]

        t0 = time.perf_counter()
        f.refine(marked)
        t_refine = time.perf_counter() - t0
        t0 = time.perf_counter()
        f.balance()
        t_balance = time.perf_counter() - t0
        t0 = time.perf_counter()
        mesh_out, elem_of, ncf = f.build_mesh()
        t_build = time.perf_counter() - t0

        t0 = time.perf_counter()
        from softx_2020_200_tpu.fem.dof import FESpace
        from softx_2020_200_tpu.fem.constraints import \
            build_hanging_constraints
        space = FESpace(mesh_out, 1)
        hc = build_hanging_constraints(space, ncf)
        t_constraints = time.perf_counter() - t0

        rows[f.n_leaves()] = {
            "leaves": f.n_leaves(),
            "marked": len(marked),
            "nc_faces": len(ncf),
            "hc_rows": int(hc.n),
            "refine_s": round(t_refine, 3),
            "balance_s": round(t_balance, 3),
            "build_mesh_s": round(t_build, 3),
            "constraints_s": round(t_constraints, 3),
            "total_s": round(t_refine + t_balance + t_build
                             + t_constraints, 3),
        }
        print(json.dumps(rows[f.n_leaves()]), flush=True)
        rounds += 1
    return list(rows.values())


def _centroids(f, mesh, b_arr, lvl, idx, n_base, dim):
    """Leaf centroids on the axis-aligned cube base (bench-only)."""
    # base-cell origin: cells of subdivided_hyper_rectangle are a
    # lattice in lexicographic order
    h = 1.0 / n_base
    if dim == 2:
        bx = (b_arr % n_base)
        by = (b_arr // n_base)
        borig = np.stack([bx, by], axis=1) * h
    else:
        bx = b_arr % n_base
        by = (b_arr // n_base) % n_base
        bz = b_arr // (n_base * n_base)
        borig = np.stack([bx, by, bz], axis=1) * h
    # within-cell offset: idx is [E, d] per-axis coordinates at `lvl`
    size = h / (2.0 ** lvl)
    return borig + (idx + 0.5) * size[:, None]


def main():
    max_leaves = int(os.environ.get("FOREST_MAX", "1200000"))
    out = {"case": "3d_cube_spherical_band", "rows": []}
    out["rows"] = run_case(n_base=8, dim=3, max_leaves=max_leaves)
    path = os.path.join(os.path.dirname(__file__), "..", "docs",
                        "forest_cost.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"metric": "forest_adaptation",
                      "max_leaves": out["rows"][-1]["leaves"]
                      if out["rows"] else 0}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
