"""Gmsh .msh reader (GridIn::read_msh equivalent — SURVEY.md §2.2
``read_mesh``).

Supports MSH 2.2 ASCII (the format the reference era used): quad4 cells
in 2D, hexahedron8 in 3D; codimension-1 elements (lines / quads) carry
their physical tag as the boundary id.  Gmsh corner ordering is converted
to this framework's lexicographic ordering, and faces are attached to
cells by vertex matching.
"""

from __future__ import annotations

import numpy as np

from .mesh import Mesh

# gmsh element type -> (n_nodes, dim)
_TYPES = {1: (2, 1), 3: (4, 2), 5: (8, 3), 15: (1, 0)}

# gmsh corner order -> lexicographic order
_QUAD_TO_LEX = [0, 1, 3, 2]
_HEX_TO_LEX = [0, 1, 3, 2, 4, 5, 7, 6]


def read_msh(path: str, dim: int) -> Mesh:
    with open(path) as fh:
        lines = [ln.strip() for ln in fh]
    i = 0

    def seek(tag):
        nonlocal i
        while i < len(lines) and lines[i] != tag:
            i += 1
        if i >= len(lines):
            raise ValueError(f"gmsh: missing {tag}")
        i += 1

    seek("$MeshFormat")
    version = lines[i].split()[0]
    if not version.startswith("2"):
        raise ValueError(
            f"gmsh format {version} unsupported (export as MSH 2.2)")
    seek("$Nodes")
    n_nodes = int(lines[i]); i += 1
    id_map = {}
    coords = np.zeros((n_nodes, dim))
    for k in range(n_nodes):
        parts = lines[i + k].split()
        id_map[int(parts[0])] = k
        coords[k] = [float(x) for x in parts[1:1 + dim]]
    i += n_nodes
    seek("$Elements")
    n_elem = int(lines[i]); i += 1

    cells = []
    face_sets: list[tuple[tuple, int]] = []   # (sorted corner ids, bid)
    for k in range(n_elem):
        parts = lines[i + k].split()
        etype = int(parts[1])
        if etype not in _TYPES:
            raise ValueError(f"gmsh element type {etype} unsupported "
                             "(first-order quad/hex meshes only)")
        nn, edim = _TYPES[etype]
        ntags = int(parts[2])
        phys = int(parts[3]) if ntags >= 1 else 0
        verts = [id_map[int(v)] for v in parts[3 + ntags:]]
        if edim == dim:
            order = _QUAD_TO_LEX if dim == 2 else _HEX_TO_LEX
            cells.append([verts[j] for j in order])
        elif edim == dim - 1:
            face_sets.append((tuple(sorted(verts)), phys))

    cells = np.asarray(cells, dtype=np.int64)
    if cells.size == 0:
        raise ValueError("gmsh file contains no cells of the mesh dim")

    # attach boundary faces to cells
    from .basis import _lex_indices
    corner_ij = _lex_indices(2, dim)
    nc = 2 ** dim
    face_lookup = dict(face_sets)
    bfaces = []
    for e in range(cells.shape[0]):
        for f in range(2 * dim):
            axis, side = divmod(f, 2)
            sel = [c for c in range(nc)
                   if corner_ij[c, axis] == (1 if side else 0)]
            key = tuple(sorted(int(cells[e, c]) for c in sel))
            if key in face_lookup:
                bfaces.append((e, f, face_lookup[key]))
    return Mesh(dim=dim, vertices=coords, cells=cells,
                boundary_faces=np.asarray(bfaces,
                                          dtype=np.int64).reshape(-1, 3))
