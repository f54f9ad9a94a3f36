"""Forest-of-quadtrees/octrees adaptive meshes (p4est replacement).

The reference delegates adaptive meshing to p4est (SURVEY.md §2.5):
forest of octrees over a coarse base mesh, 2:1-balanced refinement,
hanging nodes at non-conforming faces.  This module is the TPU-native
stand-in: leaves are integer-coordinate cells ``(level, i0, i1[, i2])``
inside each base cell; refinement/coarsening/balancing are host-side
integer set operations; ``build_mesh`` lowers the leaf set to the plain
array Mesh the rest of the framework consumes, together with the
non-conforming face list that drives hanging-node constraints and the
Kelly estimator.

Adjacent base cells may carry ROTATED/FLIPPED local frames (the O-ring
seam of the cylinder mesh, gmsh imports): every base-face pair stores a
full tangent-frame transform (axis permutation + per-axis flip), applied
when leaf coordinates cross the face — the forest analogue of p4est's
face connectivity orientation codes.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mesh import Mesh, place_nodes, _mesh_tolerance

Leaf = tuple  # (level, i0, i1[, i2]) — ints, i in [0, 2^level)


@dataclass
class NonConformingFace:
    """A coarse|fine interface: the coarse cell's face is covered by
    2^(d-1) finer cell faces.

    ``tmap`` describes the fine->coarse tangent frame, one entry per
    FINE tangent axis in ascending order: (coarse_axis, flip, child_bit)
    — a fine reference coordinate x along that fine axis sits at
    coarse-face coordinate (child_bit + (1-x if flip else x)) / 2 along
    coarse_axis.  For unrotated adjacency this reduces to the plain
    child-position description."""
    coarse_elem: int          # element index in the built mesh
    coarse_face: int          # in the COARSE cell's frame
    fine_elem: int
    fine_face: int
    tmap: tuple               # ((coarse_axis, flip, child_bit), ...)


class Forest:
    def __init__(self, base: Mesh):
        self.base = base
        self.dim = base.dim
        # leaves per base cell
        self.leaves: list[set] = [
            {(0,) + (0,) * self.dim} for _ in range(base.n_cells)]
        self._adjacency = self._build_adjacency()

    # ------------------------------------------------------------------
    def _build_adjacency(self):
        """base cell adjacency with orientation: (b, face) ->
        (b', face', perm, flip).

        Crossing from cell b through `face` into b', leaf coordinates
        transform as j'[perm[a]] = (n-1-j[a]) if flip[a] else j[a] for
        every tangent axis a; the normal coordinate is set from face'.
        perm/flip are derived from the shared corner vertices (p4est's
        connectivity orientation, computed instead of encoded)."""
        base = self.base
        d = self.dim
        nc = 2 ** d
        faces: dict[tuple, list] = {}
        from .basis import _lex_indices
        corner_ij = _lex_indices(2, d)
        for b in range(base.n_cells):
            for f in range(2 * d):
                axis, side = divmod(f, 2)
                sel = [i for i in range(nc)
                       if corner_ij[i, axis] == (1 if side else 0)]
                key = tuple(sorted(int(base.cells[b, i]) for i in sel))
                faces.setdefault(key, []).append((b, f))

        def transform(b1, f1, b2, f2, gid_map=None):
            """(perm, flip) for crossing b1 -> b2 through f1|f2.

            ``gid_map`` translates b1-side corner gids to the matching
            b2-side gids for PERIODIC seams (no shared vertices)."""
            axis1, side1 = divmod(f1, 2)
            axis2, side2 = divmod(f2, 2)
            pos2 = {int(g): corner_ij[i]
                    for i, g in enumerate(base.cells[b2])}

            def corner1(bits):
                want = [bits.get(a, 0) for a in range(d)]
                for i in range(nc):
                    if list(corner_ij[i]) == want:
                        g = int(base.cells[b1, i])
                        return gid_map[g] if gid_map else g
                raise KeyError(bits)

            g0 = corner1({axis1: side1})
            p0 = pos2[g0]
            perm = [-1] * d
            flip = [False] * d
            perm[axis1] = axis2
            for a in range(d):
                if a == axis1:
                    continue
                ga = corner1({axis1: side1, a: 1})
                pa = pos2[ga]
                diff = [i for i in range(d) if pa[i] != p0[i]]
                if len(diff) != 1:
                    raise ValueError(
                        "degenerate base-face corner matching "
                        f"between cells {b1} and {b2}")
                a2 = diff[0]
                perm[a] = a2
                flip[a] = bool(pa[a2] == 0)
            return tuple(perm), tuple(flip)

        adj = {}
        for key, lst in faces.items():
            if len(lst) == 2:
                (b1, f1), (b2, f2) = lst
                adj[(b1, f1)] = (b2, f2) + transform(b1, f1, b2, f2)
                adj[(b2, f2)] = (b1, f1) + transform(b2, f2, b1, f1)

        # periodic seams (declared on the BASE mesh before the forest is
        # built): match boundary faces of the paired ids by coordinates
        # modulo the translation axis — p4est's periodic connectivity
        for (bid_a, bid_b, ax) in getattr(base, "periodic", []):
            by_bid: dict[int, list] = {}
            for (e, f, bid) in base.boundary_faces:
                by_bid.setdefault(int(bid), []).append((int(e), int(f)))
            fa_list = by_bid.get(int(bid_a), [])
            fb_list = by_bid.get(int(bid_b), [])
            if not fa_list or not fb_list:
                continue
            tol = _mesh_tolerance(base.vertices, base.cells)

            def face_corners(b, f):
                axis, side = divmod(f, 2)
                return [int(base.cells[b, i]) for i in range(nc)
                        if corner_ij[i, axis] == (1 if side else 0)]

            def tkey(gids):
                """face key from coordinates with the periodic axis
                projected out"""
                pts = base.vertices[gids].copy()
                pts[:, ax] = 0.0
                q = np.round(pts / tol).astype(np.int64)
                return tuple(sorted(map(tuple, q.tolist())))

            b_lookup = {}
            for (e2, f2) in fb_list:
                b_lookup[tkey(face_corners(e2, f2))] = (e2, f2)
            for (e1, f1) in fa_list:
                if (e1, f1) in adj:
                    continue
                partner = b_lookup.get(tkey(face_corners(e1, f1)))
                if partner is None:
                    raise ValueError(
                        f"periodic pair {bid_a}|{bid_b}: no matching "
                        f"base face for cell {e1} face {f1}")
                e2, f2 = partner
                ga = face_corners(e1, f1)
                gb = face_corners(e2, f2)
                qa = np.round(np.delete(base.vertices[ga], ax, axis=1)
                              / tol).astype(np.int64)
                qb = np.round(np.delete(base.vertices[gb], ax, axis=1)
                              / tol).astype(np.int64)
                look = {tuple(r): g for r, g in zip(qb.tolist(), gb)}
                gmap = {g: look[tuple(r)] for r, g in zip(qa.tolist(),
                                                          ga)}
                gmap_rev = {v: k for k, v in gmap.items()}
                adj[(e1, f1)] = (e2, f2) + transform(e1, f1, e2, f2,
                                                     gmap)
                adj[(e2, f2)] = (e1, f1) + transform(e2, f2, e1, f1,
                                                     gmap_rev)
        return adj

    # ------------------------------------------------------------------
    def n_leaves(self) -> int:
        return sum(len(s) for s in self.leaves)

    def all_leaves(self):
        """[(base, leaf)] in deterministic order."""
        out = []
        for b, s in enumerate(self.leaves):
            out.extend((b, leaf) for leaf in sorted(s))
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def children(leaf: Leaf, dim: int):
        lvl = leaf[0]
        idx = leaf[1:]
        out = []
        for childbits in range(2 ** dim):
            ci = tuple(2 * idx[a] + ((childbits >> a) & 1)
                       for a in range(dim))
            out.append((lvl + 1,) + ci)
        return out

    @staticmethod
    def parent(leaf: Leaf, dim: int):
        lvl = leaf[0]
        if lvl == 0:
            return None
        return (lvl - 1,) + tuple(leaf[1 + a] // 2 for a in range(dim))

    # ------------------------------------------------------------------
    def _neighbor(self, b: int, leaf: Leaf, face: int):
        """Same-level neighbor across `face`, possibly in an adjacent
        (possibly rotated) base cell.  Returns
        (b', leaf', face', perm, flip) — face' is the neighbor's face at
        the interface and (perm, flip) the b->b' tangent transform — or
        None at a domain boundary."""
        d = self.dim
        lvl = leaf[0]
        n = 1 << lvl
        idx = list(leaf[1:])
        axis, side = divmod(face, 2)
        ident = tuple(range(d))
        noflip = (False,) * d
        idx[axis] += 1 if side else -1
        if 0 <= idx[axis] < n:
            return b, (lvl, *idx), face ^ 1, ident, noflip
        nb = self._adjacency.get((b, face))
        if nb is None:
            return None
        b2, f2, perm, flip = nb
        axis2, side2 = divmod(f2, 2)
        jd = [0] * d
        for a in range(d):
            if a == axis:
                continue
            a2 = perm[a]
            jd[a2] = (n - 1 - leaf[1 + a]) if flip[a] else leaf[1 + a]
        jd[axis2] = n - 1 if side2 else 0
        return b2, (lvl, *jd), f2, perm, flip

    def _exists(self, b: int, leaf: Leaf) -> str:
        """'leaf' | 'finer' | 'coarser' | 'none'."""
        if leaf in self.leaves[b]:
            return "leaf"
        anc = self.parent(leaf, self.dim)
        while anc is not None:
            if anc in self.leaves[b]:
                return "coarser"
            anc = self.parent(anc, self.dim)
        # otherwise it is covered by finer leaves (interior position)
        return "finer"

    # ------------------------------------------------------------------
    def refine(self, marked: list[tuple[int, Leaf]]) -> None:
        for b, leaf in marked:
            if leaf in self.leaves[b]:
                self.leaves[b].remove(leaf)
                self.leaves[b].update(self.children(leaf, self.dim))

    def coarsen(self, marked: list[tuple[int, Leaf]]) -> None:
        """Merge sibling groups when ALL siblings are marked leaves."""
        marked_set = set(marked)
        by_parent: dict = {}
        for b, leaf in marked:
            p = self.parent(leaf, self.dim)
            if p is not None:
                by_parent.setdefault((b, p), []).append(leaf)
        for (b, p), kids in by_parent.items():
            allkids = self.children(p, self.dim)
            if (len(kids) == len(allkids)
                    and all(k in self.leaves[b] for k in allkids)):
                for k in allkids:
                    self.leaves[b].remove(k)
                self.leaves[b].add(p)

    def _is_subdivided(self, b: int, cell: Leaf) -> bool:
        """True if `cell` is covered by strictly finer leaves."""
        if cell in self.leaves[b]:
            return False
        anc = self.parent(cell, self.dim)
        while anc is not None:
            if anc in self.leaves[b]:
                return False        # covered by a coarser leaf
            anc = self.parent(anc, self.dim)
        return True

    def _violates_2to1(self, b: int, leaf: Leaf, face: int) -> bool:
        """Neighbor across `face` subdivided at least twice toward us?"""
        nb = self._neighbor(b, leaf, face)
        if nb is None:
            return False
        b2, ncell, face2, _, _ = nb
        if not self._is_subdivided(b2, ncell):
            return False
        # ncell is subdivided once; a violation needs one of its children
        # TOUCHING the shared face (the neighbor's face2) to be
        # subdivided again
        axis2, side2 = divmod(face2, 2)
        want_bit = side2                  # neighbor child facing back at us
        for k, child in enumerate(self.children(ncell, self.dim)):
            if ((k >> axis2) & 1) == want_bit and \
                    self._is_subdivided(b2, child):
                return True
        return False

    def balance(self) -> None:
        """Enforce 2:1 level difference across faces (p4est-style)."""
        changed = True
        while changed:
            changed = False
            for b in range(len(self.leaves)):
                for leaf in sorted(self.leaves[b]):
                    if leaf not in self.leaves[b]:
                        continue
                    for face in range(2 * self.dim):
                        if self._violates_2to1(b, leaf, face):
                            self.leaves[b].remove(leaf)
                            self.leaves[b].update(
                                self.children(leaf, self.dim))
                            changed = True
                            break

    # ------------------------------------------------------------------
    def build_mesh(self):
        """Lower the forest to a Mesh + non-conforming face list.

        Returns (mesh, elem_of[(b, leaf)] dict, nc_faces list).
        """
        base, d = self.base, self.dim
        nc = 2 ** d
        order = self.all_leaves()
        elem_of = {key: i for i, key in enumerate(order)}
        E = len(order)

        # corner vertex coordinates per leaf via the base-cell mapping
        from .basis import _lex_indices
        corner_ij = _lex_indices(2, d).astype(np.float64)
        verts = np.zeros((E, nc, d))
        for i, (b, leaf) in enumerate(order):
            lvl = leaf[0]
            h = 1.0 / (1 << lvl)
            lo = np.array(leaf[1:], dtype=np.float64) * h
            ref = lo[None, :] + corner_ij * h            # [nc, d]
            verts[i] = place_nodes(
                base, base.vertices[base.cells[b:b + 1]], ref,
                elem_ids=[b])[0]

        flat = verts.reshape(-1, d)
        tol = _mesh_tolerance(base.vertices, base.cells) / \
            (1 << max(l[0] for _, l in order)) / 4
        from .mesh import _dedup_nodes
        vertices, inverse = _dedup_nodes(flat, tol)
        cells = inverse.reshape(E, nc)

        # boundary faces + interior conforming/non-conforming faces
        bfaces = []
        nc_faces: list[NonConformingFace] = []
        base_bface = {(int(e), int(f)): int(bid)
                      for (e, f, bid) in base.boundary_faces}
        for i, (b, leaf) in enumerate(order):
            lvl = leaf[0]
            n = 1 << lvl
            for face in range(2 * d):
                axis, side = divmod(face, 2)
                at_base_bdry = (leaf[1 + axis] == (n - 1 if side else 0))
                if at_base_bdry:
                    bid = base_bface.get((b, face))
                    if (b, face) not in self._adjacency:
                        if bid is not None:
                            bfaces.append((i, face, bid))
                        continue
                    if bid is not None:
                        # PERIODIC seam: the face has (periodic)
                        # adjacency but must stay in boundary_faces so
                        # FESpace node fusion can find the paired ids;
                        # fall through to neighbor processing for 2:1 /
                        # hanging bookkeeping across the seam
                        bfaces.append((i, face, bid))
                nb = self._neighbor(b, leaf, face)
                if nb is None:
                    continue
                b2, nleaf, face2, perm, flip = nb
                status = self._exists(b2, nleaf)
                if status == "coarser":
                    # this cell is the FINE side of a non-conforming face
                    anc = self.parent(nleaf, d)
                    while anc not in self.leaves[b2]:
                        anc = self.parent(anc, d)
                    coarse_elem = elem_of[(b2, anc)]
                    dl = nleaf[0] - anc[0]
                    if dl != 1:
                        raise RuntimeError("forest not 2:1 balanced")
                    # fine->coarse tangent map: per fine tangent axis a,
                    # the coarse axis perm[a], its flip, and the child
                    # bit of the (virtual same-level) neighbor within
                    # the coarse leaf along that coarse axis
                    tmap = tuple(
                        (perm[a], flip[a],
                         nleaf[1 + perm[a]] - 2 * anc[1 + perm[a]])
                        for a in range(d) if a != axis)
                    nc_faces.append(NonConformingFace(
                        coarse_elem=coarse_elem,
                        coarse_face=face2,
                        fine_elem=i, fine_face=face, tmap=tmap))
        mesh = Mesh(dim=d, vertices=vertices, cells=cells,
                    boundary_faces=np.asarray(
                        bfaces, dtype=np.int64).reshape(-1, 3),
                    manifold_all=base.manifold_all,
                    boundary_manifolds=dict(base.boundary_manifolds),
                    periodic=list(base.periodic))
        return mesh, elem_of, nc_faces

    # ------------------------------------------------------------------
    def levels(self) -> dict:
        return {key: key[1][0] for key in
                ((b, leaf) for b, leaf in self.all_leaves())}
