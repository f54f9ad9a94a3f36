"""VTU / PVTU field output (DataOut equivalent — SURVEY.md §2.2
``write_output_results``).

Writes XML UnstructuredGrid ``.vtu`` files with inline base64 binary
arrays.  High-order Qk elements are written as k^dim linear sub-cells
(the reference's ``subdivision`` high-order visualization), so any
ParaView build renders them.  A ``.pvtu`` wrapper supports multi-part
(sharded) output; the time series master is ``PVDHandler``.
"""

from __future__ import annotations

import base64
import os
import struct

import numpy as np

VTK_QUAD = 9
VTK_HEXAHEDRON = 12


def _b64(arr: np.ndarray) -> str:
    raw = arr.tobytes()
    header = struct.pack("<I", len(raw))
    return base64.b64encode(header + raw).decode("ascii")


def _data_array(name: str, arr: np.ndarray, n_comp: int | None = None) -> str:
    if arr.dtype == np.float64:
        arr = arr.astype(np.float32)
    dtype_name = {np.dtype("float32"): "Float32",
                  np.dtype("int32"): "Int32",
                  np.dtype("int64"): "Int64",
                  np.dtype("uint8"): "UInt8"}[arr.dtype]
    ncomp_attr = f' NumberOfComponents="{n_comp}"' if n_comp else ""
    return (f'<DataArray type="{dtype_name}" Name="{name}"{ncomp_attr} '
            f'format="binary">\n{_b64(arr)}\n</DataArray>')


def subcell_connectivity(elem_nodes: np.ndarray, degree: int,
                         dim: int) -> np.ndarray:
    """Split each Qk element into k^dim linear VTK cells.

    elem_nodes: [E, (k+1)^dim]; returns [E * k^dim, 2^dim] in VTK corner
    order (counterclockwise quad / VTK hexahedron ordering).
    """
    n1d = degree + 1
    cells = []
    if dim == 2:
        def lat(i, j):
            return i + n1d * j
        for j in range(degree):
            for i in range(degree):
                cells.append([lat(i, j), lat(i + 1, j),
                              lat(i + 1, j + 1), lat(i, j + 1)])
    else:
        def lat(i, j, k):
            return i + n1d * (j + n1d * k)
        for k in range(degree):
            for j in range(degree):
                for i in range(degree):
                    cells.append([
                        lat(i, j, k), lat(i + 1, j, k),
                        lat(i + 1, j + 1, k), lat(i, j + 1, k),
                        lat(i, j, k + 1), lat(i + 1, j, k + 1),
                        lat(i + 1, j + 1, k + 1), lat(i, j + 1, k + 1)])
    sub = np.asarray(cells, dtype=np.int64)              # [k^dim, 2^dim]
    out = elem_nodes[:, sub]                              # [E, k^dim, 2^dim]
    return out.reshape(-1, 2 ** dim)


def write_vtu(path: str, points: np.ndarray, cells: np.ndarray,
              point_data: dict[str, np.ndarray]) -> None:
    """points[N, dim]; cells[C, 2^dim] (VTK order); point_data name->array
    ([N] scalars or [N, k] vectors — vectors are padded to 3 components).
    """
    N, dim = points.shape
    C = cells.shape[0]
    pts3 = np.zeros((N, 3), dtype=np.float32)
    pts3[:, :dim] = points
    ctype = VTK_QUAD if cells.shape[1] == 4 else VTK_HEXAHEDRON

    pd_xml = []
    for name, arr in point_data.items():
        arr = np.asarray(arr)
        if arr.ndim == 1:
            pd_xml.append(_data_array(name, arr.astype(np.float32)))
        else:
            a3 = np.zeros((N, 3), dtype=np.float32)
            a3[:, :arr.shape[1]] = arr
            pd_xml.append(_data_array(name, a3, n_comp=3))

    conn = cells.astype(np.int64).reshape(-1)
    offsets = (np.arange(1, C + 1) * cells.shape[1]).astype(np.int64)
    types = np.full(C, ctype, dtype=np.uint8)

    xml = f"""<?xml version="1.0"?>
<VTKFile type="UnstructuredGrid" version="0.1" byte_order="LittleEndian" header_type="UInt32">
<UnstructuredGrid>
<Piece NumberOfPoints="{N}" NumberOfCells="{C}">
<Points>
{_data_array("Points", pts3, n_comp=3)}
</Points>
<Cells>
{_data_array("connectivity", conn)}
{_data_array("offsets", offsets)}
{_data_array("types", types)}
</Cells>
<PointData>
{chr(10).join(pd_xml)}
</PointData>
</Piece>
</UnstructuredGrid>
</VTKFile>
"""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(xml)


def write_pvtu(path: str, piece_files: list[str],
               point_data_names: dict[str, int]) -> None:
    """Parallel wrapper: point_data_names maps name -> n_components."""
    pd = []
    for name, nc in point_data_names.items():
        ncomp = f' NumberOfComponents="{nc}"' if nc > 1 else ""
        pd.append(f'<PDataArray type="Float32" Name="{name}"{ncomp}/>')
    pieces = "\n".join(f'<Piece Source="{os.path.basename(f)}"/>'
                       for f in piece_files)
    xml = f"""<?xml version="1.0"?>
<VTKFile type="PUnstructuredGrid" version="0.1" byte_order="LittleEndian">
<PUnstructuredGrid GhostLevel="0">
<PPoints><PDataArray type="Float32" Name="Points" NumberOfComponents="3"/></PPoints>
<PPointData>
{chr(10).join(pd)}
</PPointData>
{pieces}
</PUnstructuredGrid>
</VTKFile>
"""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write(xml)
