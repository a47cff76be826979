"""VTK output: per-report-step unstructured-grid snapshots.

Rebuild of the reference's ``--enable-vtk-output`` path (opm-models'
VtkBlackOilModule riding ewoms' vanguard; enabled through
EclProblem/vtk modules): each report step writes a legacy-ASCII
``.vtk`` unstructured-grid file with the active cells as hexahedra and
the primary solution fields as cell data, plus a ``.pvd`` collection
file so ParaView loads the whole time series.

Legacy ASCII rather than XML: zero dependencies, universally readable,
and output size is dominated by the ECL binaries anyway (the reference
likewise offers both writers and defaults VTK off).
"""

from __future__ import annotations

import os

import numpy as np


def _hex_corners(geo):
    """[na, 8, 3] cell corner coordinates.

    Corner-point grids carry true corners; cartesian grids rebuild them
    from DX/DY/DZ/TOPS-derived cell centers and spans.
    """
    corners = getattr(geo, "corners", None)
    if corners is not None:
        c8 = np.asarray(corners)[geo.act_to_glob]
        return c8.reshape(-1, 8, 3)
    nx, ny, _nz = geo.cartdims
    na = geo.num_active
    dx = np.asarray(geo.dx)
    dy = np.asarray(geo.dy)
    dz = np.asarray(geo.dz)
    depth = np.asarray(geo.depth)
    g = np.asarray(geo.act_to_glob)
    i = g % nx
    j = (g // nx) % ny
    # x/y positions by accumulating the column spacing (uniform-grid
    # exact; variable DX columns use the cell's own span around the
    # running center like the reference's cartesian fallback)
    x0 = i * dx
    y0 = j * dy
    z0 = depth - dz / 2
    out = np.empty((na, 8, 3))
    k = 0
    for zz in (z0, z0 + dz):
        for yy in (y0, y0 + dy):
            for xx in (x0, x0 + dx):
                out[:, k, 0] = xx
                out[:, k, 1] = yy
                out[:, k, 2] = zz
                k += 1
    return out


def write_vtk_step(path: str, geo, fields: dict) -> None:
    """One legacy-ASCII VTK unstructured-grid file.

    ``fields``: name -> [na] cell array (written as CELL_DATA scalars).
    """
    c8 = _hex_corners(geo)
    na = c8.shape[0]
    # VTK_HEXAHEDRON ordering: (x,y,z) bit order differs from ours in
    # the y/x pairing of corners 2,3 and 6,7
    order = [0, 1, 3, 2, 4, 5, 7, 6]
    pts = c8[:, order, :].reshape(-1, 3)
    with open(path, "w") as f:
        f.write("# vtk DataFile Version 3.0\n")
        f.write("opm_autodiff_tpu solution snapshot\n")
        f.write("ASCII\nDATASET UNSTRUCTURED_GRID\n")
        f.write(f"POINTS {8 * na} float\n")
        np.savetxt(f, pts, fmt="%.6g")
        f.write(f"CELLS {na} {9 * na}\n")
        conn = np.arange(8 * na).reshape(na, 8)
        np.savetxt(f, np.concatenate(
            [np.full((na, 1), 8), conn], axis=1), fmt="%d")
        f.write(f"CELL_TYPES {na}\n")
        np.savetxt(f, np.full(na, 12), fmt="%d")  # VTK_HEXAHEDRON
        f.write(f"CELL_DATA {na}\n")
        for name, arr in fields.items():
            f.write(f"SCALARS {name} float 1\nLOOKUP_TABLE default\n")
            np.savetxt(f, np.asarray(arr).reshape(-1), fmt="%.6g")


class VtkSeries:
    """Writes CASE-NNNN.vtk per step + a .pvd ParaView collection."""

    def __init__(self, outdir: str, base: str):
        self.outdir = outdir
        self.base = base
        self.entries: list[tuple[float, str]] = []

    def write_step(self, geo, sim_u, sim_flag, t_days: float) -> str:
        from opm_autodiff_tpu.models.blackoil import FLAG_SG

        u = np.asarray(sim_u)
        flag = np.asarray(sim_flag)
        sg = np.where(flag == FLAG_SG, u[:, 2], 0.0)
        fields = {
            "pressure_bar": u[:, 0] / 1e5,
            "swat": u[:, 1],
            "sgas": sg,
            "soil": 1.0 - u[:, 1] - sg,
        }
        name = f"{self.base}-{len(self.entries):04d}.vtk"
        write_vtk_step(os.path.join(self.outdir, name), geo, fields)
        self.entries.append((t_days, name))
        return name

    def close(self) -> None:
        if not self.entries:
            return
        pvd = os.path.join(self.outdir, self.base + ".pvd")
        with open(pvd, "w") as f:
            f.write('<?xml version="1.0"?>\n'
                    '<VTKFile type="Collection" version="0.1">\n'
                    ' <Collection>\n')
            for t, name in self.entries:
                f.write(f'  <DataSet timestep="{t}" file="{name}"/>\n')
            f.write(' </Collection>\n</VTKFile>\n')
