"""ECL binary output: ctypes bindings + high-level file writers.

The record packing/unpacking core is native C++ (native/eclio.cpp, built
on demand with g++ — the environment has no pybind11, so the binding is a
minimal C ABI via ctypes). This module adds the file-level semantics the
reference gets from opm-common's EclipseIO (consumed via
ebos/eclwriter.hh:222 writeOutput): SMSPEC/UNSMRY summary files, EGRID
geometry, INIT static arrays, and UNRST recurrent (restart) arrays.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

import numpy as np

_LIB = None

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_SRC_DIR, "libeclio.so")
    src = os.path.join(_SRC_DIR, "eclio.cpp")
    if (not os.path.exists(so)
            or os.path.getmtime(so) < os.path.getmtime(src)):
        subprocess.run(["g++", "-O2", "-Wall", "-fPIC", "-shared",
                        "-o", so, src], check=True)
    lib = ctypes.CDLL(so)
    lib.eclio_open.restype = ctypes.c_void_p
    lib.eclio_open.argtypes = [ctypes.c_char_p]
    lib.eclio_close.argtypes = [ctypes.c_void_p]
    lib.eclio_write_kw.restype = ctypes.c_int
    lib.eclio_write_kw.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                   ctypes.c_char_p, ctypes.c_int,
                                   ctypes.c_void_p]
    lib.eclio_open_read.restype = ctypes.c_void_p
    lib.eclio_open_read.argtypes = [ctypes.c_char_p]
    lib.eclio_close_read.argtypes = [ctypes.c_void_p]
    lib.eclio_next_kw.restype = ctypes.c_int
    lib.eclio_next_kw.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                  ctypes.c_char_p,
                                  ctypes.POINTER(ctypes.c_int)]
    lib.eclio_read_data.restype = ctypes.c_int
    lib.eclio_read_data.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                    ctypes.c_int, ctypes.c_void_p]
    _LIB = lib
    return lib


_DTYPES = {
    "INTE": np.dtype("=i4"),
    "REAL": np.dtype("=f4"),
    "DOUB": np.dtype("=f8"),
    "LOGI": np.dtype("=i4"),
}


class EclFileWriter:
    """Keyword-block writer over the native core."""

    def __init__(self, path: str):
        self._lib = _load_lib()
        self._h = self._lib.eclio_open(path.encode())
        if not self._h:
            raise IOError(f"cannot open {path}")

    def write(self, name: str, data, kind: str | None = None):
        lib = self._lib
        if kind == "MESS":
            lib.eclio_write_kw(self._h, name.encode(), b"MESS", 0, None)
            return
        if kind == "CHAR" or (kind is None
                              and isinstance(data, (list, tuple))
                              and data and isinstance(data[0], str)):
            buf = b"".join(s[:8].ljust(8).encode() for s in data)
            lib.eclio_write_kw(self._h, name.encode(), b"CHAR",
                               len(data), buf)
            return
        arr = np.asarray(data)
        if kind is None:
            if arr.dtype.kind in "iu":
                kind = "INTE"
            elif arr.dtype == np.float64:
                kind = "DOUB"
            elif arr.dtype == np.bool_:
                kind = "LOGI"
            else:
                kind = "REAL"
        arr = np.ascontiguousarray(arr.reshape(-1).astype(_DTYPES[kind]))
        rc = lib.eclio_write_kw(self._h, name.encode(), kind.encode(),
                                arr.size,
                                arr.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            raise IOError(f"write failed for {name}")

    def close(self):
        if self._h:
            self._lib.eclio_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


def read_ecl_file(path: str) -> list:
    """Read all keyword blocks: [(name, type, np.ndarray | list[str])]."""
    lib = _load_lib()
    h = lib.eclio_open_read(path.encode())
    if not h:
        raise IOError(f"cannot open {path}")
    out = []
    try:
        name = ctypes.create_string_buffer(9)
        typ = ctypes.create_string_buffer(5)
        count = ctypes.c_int()
        while True:
            rc = lib.eclio_next_kw(h, name, typ, ctypes.byref(count))
            if rc == 0:
                break
            if rc < 0:
                raise IOError(f"corrupt record in {path}")
            t = typ.value.decode()
            n = count.value
            if t == "MESS" or n == 0:
                out.append((name.value.decode().strip(), t, np.empty(0)))
                continue
            if t.startswith("C") and t not in _DTYPES:
                buf = ctypes.create_string_buffer(8 * n)
                lib.eclio_read_data(h, typ, n, buf)
                vals = [buf.raw[8 * i:8 * i + 8].decode().rstrip()
                        for i in range(n)]
                out.append((name.value.decode().strip(), t, vals))
            else:
                arr = np.empty(n, _DTYPES[t])
                lib.eclio_read_data(h, typ, n,
                                    arr.ctypes.data_as(ctypes.c_void_p))
                out.append((name.value.decode().strip(), t, arr))
    finally:
        lib.eclio_close_read(h)
    return out


# ---------------------------------------------------------------------------
# High-level ECL output files
# ---------------------------------------------------------------------------

_UNIT_CODE = {"METRIC": 1, "FIELD": 2, "LAB": 3, "SI": 4}

# summary units per mnemonic root, FIELD/METRIC
_SMRY_UNITS = {
    "FIELD": {"OPR": "STB/DAY", "WPR": "STB/DAY", "GPR": "MSCF/DAY",
              "OPT": "STB", "WPT": "STB", "GPT": "MSCF", "GIR": "MSCF/DAY",
              "WIR": "STB/DAY", "GIT": "MSCF", "WIT": "STB",
              "BHP": "PSIA", "THP": "PSIA", "PR": "PSIA",
              "GOR": "MSCF/STB", "TIME": "DAYS"},
    "METRIC": {"OPR": "SM3/DAY", "WPR": "SM3/DAY", "GPR": "SM3/DAY",
               "OPT": "SM3", "WPT": "SM3", "GPT": "SM3", "GIR": "SM3/DAY",
               "WIR": "SM3/DAY", "GIT": "SM3", "WIT": "SM3",
               "BHP": "BARSA", "THP": "BARSA", "PR": "BARSA",
               "GOR": "SM3/SM3", "TIME": "DAYS"},
}


def write_summary_files(base_path: str, rows: list, cartdims, start_date,
                        unit_name: str = "FIELD"):
    """SMSPEC + unified UNSMRY from summary rows (deck units already)."""
    cols = []
    for r in rows:
        for k in r:
            if k not in cols:
                cols.append(k)
    units_map = _SMRY_UNITS.get(unit_name, _SMRY_UNITS["FIELD"])

    keywords, wgnames, nums, units = [], [], [], []
    for c in cols:
        mnem, _, wname = c.partition(":")
        keywords.append(mnem)
        wgnames.append(wname if wname else ":+:+:+:+")
        nums.append(0)
        root = mnem[1:] if len(mnem) > 1 else mnem
        units.append(units_map.get(root, units_map.get(mnem, "")))

    nlist = len(cols)
    with EclFileWriter(base_path + ".SMSPEC") as w:
        w.write("INTEHEAD", np.asarray([_UNIT_CODE.get(unit_name, 2), 100],
                                       np.int32))
        w.write("RESTART ", [""] * 9, kind="CHAR")
        w.write("DIMENS  ", np.asarray(
            [nlist, cartdims[0], cartdims[1], cartdims[2], 0, -1], np.int32))
        w.write("KEYWORDS", keywords, kind="CHAR")
        w.write("WGNAMES ", wgnames, kind="CHAR")
        w.write("NUMS    ", np.asarray(nums, np.int32))
        w.write("UNITS   ", units, kind="CHAR")
        w.write("STARTDAT", np.asarray(
            [start_date.day, start_date.month, start_date.year, 0, 0, 0],
            np.int32))

    with EclFileWriter(base_path + ".UNSMRY") as w:
        for i, r in enumerate(rows):
            w.write("SEQHDR  ", np.asarray([0], np.int32))
            w.write("MINISTEP", np.asarray([i], np.int32))
            params = np.asarray([r.get(c, 0.0) for c in cols], np.float32)
            w.write("PARAMS  ", params)


def write_egrid(path: str, geo, unit_name: str = "FIELD"):
    """EGRID from the (cartesian) geometry: synthesized COORD/ZCORN."""
    from opm_autodiff_tpu import units as U

    nx, ny, nz = geo.cartdims
    usys = U.BY_NAME.get(unit_name, U.FIELD)
    to_len = 1.0 / usys.length

    # reconstruct column geometry from dx/dy/dz/tops on the global grid
    n = nx * ny * nz
    dx = np.zeros(n)
    dy = np.zeros(n)
    dz = np.zeros(n)
    depth = np.zeros(n)
    act = np.asarray(geo.glob_to_act)
    has = act >= 0
    dx[has] = np.asarray(geo.dx)[act[has]]
    dy[has] = np.asarray(geo.dy)[act[has]]
    dz[has] = np.asarray(geo.dz)[act[has]]
    depth[has] = np.asarray(geo.depth)[act[has]]
    # fall back for inactive cells: copy from column neighbor
    dx3 = dx.reshape(nz, ny, nx)
    dy3 = dy.reshape(nz, ny, nx)
    dz3 = dz.reshape(nz, ny, nx)
    dep3 = depth.reshape(nz, ny, nx)

    # pillar coordinates (x along i, y along j from cumulated dx/dy, row 0)
    xs = np.zeros(nx + 1)
    xs[1:] = np.cumsum(dx3[0, 0, :])
    ys = np.zeros(ny + 1)
    ys[1:] = np.cumsum(dy3[0, :, 0])
    top0 = (dep3[0] - dz3[0] / 2).min() if has.any() else 0.0
    bot0 = (dep3[-1] + dz3[-1] / 2).max() if has.any() else 1.0

    coord = np.zeros(((nx + 1) * (ny + 1), 6), np.float32)
    k = 0
    for j in range(ny + 1):
        for i in range(nx + 1):
            coord[k] = [xs[i] * to_len, ys[j] * to_len, top0 * to_len,
                        xs[i] * to_len, ys[j] * to_len, bot0 * to_len]
            k += 1

    zcorn = np.zeros((nz, 2, ny, 2, nx, 2), np.float32)
    ztop = dep3 - dz3 / 2
    zbot = dep3 + dz3 / 2
    for kk in range(nz):
        zcorn[kk, 0] = ztop[kk][:, None, :, None] * to_len
        zcorn[kk, 1] = zbot[kk][:, None, :, None] * to_len

    actnum = np.where(act >= 0, 1, 0).astype(np.int32)

    with EclFileWriter(path) as w:
        filehead = np.zeros(100, np.int32)
        filehead[0] = 3  # version
        filehead[1] = 2007
        filehead[4] = 0  # corner-point
        w.write("FILEHEAD", filehead)
        gridhead = np.zeros(100, np.int32)
        gridhead[0] = 1
        gridhead[1:4] = [nx, ny, nz]
        w.write("GRIDHEAD", gridhead)
        w.write("COORD   ", coord.reshape(-1))
        w.write("ZCORN   ", zcorn.reshape(-1))
        w.write("ACTNUM  ", actnum)
        w.write("ENDGRID ", np.empty(0, np.int32))


def write_init(path: str, geo, state, unit_name: str = "FIELD"):
    """INIT file: INTEHEAD + PORV (global) + static active-cell arrays."""
    from opm_autodiff_tpu import units as U

    usys = U.BY_NAME.get(unit_name, U.FIELD)
    nx, ny, nz = geo.cartdims
    n = nx * ny * nz
    act = np.asarray(geo.glob_to_act)
    has = act >= 0

    porv = np.zeros(n)
    porv[has] = np.asarray(geo.pore_vol)[act[has]]

    with EclFileWriter(path) as w:
        ih = np.zeros(95, np.int32)
        ih[2] = _UNIT_CODE.get(unit_name, 2)
        ih[8:12] = [nx, ny, nz, int(has.sum())]
        ih[14] = 7  # phases: oil+water+gas
        w.write("INTEHEAD", ih)
        w.write("PORV    ", (porv / usys.reservoir_volume).astype(np.float32))
        for name, arr, scale in [
            ("PORO    ", geo.poro, 1.0),
            ("NTG     ", geo.ntg, 1.0),
            ("PERMX   ", geo.permx, usys.permeability),
            ("PERMY   ", geo.permy, usys.permeability),
            ("PERMZ   ", geo.permz, usys.permeability),
            ("DEPTH   ", geo.depth, usys.length),
            ("DX      ", geo.dx, usys.length),
            ("DY      ", geo.dy, usys.length),
            ("DZ      ", geo.dz, usys.length),
        ]:
            w.write(name, (np.asarray(arr) / scale).astype(np.float32))
        # transmissibilities on active cells (TRANX/Y/Z as the reference
        # exports them, eclgenericwriter.cc:216-230): value stored on the
        # lower-index cell of each face
        f = geo.faces
        for axis, name in [(0, "TRANX   "), (1, "TRANY   "),
                           (2, "TRANZ   ")]:
            arr = np.zeros(geo.num_active)
            sel = np.asarray(f.axis) == axis
            arr[np.asarray(f.left)[sel]] = np.asarray(f.trans)[sel]
            w.write(name, (arr / usys.transmissibility).astype(np.float32))


def write_unrst_arrays(writer: EclFileWriter, seqnum: int, u: np.ndarray,
                       flag: np.ndarray, cartdims, num_active: int,
                       unit_name: str = "FIELD",
                       next_dt_days: float | None = None):
    """Append one report step's solution (host-snapshotted arrays) to a
    unified restart file. Array-based so the async output thread can
    run it after the simulator state has moved on (reference:
    TaskletRunner, eclgenericwriter.hh:121)."""
    from opm_autodiff_tpu import units as U

    usys = U.BY_NAME.get(unit_name, U.FIELD)
    nx, ny, nz = cartdims
    writer.write("SEQNUM  ", np.asarray([seqnum], np.int32))
    ih = np.zeros(95, np.int32)
    ih[2] = _UNIT_CODE.get(unit_name, 2)
    ih[8:12] = [nx, ny, nz, num_active]
    ih[14] = 7
    writer.write("INTEHEAD", ih)
    sg = np.where(flag == 0, u[:, 2],
                  np.where(flag == 2, 1.0 - u[:, 1], 0.0))
    rs = np.where(flag == 1, u[:, 2], 0.0)
    writer.write("PRESSURE", (u[:, 0] / usys.pressure).astype(np.float32))
    writer.write("SWAT    ", u[:, 1].astype(np.float32))
    writer.write("SGAS    ", sg.astype(np.float32))
    writer.write("RS      ", (rs / usys.gas_oil_ratio).astype(np.float32))
    # VAPOIL: condensate cells carry Rv as the primary variable
    if (flag == 2).any():
        rv = np.where(flag == 2, u[:, 2], 0.0)
        writer.write("RV      ",
                     (rv * usys.gas_oil_ratio).astype(np.float32))
    # implicit polymer: the concentration column (ECLIPSE's POLYMER
    # restart array; kg/m3 stays SI-scaled by the deck's own units)
    if u.shape[1] > 3:
        writer.write("POLYMER ", u[:, 3].astype(np.float32))
    if next_dt_days is not None:
        # reference OPMEXTRA: the adaptive stepper's next suggested dt
        # rides the restart file so a resumed run continues with the
        # same step size (SimulatorFullyImplicitBlackoilEbos.hpp:180)
        writer.write("OPMEXTRA", np.asarray([next_dt_days], np.float64))


def write_unrst_step(writer: EclFileWriter, seqnum: int, sim,
                     unit_name: str = "FIELD"):
    """Append one report step's solution to a unified restart file."""
    write_unrst_arrays(writer, seqnum, np.asarray(sim.u),
                       np.asarray(sim.flag), sim.geo.cartdims,
                       sim.geo.num_active, unit_name,
                       next_dt_days=getattr(sim, "_suggested_dt", None))


def write_rft_step(writer: EclFileWriter, sim, time_days: float,
                   unit_name: str, well_names: list[str] | None = None):
    """Append one RFT report for the requested wells (reference: WRFTPLT
    -> EclipseIO RFT stream; per-connection depth/pressure/saturations).
    """
    import numpy as np

    from opm_autodiff_tpu import units as U

    u = U.BY_NAME[unit_name]
    step = sim.state.schedule.steps[min(sim._step_index,
                                        len(sim.state.schedule.steps) - 1)]
    uu = np.asarray(sim.u)
    flag = np.asarray(sim.flag)
    sg_all = np.where(flag == 0, uu[:, 2], 0.0)
    for w in step.wells:
        if well_names is not None and w.name not in well_names:
            continue
        if not getattr(w, "rft", False):
            continue
        cells = [sim.geo.act_index(c.i, c.j, c.k)
                 for c in w.completions if c.open]
        cells = [c for c in cells if c >= 0]
        if not cells:
            continue
        writer.write("TIME", np.asarray([time_days], np.float32))
        writer.write("WELLETC", [f"{w.name:8s}", "RFT"], kind="CHAR")
        depth = np.asarray([sim.geo.depth[c] for c in cells], np.float32)
        pres = np.asarray([uu[c, 0] for c in cells], np.float32)
        swat = np.asarray([uu[c, 1] for c in cells], np.float32)
        sgas = np.asarray([sg_all[c] for c in cells], np.float32)
        writer.write("DEPTH", depth / u.length)
        writer.write("PRESSURE", pres / u.pressure)
        writer.write("SWAT", swat)
        writer.write("SGAS", sgas)
