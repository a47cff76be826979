"""Corner-point geometry tests: cartesian equivalence, dip, faults.

Reference analog: CpGrid/EclTransmissibility behavior on GRDECL input
(ecltransmissibility.cc); validated here against the cartesian path on
an equivalent COORD/ZCORN encoding (same approach as the reference's
equil_liveoil_grid.DATA corner-point twin of a cartesian deck).
"""

import os

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state


def _cp_header(nx, ny, nz):
    return f"""RUNSPEC
DIMENS
 {nx} {ny} {nz} /
OIL
WATER
GAS
METRIC
GRID
"""


def _coord_zcorn(nx, ny, nz, dx, dy, layer_tops, layer_bots,
                 dip_per_i=0.0, fault_after_i=None, fault_throw=0.0):
    """COORD/ZCORN text for a grid with optional dip and a vertical fault."""
    lines = ["COORD"]
    for j in range(ny + 1):
        for i in range(nx + 1):
            x, y = i * dx, j * dy
            lines.append(f" {x} {y} 0 {x} {y} 10000")
    lines.append("/")
    lines.append("ZCORN")

    def corner_z(k, top, i_cell, i_corner):
        z = (layer_tops if top else layer_bots)[k]
        z += dip_per_i * i_corner * dx
        # fault: the throw applies per *cell*, so the two cells sharing a
        # pillar disagree about z there (a stair-case fault)
        if fault_after_i is not None and i_cell > fault_after_i:
            z += fault_throw
        return z

    vals = []
    for k in range(nz):
        for top in (True, False):
            for j in range(ny):
                for jj in range(2):
                    for i in range(nx):
                        for ii in range(2):
                            vals.append(str(corner_z(k, top, i, i + ii)))
    # pack compactly
    for s in range(0, len(vals), 12):
        lines.append(" " + " ".join(vals[s:s + 12]))
    lines.append("/")
    return "\n".join(lines) + "\n"


def _props(nx, ny, nz, perm=100.0):
    n = nx * ny * nz
    return f"""PORO
 {n}*0.25 /
PERMX
 {n}*{perm} /
PERMY
 {n}*{perm} /
PERMZ
 {n}*{perm} /
"""


def _cart_twin(nx, ny, nz, dx, dy, dz0, tops):
    n = nx * ny * nz
    return f"""DX
 {n}*{dx} /
DY
 {n}*{dy} /
DZ
 {n}*{dz0} /
TOPS
 {nx*ny}*{tops} /
"""


def test_cartesian_equivalence(tmp_path):
    """Flat COORD/ZCORN grid == DX/DY/DZ/TOPS grid (volumes, depth, trans)."""
    nx, ny, nz = 4, 3, 2
    tops = [1000.0, 1010.0]
    bots = [1010.0, 1025.0]
    cp = (_cp_header(nx, ny, nz)
          + _coord_zcorn(nx, ny, nz, 100.0, 50.0, tops, bots)
          + _props(nx, ny, nz))
    p1 = tmp_path / "CP.DATA"
    p1.write_text(cp)
    geo_cp = build_geometry(load_state(str(p1)))

    cart = (_cp_header(nx, ny, nz)
            + f"""DX
 {nx*ny*nz}*100 /
DY
 {nx*ny*nz}*50 /
DZ
 {nx*ny}*10 {nx*ny}*15 /
TOPS
 {nx*ny}*1000 /
""" + _props(nx, ny, nz))
    p2 = tmp_path / "CART.DATA"
    p2.write_text(cart)
    geo_ca = build_geometry(load_state(str(p2)))

    assert geo_cp.num_active == geo_ca.num_active
    np.testing.assert_allclose(geo_cp.volume, geo_ca.volume, rtol=1e-10)
    np.testing.assert_allclose(geo_cp.depth, geo_ca.depth, rtol=1e-10)
    assert geo_cp.faces.num_faces == geo_ca.faces.num_faces
    # transmissibilities match the cartesian formula (sorted compare:
    # face ordering may differ between builders)
    for ax in (0, 1, 2):
        t_cp = np.sort(geo_cp.faces.trans[geo_cp.faces.axis == ax])
        t_ca = np.sort(geo_ca.faces.trans[geo_ca.faces.axis == ax])
        np.testing.assert_allclose(t_cp, t_ca, rtol=1e-9)


def test_dipping_grid(tmp_path):
    """Dip: depths increase along I; trans stays positive; volume exact."""
    nx, ny, nz = 5, 1, 1
    cp = (_cp_header(nx, ny, nz)
          + _coord_zcorn(nx, ny, nz, 100.0, 100.0, [1000.0], [1020.0],
                         dip_per_i=0.1)
          + _props(nx, ny, nz))
    p = tmp_path / "DIP.DATA"
    p.write_text(cp)
    geo = build_geometry(load_state(str(p)))
    assert geo.num_active == 5
    d = geo.depth
    assert np.all(np.diff(d) > 0)  # deepening along I
    np.testing.assert_allclose(np.diff(d), 10.0, rtol=1e-9)  # 0.1 * 100m
    np.testing.assert_allclose(geo.volume, 100 * 100 * 20, rtol=1e-9)
    assert np.all(geo.faces.trans > 0)


def test_fault_reduces_contact(tmp_path):
    """A vertical throw shrinks the shared face area -> lower trans."""
    nx, ny, nz = 2, 1, 1

    def make(throw):
        cp = (_cp_header(nx, ny, nz)
              + _coord_zcorn(nx, ny, nz, 100.0, 100.0, [1000.0], [1020.0],
                             fault_after_i=0, fault_throw=throw)
              + _props(nx, ny, nz))
        p = tmp_path / f"F{throw}.DATA"
        p.write_text(cp)
        return build_geometry(load_state(str(p)))

    geo0 = make(0.0)
    geo_half = make(10.0)   # half the 20 m column height
    geo_full = make(25.0)   # no overlap

    t0 = geo0.faces.trans
    th = geo_half.faces.trans
    assert len(t0) == 1 and len(th) == 1
    assert th[0] == pytest.approx(0.5 * t0[0], rel=0.05)
    assert geo_full.faces.num_faces == 0


def test_cornerpoint_end_to_end(tmp_path):
    """Full simulation on a corner-point twin of a cartesian deck matches
    the cartesian run (same physics through the face-list path)."""
    import sys
    sys.path.insert(0, os.path.dirname(__file__))

    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    base = spe1_deck_text(6, 4, 2, tstep_days="2 5 10 20")
    # split the deck at GRID and replace the cartesian geometry block
    head, rest = base.split("GRID\n", 1)
    _geom, tail = rest.split("PROPS\n", 1)
    n = 6 * 4 * 2
    # cartesian geometry block values (ft): dx=1666.7, dy=2500, dz=50
    dx = 10000.0 / 6
    dy = 10000.0 / 4
    tops = [8325.0, 8375.0]
    bots = [8375.0, 8425.0]
    coordzcorn = _coord_zcorn(6, 4, 2, dx, dy, tops, bots)
    perm = ("PORO\n {n}*0.3 /\nPERMX\n {h}*500 {h}*50 /\n"
            "PERMY\n {h}*500 {h}*50 /\nPERMZ\n {h}*50 {h}*50 /\n").format(
        n=n, h=6 * 4)
    cp_deck = head + "GRID\n" + coordzcorn + perm + "PROPS\n" + tail
    p1 = tmp_path / "CPE2E.DATA"
    p1.write_text(cp_deck)

    ca_geom = ("DX\n {n}*{dx} /\nDY\n {n}*{dy} /\nDZ\n {n}*50 /\n"
               "TOPS\n {h}*8325 /\n").format(n=n, dx=dx, dy=dy, h=24)
    ca_deck = head + "GRID\n" + ca_geom + perm + "PROPS\n" + tail
    p2 = tmp_path / "CAE2E.DATA"
    p2.write_text(ca_deck)

    sims = {}
    for name, path in [("cp", p1), ("ca", p2)]:
        sim = Simulator(load_state(str(path)),
                        # face-list path for both: apples to apples
                        None)
        from opm_autodiff_tpu.models.blackoil import statics_from_geometry
        sim.cells, sim.faces = statics_from_geometry(sim.geo,
                                                     structured="never")
        sim.run()
        sims[name] = sim

    p_cp = np.asarray(sims["cp"].u[:, 0])
    p_ca = np.asarray(sims["ca"].u[:, 0])
    np.testing.assert_allclose(p_cp, p_ca, rtol=1e-4)
    assert sims["cp"].summary.rows[-1]["FOPR"] == pytest.approx(
        sims["ca"].summary.rows[-1]["FOPR"], rel=1e-3)
