"""Geometry + transmissibility vs hand calculations on SPE1.

Mirrors the reference's transmissibility checks (SURVEY.md §7 stage 2:
"Test: trans values vs hand calculations + INIT-file TRANX/Y/Z on SPE1").
"""

import pytest as _pytest

pytestmark = _pytest.mark.smoke


import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.grid.geometry import peaceman_well_index
from opm_autodiff_tpu.io.state import load_state


@pytest.fixture(scope="module")
def geo(spe1_deck_path):
    return build_geometry(load_state(spe1_deck_path))


def test_active_mapping(geo):
    assert geo.num_active == 300
    assert geo.act_index(0, 0, 0) == 0
    assert geo.act_index(9, 9, 2) == 299
    assert geo.ijk(299) == (9, 9, 2)


def test_volumes(geo):
    # layer 1 cell: 1000x1000x20 ft^3
    v = 1000 * 1000 * 20 * U.FOOT**3
    assert geo.volume[0] == pytest.approx(v)
    assert geo.pore_vol[0] == pytest.approx(0.3 * v)
    # total PV: sum over layers 20+30+50 = 100ft column height
    pv_tot = 0.3 * 1000 * 1000 * 100 * U.FOOT**3 * 100
    assert geo.pore_vol.sum() == pytest.approx(pv_tot)


def test_face_count(geo):
    # 10x10x3 all active: X faces 9*10*3, Y faces 10*9*3, Z faces 10*10*2
    f = geo.faces
    assert (f.axis == 0).sum() == 270
    assert (f.axis == 1).sum() == 270
    assert (f.axis == 2).sum() == 200
    assert f.num_faces == 740


def test_trans_hand_calc(geo):
    f = geo.faces
    # X-face in layer 1: k=500mD, A=dy*dz=1000*20 ft^2, d=dx/2=500 ft
    k = 500 * U.MILLIDARCY
    a = 1000 * 20 * U.FOOT**2
    d = 500 * U.FOOT
    half = k * a / d
    expect = half / 2  # harmonic mean of equal halves
    # face between act cells 0 and 1 (i=0->1, j=0, k=0)
    ix = np.nonzero((f.left == 0) & (f.right == 1))[0]
    assert len(ix) == 1
    assert f.trans[ix[0]] == pytest.approx(expect)
    # Z-face between layer1 (kz=50) and layer2 (kz=50): A=1000*1000 ft^2
    az = 1000 * 1000 * U.FOOT**2
    h1 = 50 * U.MILLIDARCY * az / (10 * U.FOOT)   # dz/2 = 10 ft
    h2 = 50 * U.MILLIDARCY * az / (15 * U.FOOT)   # dz/2 = 15 ft
    expect_z = 1 / (1 / h1 + 1 / h2)
    c_top = geo.act_index(0, 0, 0)
    c_bot = geo.act_index(0, 0, 1)
    ix = np.nonzero((f.left == c_top) & (f.right == c_bot))[0]
    assert len(ix) == 1
    assert f.trans[ix[0]] == pytest.approx(expect_z)


def test_inactive_cells_drop_faces(spe1_deck_path, tmp_path):
    # deactivate a column; faces touching it must vanish
    text = open(spe1_deck_path).read()
    actnum = ["1"] * 300
    # deactivate cell (5,5,1..3) natural idx 5 + 10*5 + 100*k
    for k in range(3):
        actnum[5 + 50 + 100 * k] = "0"
    text = text.replace("PROPS", "ACTNUM\n " + " ".join(actnum) + " /\n\nPROPS", 1)
    p = tmp_path / "T.DATA"
    p.write_text(text)
    geo = build_geometry(load_state(str(p)))
    assert geo.num_active == 297
    # each of the 3 cells had 4 lateral faces (12) + 2 internal Z faces
    assert geo.faces.num_faces == 740 - 14


def test_peaceman_wi(geo):
    # PROD at (10,10,3): k=200mD iso, dx=dy=1000ft, dz=50ft, rw=0.25ft
    c = geo.act_index(9, 9, 2)
    wi = peaceman_well_index(geo, c, diameter=0.5 * U.FOOT, skin=0.0)
    r0 = 0.28 * np.sqrt(2 * (1000 * U.FOOT) ** 2) / 2
    expect = (2 * np.pi * 200 * U.MILLIDARCY * 50 * U.FOOT
              / np.log(r0 / (0.25 * U.FOOT)))
    assert wi == pytest.approx(expect)
    # sanity in FIELD units: CF in cp*rb/day/psi
    # 0.00708*k[mD]*h[ft]/ln(r0/rw) = 0.00708*200*50/ln(198/0.25) ~ 10.6
    cf_field = wi / U.FIELD.well_index
    assert cf_field == pytest.approx(10.61, rel=1e-2)


def test_minpv_deactivates_cells(tmp_path, spe1_deck_path):
    """MINPV removes cells whose pore volume falls below the threshold
    (reference: MINPV handling in the vanguards)."""
    import numpy as np

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state

    text = open(spe1_deck_path).read()
    # SPE1 layer 1: 25ft thick, poro 0.3, 20 acres/cell -> PV per cell
    # huge; a threshold above layer-1 cell PV but below layers 2/3
    # (thicker) knocks out exactly layer 1
    geo0 = build_geometry(load_state(spe1_deck_path))
    pv = np.asarray(geo0.pore_vol)
    thr_si = (pv.reshape(3, 10, 10)[0].max()
              + 1.0)  # just above all layer-1 cells
    from opm_autodiff_tpu import units as U
    thr = thr_si / U.FIELD.reservoir_volume
    text = text.replace("PROPS", f"MINPV\n {thr} /\n\nPROPS", 1)
    p = tmp_path / "MPV.DATA"
    p.write_text(text)
    geo = build_geometry(load_state(str(p)))
    dropped = geo0.num_active - geo.num_active
    assert dropped == int((pv < thr_si).sum())
    assert dropped >= 100  # at least the thinnest layer


def test_mult_minus_keywords(tmp_path):
    """MULTX-: the cell's negative-side face is scaled (reference
    multiplier semantics, ecltransmissibility.cc)."""
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    import os

    base = os.path.join(str(tmp_path), "MM0.DATA")
    write_spe1_deck(base, 6, 1, 1)
    geo0 = build_geometry(load_state(base))

    path = os.path.join(str(tmp_path), "MM.DATA")
    write_spe1_deck(path, 6, 1, 1)
    txt = open(path).read().replace(
        "PROPS", "MULTX-\n 1 1 1 0.5 1 1 /\n\nPROPS", 1)
    open(path, "w").write(txt)
    geo = build_geometry(load_state(path))

    f0, f = geo0.faces, geo.faces
    # face between cells (i=2) and (i=3): scaled by cell 3's MULTX-
    i0 = np.nonzero((f0.left == 2) & (f0.right == 3))[0][0]
    i1 = np.nonzero((f.left == 2) & (f.right == 3))[0][0]
    assert f.trans[i1] == pytest.approx(0.5 * f0.trans[i0])
    # other faces untouched
    j0 = np.nonzero((f0.left == 0) & (f0.right == 1))[0][0]
    j1 = np.nonzero((f.left == 0) & (f.right == 1))[0][0]
    assert f.trans[j1] == pytest.approx(f0.trans[j0])


def test_faults_multflt(tmp_path):
    """FAULTS + MULTFLT: the named fault's faces are scaled
    (reference: FaultCollection multipliers in EclTransmissibility)."""
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    import os

    base = os.path.join(str(tmp_path), "FL0.DATA")
    write_spe1_deck(base, 6, 4, 1)
    geo0 = build_geometry(load_state(base))

    path = os.path.join(str(tmp_path), "FL.DATA")
    write_spe1_deck(path, 6, 4, 1)
    txt = open(path).read().replace(
        "PROPS",
        "FAULTS\n 'FLT1' 3 3 1 4 1 1 'X' /\n/\n"
        "MULTFLT\n 'FLT1' 0.01 /\n/\n\nPROPS", 1)
    open(path, "w").write(txt)
    geo = build_geometry(load_state(path))

    f0, f = geo0.faces, geo.faces
    # the i=3 'X' faces (cells (3,j) | (4,j), 1-based) are scaled for
    # all j in 1..4
    for j in range(4):
        a = geo.act_index(2, j, 0)
        b = geo.act_index(3, j, 0)
        i0 = np.nonzero((f0.left == a) & (f0.right == b))[0][0]
        i1 = np.nonzero((f.left == a) & (f.right == b))[0][0]
        assert f.trans[i1] == pytest.approx(0.01 * f0.trans[i0])
    # neighbor faces untouched
    a = geo.act_index(0, 0, 0)
    b = geo.act_index(1, 0, 0)
    i0 = np.nonzero((f0.left == a) & (f0.right == b))[0][0]
    i1 = np.nonzero((f.left == a) & (f.right == b))[0][0]
    assert f.trans[i1] == pytest.approx(f0.trans[i0])


def test_pinch_connects_across_inactive_layer(tmp_path):
    """PINCH: a zero-porosity middle layer still lets the column flow
    (reference: PINCH in the vanguard transmissibility setup)."""
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    import os

    path = os.path.join(str(tmp_path), "PN.DATA")
    write_spe1_deck(path, 2, 1, 3)
    txt = open(path).read()
    # deactivate the middle layer via ACTNUM; PINCH bridges it
    txt = txt.replace("PROPS",
                      "ACTNUM\n 1 1 0 0 1 1 /\nPINCH\n/\n\nPROPS", 1)
    open(path, "w").write(txt)
    geo = build_geometry(load_state(path))
    assert geo.num_active == 4
    a = geo.act_index(0, 0, 0)
    b = geo.act_index(0, 0, 2)
    f = geo.faces
    sel = ((f.left == a) & (f.right == b)) | ((f.left == b) & (f.right == a))
    assert sel.sum() == 1
    assert f.trans[sel][0] > 0
    # without PINCH there is no such connection
    txt2 = txt.replace("PINCH\n/\n", "")
    p2 = os.path.join(str(tmp_path), "PN2.DATA")
    open(p2, "w").write(txt2)
    geo2 = build_geometry(load_state(p2))
    f2 = geo2.faces
    sel2 = (((f2.left == a) & (f2.right == b))
            | ((f2.left == b) & (f2.right == a)))
    assert sel2.sum() == 0
