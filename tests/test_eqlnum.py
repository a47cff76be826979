"""EQLNUM multi-region equilibration (reference: per-region
PressureTable/PhaseSaturations, ebos/equil/initstateequil.hh; THPRES
pairs with the same regions)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

# two fault blocks (columns 1-5 | 6-10) with different datums/contacts
DECK = """RUNSPEC
DIMENS
 10 1 5 /
OIL
WATER
METRIC
EQLDIMS
 2 /
START
 1 'JAN' 2020 /
GRID
DX
 50*20 /
DY
 50*20 /
DZ
 50*4 /
TOPS
 10*1000 /
PORO
 50*0.25 /
PERMX
 50*300 /
REGIONS
EQLNUM
 5*1 5*2
 5*1 5*2
 5*1 5*2
 5*1 5*2
 5*1 5*2 /
PROPS
PVTW
 120 1.02 4.0E-5 0.5 0 /
PVDO
 50  1.06 2.0
 400 1.02 2.0 /
ROCK
 120 4E-5 /
SWOF
 0.15 0.00  0.90 0.10
 0.50 0.20  0.30 0.04
 0.85 0.60  0.0  0.01
 1.00 1.00  0.0  0.0 /
DENSITY
 850 1000 1 /
SOLUTION
EQUIL
-- region 1: WOC at 1010 m (mid-column)
 1010 120 1010 0 900 0 /
-- region 2: WOC at 1018 m (deeper) and higher datum pressure
 1010 135 1018 0 900 0 /
SUMMARY
FOPR
SCHEDULE
TSTEP
 1 /
END
"""


def test_two_equil_regions(tmp_path):
    p = tmp_path / "EQL.DATA"
    p.write_text(DECK)
    state = load_state(str(p))
    assert len(state.solution.equil_regions) == 2
    sim = Simulator(state, SimulatorOptions())
    u = np.asarray(sim.u).reshape(5, 10, 3)  # [k, i, :]
    depth_mid = 1000 + np.arange(5) * 4 + 2  # layer centers

    # block 1 (i<5): water below 1010 -> layers k>=3 water-filled
    sw1 = u[:, 0, 1]
    # block 2 (i>=5): WOC at 1018 -> only the deepest layer wet
    sw2 = u[:, 9, 1]
    assert sw1[4] > 0.9        # 1018m center: below WOC1
    assert sw1[0] < 0.4        # top: oil zone
    assert sw2[4] < sw1[4] + 1e-9
    # the deeper WOC in block 2 leaves layer k=3 (center 1014) oily there
    assert sw1[3] > sw2[3] + 0.2
    # different datum pressures per block
    p1 = u[0, 0, 0]
    p2 = u[0, 9, 0]
    assert p2 - p1 > 10e5  # ~15 bar heavier in block 2


def test_pbvd_caps_initial_rs(tmp_path):
    """PBVD: the initial Rs follows RsSat(Pb(depth)) (reference:
    equil_pbvd_and_pdvd.DATA family)."""
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    import os

    base = os.path.join(str(tmp_path), "PB0.DATA")
    write_spe1_deck(base, 4, 4, 3)
    st0 = load_state(base)
    sim0 = Simulator(st0, SimulatorOptions())

    path = os.path.join(str(tmp_path), "PB.DATA")
    write_spe1_deck(path, 4, 4, 3)
    # replace the RSVD table with a PBVD at a LOW bubble point
    # (2000 psia << initial ~4800): Rs must drop accordingly
    txt = open(path).read().replace(
        "RSVD\n 8200 1.270\n 8500 1.270 /",
        "PBVD\n 8200 2000\n 8500 2000 /")
    open(path, "w").write(txt)
    sim = Simulator(load_state(path), SimulatorOptions())

    from opm_autodiff_tpu.models.blackoil import FLAG_RS
    flag = np.asarray(sim.flag)
    rs = np.asarray(sim.u)[:, 2]
    rs0 = np.asarray(sim0.u)[:, 2]
    assert (flag == FLAG_RS).all()  # undersaturated everywhere
    # capped well below the RSVD-based initial Rs
    assert rs.max() < 0.8 * rs0.max()
    # and equal to RsSat at the 2000-psia bubble point
    from opm_autodiff_tpu import units as U
    expect = float(sim.fs.rs_sat(2000 * U.PSI))
    np.testing.assert_allclose(rs, expect, rtol=1e-6)
