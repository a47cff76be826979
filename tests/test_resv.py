"""RESV (reservoir-voidage rate) well controls — the reference's
RateConverter path (opm/simulators/wells/RateConverter.hpp:406)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

RESV_DECK = """RUNSPEC
DIMENS
 10 1 1 /
OIL
WATER
FIELD
START
 1 'JAN' 2020 /
GRID
DX
 10*50 /
DY
 10*50 /
DZ
 10*20 /
TOPS
 10*4000 /
PORO
 10*0.25 /
PERMX
 10*300 /
PROPS
PVTW
 4000 1.01 3.0E-6 0.4 0 /
PVDO
 400  1.06 2.0
 8000 1.02 2.0 /
ROCK
 4000 4E-6 /
SWOF
 0.20 0.00  0.95 0
 0.50 0.20  0.30 0
 0.80 0.60  0.0  0
 1.00 1.00  0.0  0 /
DENSITY
 52 64 0.06 /
SOLUTION
PRESSURE
 10*4000 /
SWAT
 10*0.20 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'I1' 'G' 1  1 4010 'WATER' /
 'P1' 'G' 10 1 4010 'OIL' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.5 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 400 1* 8000 /
/
WCONPROD
-- RESV control: 400 rb/day voidage target
 'P1' 'OPEN' 'RESV' 4* 400 2000 /
/
TSTEP
 1 2 5 10 /
END
"""


def test_resv_producer_hits_voidage_target(tmp_path):
    p = tmp_path / "RESV.DATA"
    p.write_text(RESV_DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    q = sim._last_q  # [W,3] into cells (negative = production)
    prod = np.maximum(-q, 0.0)
    # recompute the lagged coefficients the well model was given
    ws = None
    # The control equation enforced dot(coeff, prod) == resv. Verify the
    # produced reservoir-volume rate against the deck target using the
    # same average-PVT conversion.
    from opm_autodiff_tpu.models.blackoil import FLAG_SG
    from opm_autodiff_tpu.wells.rate_converter import (
        region_averages, voidage_coefficients)

    u = np.asarray(sim.u)
    flag = np.asarray(sim.flag)
    sg = np.where(flag == FLAG_SG, u[:, 2], 0.0)
    so = 1.0 - u[:, 1] - sg
    rs = np.zeros_like(so)  # dead oil
    p_avg, rs_avg = region_averages(
        u, flag, np.asarray(sim.geo.pore_vol), so, sg,
        np.zeros(len(u), np.int32), 1, rs)
    coeff = voidage_coefficients(sim.fs, p_avg, rs_avg)[0]
    resv_rate = float(np.dot(coeff, prod[1]))  # P1 is well index 1
    target = 400 * U.STB / U.DAY
    assert resv_rate == pytest.approx(target, rel=2e-2)
    # surface oil rate must be BELOW the reservoir-volume number (Bo > 1)
    assert prod[1].sum() < resv_rate


def test_resv_mode_parsed(tmp_path):
    p = tmp_path / "RESV.DATA"
    p.write_text(RESV_DECK)
    state = load_state(str(p))
    w = [w for w in state.schedule.steps[0].wells if w.name == "P1"][0]
    assert w.control_mode == "RESV"
    assert w.resv_rate == pytest.approx(400 * U.STB / U.DAY)
