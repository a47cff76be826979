"""VAPOIL / wet gas (PVTG) tests: the condensate primary-variable state
(reference: opm-models BlackOilPrimaryVariables' Rv meaning + PVTG via
opm-material WetGasPvt; flow dispatches VAPOIL decks through the same
blackoil variant, Main.hpp:326)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.blackoil import FLAG_RV, FLAG_SG
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

# gas-condensate strip: water + wet gas, no initial oil; producing below
# the dew point drops liquid out (retrograde condensation)
DECK = """RUNSPEC
DIMENS
 10 1 1 /
OIL
WATER
GAS
DISGAS
VAPOIL
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 10*30 /
DY
 10*30 /
DZ
 10*10 /
TOPS
 10*2500 /
PORO
 10*0.20 /
PERMX
 10*200 /
PROPS
PVTW
 250 1.02 4.0E-5 0.4 0 /
PVTO
 10  50 1.15 1.0
    300 1.10 1.1 /
 80 250 1.35 0.6
    400 1.30 0.7 /
/
PVTG
-- p(bar)  rv      bg      mu
 50   0.00002 0.025  0.014
      0.0     0.024  0.013 /
 150  0.00008 0.0075 0.016
      0.0     0.0073 0.015 /
 250  0.00020 0.0045 0.020
      0.00010 0.0044 0.019
      0.0     0.0043 0.018 /
/
ROCK
 250 4E-5 /
SWOF
 0.20 0.00  0.90 0
 0.60 0.30  0.20 0
 1.00 1.00  0.0  0 /
SGOF
 0.00 0.00 0.90 0
 0.40 0.30 0.30 0
 0.80 0.85 0.0  0 /
DENSITY
 700 1000 0.9 /
SOLUTION
PRESSURE
 10*250 /
SWAT
 10*0.20 /
SGAS
 10*0.80 /
RS
 10*0 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'P1' 'G' 10 1 2505 'GAS' /
/
COMPDAT
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.3 /
/
WCONPROD
 'P1' 'OPEN' 'GRAT' 2* 40000 3* 60 /
/
TSTEP
 2 5 10 20 /
END
"""


def test_wet_gas_pvt(tmp_path):
    p = tmp_path / "V.DATA"
    p.write_text(DECK)
    state = load_state(str(p))
    assert state.runspec.vapoil
    fs = FluidSystem.from_state(state)
    assert fs.wet_gas
    # saturated Rv rises with pressure
    rv150 = float(fs.rv_sat(150 * U.BAR))
    rv250 = float(fs.rv_sat(250 * U.BAR))
    assert rv250 > rv150 > 0
    assert rv250 == pytest.approx(0.00020, rel=1e-6)
    # Bg from the saturated curve
    bg = 1.0 / float(fs.gas_inv_b(250 * U.BAR, rv250))
    assert bg == pytest.approx(0.0045, rel=1e-6)
    # undersaturated gas (rv < rv_sat) has a different Bg
    bg_u = 1.0 / float(fs.gas_inv_b(250 * U.BAR, 0.0))
    assert bg_u == pytest.approx(0.0043, rel=5e-3)
    # gas density carries vaporized oil mass
    rho_sat = float(fs.gas_density(250 * U.BAR, rv250))
    rho_dry = float(fs.gas_density(250 * U.BAR, 0.0))
    assert rho_sat > rho_dry


def test_condensate_dropout(tmp_path):
    p = tmp_path / "V.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    # all cells start in the Rv (no-oil) state: explicit init with so=0
    flag0 = np.asarray(sim.flag)
    assert (flag0 == FLAG_RV).all()
    sim.run()
    # producing the strip drops the pressure; oil is produced via the
    # vaporized-oil stream (and possibly retrograde dropout)
    r = sim.summary.rows[-1]
    assert r["FOPT"] > 0.0
    p_now = np.asarray(sim.u)[:, 0]
    assert p_now.max() < 250 * U.BAR  # depleted
    # mass sanity: gas production target met
    assert r["WGPR:P1"] == pytest.approx(40000, rel=5e-2)
