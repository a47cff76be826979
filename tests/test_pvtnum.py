"""PVTNUM PVT-region tests (multi-region BlackOilFluidSystem behavior —
the reference gets this from opm-common TABDIMS/NTPVT table banking,
SURVEY.md §0.1)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

TWO_PVT_DECK = """RUNSPEC
DIMENS
 10 2 1 /
OIL
WATER
FIELD
TABDIMS
 1 2 /
START
 1 'JAN' 2020 /
GRID
DX
 20*50 /
DY
 20*50 /
DZ
 20*20 /
TOPS
 20*4000 /
PORO
 20*0.25 /
PERMX
 20*300 /
REGIONS
PVTNUM
 10*1 10*2 /
PROPS
PVTW
 4000 1.01 3.0E-6 0.4 0 /
 4000 1.05 3.0E-6 0.8 0 /
PVDO
-- region 1: thin oil
 400  1.06 1.0
 8000 1.02 1.0 /
-- region 2: heavy oil (10x viscosity, different Bo)
 400  1.20 10.0
 8000 1.10 10.0 /
ROCK
 4000 4E-6 /
 4000 8E-6 /
SWOF
 0.20 0.00  0.95 0
 0.50 0.20  0.30 0
 0.80 0.60  0.0  0
 1.00 1.00  0.0  0 /
DENSITY
 52 64 0.06 /
 56 66 0.07 /
SOLUTION
PRESSURE
 20*4000 /
SWAT
 20*0.20 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'I1' 'G' 1  1 4010 'WATER' /
 'I2' 'G' 1  2 4010 'WATER' /
 'P1' 'G' 10 1 4010 'OIL' /
 'P2' 'G' 10 2 4010 'OIL' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.5 /
 'I2' 1  2 1 1 'OPEN' 1* 1* 0.5 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.5 /
 'P2' 10 2 1 1 'OPEN' 1* 1* 0.5 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 300 1* 8000 /
 'I2' 'WATER' 'OPEN' 'RATE' 300 1* 8000 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 3000 /
 'P2' 'OPEN' 'BHP' 5* 3000 /
/
TSTEP
 1 2 5 10 20 /
END
"""


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    p = tmp_path_factory.mktemp("pvtnum") / "PN.DATA"
    p.write_text(TWO_PVT_DECK)
    s = Simulator(load_state(str(p)), SimulatorOptions())
    s.run()
    return s


def test_banked_pvt_tables(sim):
    fs = sim.fs
    assert fs.num_pvt_regions == 2
    p = 4000 * U.PSI
    # PVDO differs per region
    bo1 = 1.0 / float(fs.oil_inv_b(p, 0.0, 0))
    bo2 = 1.0 / float(fs.oil_inv_b(p, 0.0, 1))
    assert 1.02 < bo1 < 1.06
    assert 1.10 < bo2 < 1.20
    mu1 = float(fs.oil_viscosity(p, 0.0, 0))
    mu2 = float(fs.oil_viscosity(p, 0.0, 1))
    assert mu2 == pytest.approx(10 * mu1, rel=1e-6)
    # PVTW differs per region
    assert float(fs.water.inv_b(p, 0)) == pytest.approx(1 / 1.01, rel=1e-3)
    assert float(fs.water.inv_b(p, 1)) == pytest.approx(1 / 1.05, rel=1e-3)
    # DENSITY banked
    assert float(fs.rho_surf[0][0]) != float(fs.rho_surf[1][0])
    # ROCK banked: different compressibility per region
    assert float(fs.rock.mult(p + 100 * U.PSI, 0)) < \
        float(fs.rock.mult(p + 100 * U.PSI, 1))
    # geometry carries zero-based pvtnum
    pn = np.asarray(sim.geo.pvtnum)
    assert pn[0] == 0 and pn[10] == 1


def test_region_dependent_displacement(sim):
    """Row 2's 10x-viscosity oil floods an order slower: the heavy-oil
    producer P2 makes much less oil for the same injection."""
    r_end = sim.summary.rows[-1]
    assert r_end["WOPR:P1"] > 2 * r_end["WOPR:P2"]


def test_multi_region_pvto_parse(tmp_path):
    """PVTO with two region sub-tables (separated by the lone '/')."""
    deck = """RUNSPEC
DIMENS
 1 1 1 /
OIL
WATER
GAS
DISGAS
METRIC
TABDIMS
 1 2 /
GRID
DX
 100 /
DY
 100 /
DZ
 10 /
TOPS
 1000 /
PORO
 0.3 /
PERMX
 100 /
PROPS
PVTO
 20  50 1.10 1.0
    100 1.08 1.1 /
 40 100 1.20 0.9 /
/
 10  50 1.05 2.0 /
 20 100 1.10 1.9 /
/
PVDG
 50 0.02 0.01
 300 0.005 0.02 /
 50 0.03 0.01
 300 0.006 0.02 /
SWOF
 0.2 0 1 0
 1.0 1 0 0 /
SGOF
 0.0 0 1 0
 0.8 1 0 0 /
PVTW
 200 1.02 4E-5 0.5 0 /
ROCK
 200 4E-5 /
DENSITY
 800 1000 1 /
SOLUTION
PRESSURE
 200 /
SWAT
 0.2 /
SGAS
 0.0 /
RS
 15 /
SCHEDULE
END
"""
    p = tmp_path / "PVTO2.DATA"
    p.write_text(deck)
    state = load_state(str(p))
    assert len(state.props.pvto_regions) == 2
    fs = FluidSystem.from_state(state)
    assert fs.num_pvt_regions == 2
    # region 1 rs_sat(100 bar) = 40; region 2 rs_sat(100 bar) = 20
    p100 = 100 * U.BAR
    assert float(fs.rs_sat(p100, 0)) == pytest.approx(40.0, rel=1e-6)
    assert float(fs.rs_sat(p100, 1)) == pytest.approx(20.0, rel=1e-6)
    # PVDG banked too
    p50 = 50 * U.BAR
    assert float(fs.gas.inv_b(p50, 0)) == pytest.approx(1 / 0.02, rel=1e-6)
    assert float(fs.gas.inv_b(p50, 1)) == pytest.approx(1 / 0.03, rel=1e-6)
