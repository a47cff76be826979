"""SATNUM saturation-region tests (multi-region EclMaterialLawManager
behavior, reference SURVEY.md §0.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

TWO_REGION_DECK = """RUNSPEC
DIMENS
 10 2 1 /
OIL
WATER
FIELD
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
SATNUM
 10*1 10*2 /
PROPS
PVTW
 4000 1.01 3.0E-6 0.4 0 /
PVDO
 400  1.06 2.0
 8000 1.02 2.0 /
ROCK
 4000 4E-6 /
SWOF
-- region 1: mobile water
 0.20 0.00  0.95 0
 0.50 0.20  0.30 0
 0.80 0.60  0.0  0
 1.00 1.00  0.0  0 /
-- region 2: much less mobile water, different connate
 0.10 0.00  0.99 0
 0.50 0.02  0.40 0
 0.80 0.10  0.0  0
 1.00 0.30  0.0  0 /
DENSITY
 52 64 0.06 /
SOLUTION
PRESSURE
 20*4000 /
SWAT
 10*0.20 10*0.10 /
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
 'I1' 'WATER' 'OPEN' 'RATE' 500 1* 8000 /
 'I2' 'WATER' 'OPEN' 'RATE' 500 1* 8000 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 3000 /
 'P2' 'OPEN' 'BHP' 5* 3000 /
/
TSTEP
 1 2 5 10 20 30 30 /
END
"""


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    p = tmp_path_factory.mktemp("satnum") / "SN.DATA"
    p.write_text(TWO_REGION_DECK)
    s = Simulator(load_state(str(p)), SimulatorOptions())
    s.run()
    return s


def test_region_tables_selected(sim):
    fs = sim.fs
    assert fs.sat.num_regions == 2
    # same Sw, different krw per region
    krw1 = float(fs.sat.krw(0.5, 0))
    krw2 = float(fs.sat.krw(0.5, 1))
    assert krw1 == pytest.approx(0.20)
    assert krw2 == pytest.approx(0.02)
    # connate differs
    assert float(fs.sat.swco[0]) == pytest.approx(0.20)
    assert float(fs.sat.swco[1]) == pytest.approx(0.10)
    # geometry carries zero-based regions
    sn = np.asarray(sim.geo.satnum)
    assert sn[0] == 0 and sn[10] == 1


def test_region_dependent_flood(sim):
    """Row 1 (mobile water) behaves differently from row 2 (krw ~6x
    lower at high Sw): water breaks through and produces freely in
    row 1, while row 2's low water mobility chokes water production."""
    sats = sim.get_saturations()
    sw = sats["SWAT"].reshape(2, 10)
    # saturation profiles differ between the rows
    assert np.abs(sw[0] - sw[1]).max() > 0.02
    r_end = sim.summary.rows[-1]
    assert r_end["WWPR:P1"] > 3 * r_end["WWPR:P2"]
    # both injectors delivered the same volume
    r = sim.summary.rows[0]
    assert r["WWIR:I1"] == pytest.approx(500, rel=1e-2)
    assert r["WWIR:I2"] == pytest.approx(500, rel=1e-2)
