"""Numerical aquifer (AQUNUM/AQUCON) tests (reference:
opm/simulators/aquifers/AquiferNumerical.hpp:32)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

# column 1 is a huge numerical aquifer cell connected to the reservoir's
# I- face; the producer draws the reservoir down and the aquifer supports
# the pressure
DECK = """RUNSPEC
DIMENS
 10 1 1 /
OIL
WATER
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 10*20 /
DY
 10*20 /
DZ
 10*5 /
TOPS
 10*1000 /
PORO
 10*0.25 /
PERMX
 10*300 /
AQUNUM
-- id i j k  area    length  poro perm depth
 1    1 1 1  1.0E5   1000    0.3  500  1002.5 /
/
AQUCON
-- id i1 i2 j1 j2 k1 k2 face mult
 1    2  2  1  1  1  1  'I-' 1.0 /
/
PROPS
PVTW
 200 1.02 4.0E-5 0.5 0 /
PVDO
 100 1.05 2.0
 400 1.02 2.0 /
ROCK
 200 4E-5 /
SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
DENSITY
 850 1000 1 /
SOLUTION
PRESSURE
 10*200 /
SWAT
 0.999 9*0.15 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'P1' 'G' 10 1 1000 'OIL' /
/
COMPDAT
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
TSTEP
 5 10 20 /
END
"""


def test_aqunum_overrides_cell(tmp_path):
    p = tmp_path / "NA.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    pv = np.asarray(sim.geo.pore_vol)
    # aquifer cell: 1e5 m2 * 1000 m * 0.3 porosity
    assert pv[0] == pytest.approx(3.0e7, rel=1e-9)
    # ordinary cells untouched
    assert pv[1] == pytest.approx(20 * 20 * 5 * 0.25, rel=1e-9)
    # the AQUCON face exists (axis-3 connection from aquifer to cell 1)
    ax = np.asarray(sim.geo.faces.axis)
    aqf = np.nonzero(ax == 3)[0]
    assert len(aqf) == 1
    assert sim.geo.faces.left[aqf[0]] == 0
    assert sim.geo.faces.right[aqf[0]] == 1


def test_aquifer_supports_pressure(tmp_path):
    p = tmp_path / "NA.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    # without the aquifer this closed 10-cell strip would deplete hard;
    # with 3e7 m3 of aquifer PV the pressure barely moves
    p_end = np.asarray(sim.u)[:, 0]
    assert p_end.min() > 150e5  # stays way above the producer BHP limit
    r = sim.summary.rows[-1]
    assert r["FOPT"] > 0
    # aquifer water flows into the reservoir: aquifer cell sw drops below
    # its initial ~1.0 as water leaves (or stays ~1 while pushing) and
    # the neighbor gains water
    sw = np.asarray(sim.u)[:, 1]
    assert sw[1] > 0.15 + 1e-3
