"""Single-phase (water-only) variant: flow_onephase.cpp /
flow_onephase_energy.cpp analogs. A single-phase deck has no saturation
functions (SatFunc synthesizes a fully-mobile table) and only the water
equation is active — the oil row pins sw and the gas row pins x3 (the
general inactive-phase pinning in solvers/newton.py)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator

DECK = """RUNSPEC
DIMENS
 10 1 1 /
WATER
{thermal}
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
 10*500 /
PROPS
PVTW
 200 1.02 4.0E-5 0.5 0 /
ROCK
 200 4E-5 /
{thermal_props}
DENSITY
 850 1000 1 /
SOLUTION
PRESSURE
 10*200 /
SWAT
 10*1.0 /
SUMMARY
FWPR
SCHEDULE
WELSPECS
 'I1' 'G' 1  1 1000 'WATER' /
 'P1' 'G' 10 1 1000 'WATER' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 50 1* 400 /
/
{wtemp}
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
TSTEP
 5 10 20 /
END
"""

THERMAL_PROPS = """THCONR
 10*2.0 /
SPECROCK
 10 2100
 200 2100 /
SPECHEAT
 10 4.2 1.0 2.1
 200 4.2 1.0 2.1 /
TEMPI
 10*80 /
"""


def _run(tmp_path, name, thermal=False):
    deck = DECK.format(
        thermal="THERMAL" if thermal else "",
        thermal_props=THERMAL_PROPS if thermal else "",
        wtemp="WTEMP\n 'I1' 30 /\n/" if thermal else "")
    p = tmp_path / f"{name}.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)))
    sim.run()
    return sim


def test_onephase_water(tmp_path):
    sim = _run(tmp_path, "ONEPH")
    p = np.asarray(sim.u[:, 0]) / 1e5
    # steady pressure gradient injector -> producer, monotone
    assert p[0] > p[-1] + 5.0
    assert np.all(np.diff(p) < 0)
    # sw stays frozen at 1 (pinned oil row)
    np.testing.assert_allclose(np.asarray(sim.u[:, 1]), 1.0, atol=1e-12)
    # produced ~ injected + expansion (slightly compressible)
    assert sim.cum["FWPT"] == pytest.approx(sim.cum["FWIT"], rel=0.05)
    assert sim.cum["FOPT"] == 0.0 and sim.cum["FGPT"] == 0.0


def test_onephase_energy(tmp_path):
    """flow_onephase_energy analog: 30 C water into an 80 C reservoir —
    the cold front advances from the injector (implicit energy as the
    4th block equation)."""
    sim = _run(tmp_path, "ONEPHE", thermal=True)
    assert sim.energy is not None
    T = np.asarray(sim.u[:, 3]) - 273.15
    assert T[0] < 70.0           # cooled near the injector
    assert T[-1] > 78.0          # producer end still near initial
    assert np.all(np.diff(T) > -1e-9)  # monotone cold front
