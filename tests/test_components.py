"""Extended black-oil components: polymer, brine, foam (reference:
flow/flow_ebos_{polymer,brine,foam}.cpp variants; physics from opm-models
blackoil*modules)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

BASE = """RUNSPEC
DIMENS
 10 1 1 /
OIL
WATER
{runspec_extra}
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
{props_extra}
SOLUTION
PRESSURE
 10*200 /
SWAT
 10*0.15 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'I1' 'G' 1  1 1000 'WATER' /
 'P1' 'G' 10 1 1000 'OIL' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 40 1* 400 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
{sched_extra}
TSTEP
 5 10 20 30 /
END
"""

POLYMER_PROPS = """PLYVISC
 0.0  1.0
 1.0  4.0
 3.0 10.0 /
PLYROCK
 0.05 1.5 2000 2 0.002 /
PLYADS
 0.0  0.000
 1.0  0.001
 3.0  0.002 /
PLYMAX
 3.0 0 /
"""

POLYMER_SCHED = """WPOLYMER
 'I1' 2.0 0.0 /
"""


def _run(tmp_path, name, runspec_extra="", props_extra="", sched_extra=""):
    deck = BASE.format(runspec_extra=runspec_extra, props_extra=props_extra,
                       sched_extra=sched_extra)
    p = tmp_path / f"{name}.DATA"
    p.write_text(deck)
    # this file tests the operator-SPLIT component transports; the
    # fully-implicit polymer default is covered by
    # tests/test_polymer_implicit.py
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(polymer_implicit=False,
                                     brine_implicit=False,
                                     foam_implicit=False))
    sim.run()
    return sim


def test_polymer_slows_water_breakthrough(tmp_path):
    plain = _run(tmp_path, "PLAIN")
    poly = _run(tmp_path, "POLY", runspec_extra="POLYMER",
                props_extra=POLYMER_PROPS, sched_extra=POLYMER_SCHED)
    assert poly.components.has_polymer
    # polymer was transported: injector-side concentration near the
    # injected 2.0 kg/m3, producer side far below
    c = np.asarray(poly.components.c_poly)
    assert c[0] > 0.5
    assert c[-1] < c[0]
    # adsorption happened
    assert float(np.asarray(poly.components.ads).max()) > 0
    # thickened water pushes oil more efficiently: more oil produced,
    # less water produced at the same injection
    r_pl = plain.summary.rows[-1]
    r_po = poly.summary.rows[-1]
    assert r_po["FWPR"] < r_pl["FWPR"]
    # water mobility multiplier < 1 where polymer lives
    mm = np.asarray(poly.cells.mob_mult)
    assert mm[0, 0] < 0.6
    assert mm[:, 1] == pytest.approx(1.0)


BRINE_PROPS = """PVTWSALT
 200 0.0 /
 0.0  1.02 4.0E-5 0.30 0
 50.0 1.00 4.0E-5 0.90 0 /
"""

BRINE_SCHED = """WSALT
 'I1' 40.0 /
"""


def test_brine_salt_transport_and_viscosity(tmp_path):
    sim = _run(tmp_path, "BRINE", runspec_extra="BRINE",
               props_extra=BRINE_PROPS, sched_extra=BRINE_SCHED)
    assert sim.components.has_brine
    c = np.asarray(sim.components.c_salt)
    assert c[0] > 5.0      # salt arrived near the injector
    assert c[-1] < c[0]    # gradient toward the producer
    # salty water is thicker -> water mobility multiplier < 1
    mm = np.asarray(sim.cells.mob_mult)
    assert mm[0, 0] < 1.0


GASFLOOD_SCHED = """WCONINJE
 'I1' 'GAS' 'OPEN' 'RATE' 5000 1* 400 /
/
"""

FOAM_PROPS = """FOAMMOB
 0.0 1.0
 1.0 0.2
 5.0 0.05 /
"""

FOAM_SCHED = """WFOAM
 'I1' 2.0 /
"""


def test_foam_cuts_gas_mobility(tmp_path):
    deck_extra = dict(
        runspec_extra="GAS\nFOAM",
        props_extra=FOAM_PROPS + """PVDG
 100 0.012 0.012
 400 0.003 0.016 /
SGOF
 0.0  0.0  0.90 0
 0.5  0.4  0.20 0
 0.85 0.9  0.0  0 /
""",
        sched_extra=FOAM_SCHED + GASFLOOD_SCHED)
    sim = _run(tmp_path, "FOAM", **deck_extra)
    assert sim.components.has_foam
    c = np.asarray(sim.components.c_foam)
    assert c[0] > 0.05
    mm = np.asarray(sim.cells.mob_mult)
    # gas mobility cut where surfactant is present
    assert mm[0, 2] < 0.7
    assert mm[-1, 2] > mm[0, 2] - 1e-9
