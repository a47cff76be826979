"""End-point scaling (EPS) + SWATINIT tests (reference: opm-material
EclEpsScalingPoints/EclEpsTwoPhaseLaw; SWATINIT via PCW scaling in
equil/initstateequil)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

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
{eps}
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
TSTEP
 5 10 20 /
END
"""

EPS_KRW = """SWCR
 10*0.30 /
SWU
 10*0.90 /
KRW
 10*0.5 /
"""


def _run(tmp_path, name, eps=""):
    p = tmp_path / f"{name}.DATA"
    p.write_text(DECK.format(eps=eps))
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_scaled_krw_evaluation(tmp_path):
    p = tmp_path / "E.DATA"
    p.write_text(DECK.format(eps=EPS_KRW))
    import jax.numpy as jnp
    state = load_state(str(p))
    fs = FluidSystem.from_state(state)
    sat = fs.sat
    # table endpoints detected
    assert float(sat.t_swcr[0]) == pytest.approx(0.15)
    assert float(sat.t_swu[0]) == pytest.approx(1.0)
    assert float(sat.t_krw_mx[0]) == pytest.approx(1.0)
    eps = jnp.asarray(np.array(
        [0.15, 0.30, 0.90, np.nan, np.nan, np.nan, np.nan, 0.5, np.nan,
         np.nan, np.nan, np.nan]))
    # below scaled critical: zero
    assert float(sat.krw(0.29, 0, eps)) == 0.0
    # at scaled max: the scaled maximum 0.5
    assert float(sat.krw(0.90, 0, eps)) == pytest.approx(0.5, rel=1e-6)
    # midpoint maps to the table midpoint: krw_tab(0.575)*0.5
    mid_t = float(sat.krw(0.575, 0))
    assert float(sat.krw(0.60, 0, eps)) == pytest.approx(0.5 * mid_t,
                                                         rel=1e-6)
    # unscaled call unchanged
    assert float(sat.krw(0.5, 0)) == pytest.approx(0.20)


def test_eps_changes_flood_behavior(tmp_path):
    base = _run(tmp_path, "BASE")
    scaled = _run(tmp_path, "EPS", eps=EPS_KRW)
    assert scaled.cells.eps is not None
    # weaker, later water mobility: less water produced by the end
    r0 = base.summary.rows[-1]
    r1 = scaled.summary.rows[-1]
    assert r1["FWPT"] < r0["FWPT"] * 0.9


SWATINIT_DECK_EPS = """SWATINIT
 2*0.60 8*0.25 /
"""


def test_swatinit_overrides_equil(tmp_path):
    # use EQUIL so the SWATINIT branch runs through equilibration
    deck = DECK.format(eps=SWATINIT_DECK_EPS).replace(
        """PRESSURE
 10*200 /
SWAT
 10*0.15 /""",
        """EQUIL
 1002.5 200 2000 0 500 0 /""")
    p = tmp_path / "SWI.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    u = np.asarray(sim.u)
    assert u[0, 1] == pytest.approx(0.60, abs=1e-6)
    assert u[5, 1] == pytest.approx(0.25, abs=1e-6)
    sim.run()  # and it still runs
