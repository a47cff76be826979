"""WCONHIST/WCONINJH history controls and DRSDT composition limits
(reference: opm-common WCONHIST handling; EclProblem::
updateCompositionChangeLimits_, eclproblem.hh:2010)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

DECK = """RUNSPEC
DIMENS
 6 1 1 /
OIL
WATER
GAS
DISGAS
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 6*20 /
DY
 6*20 /
DZ
 6*5 /
TOPS
 6*1500 /
PORO
 6*0.25 /
PERMX
 6*300 /
PROPS
PVTW
 150 1.02 4.0E-5 0.5 0 /
PVTO
 20  50 1.15 1.0
    300 1.10 1.1 /
 90 150 1.30 0.6
    400 1.25 0.7 /
/
PVDG
 50  0.025 0.014
 300 0.004 0.018 /
ROCK
 150 4E-5 /
SWOF
 0.15 0.00  0.90 0
 1.00 1.00  0.0  0 /
SGOF
 0.0  0.0  0.90 0
 0.85 0.9  0.0  0 /
DENSITY
 800 1000 1 /
SOLUTION
PRESSURE
 6*100 /
SWAT
 6*0.15 /
SGAS
 6*0.0 /
RS
 6*40 /
SUMMARY
FOPR
SCHEDULE
{drsdt}
WELSPECS
 'GI' 'G' 1 1 1500 'GAS' /
 'P1' 'G' 6 1 1500 'OIL' /
/
COMPDAT
 'GI' 1 1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 6 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJH
 'GI' 'GAS' 'OPEN' 5000 /
WCONHIST
 'P1' 'OPEN' 'ORAT' 30 0 4000 /
/
TSTEP
 2 5 10 /
END
"""


def test_wconhist_parsed(tmp_path):
    p = tmp_path / "H.DATA"
    p.write_text(DECK.format(drsdt=""))
    state = load_state(str(p))
    wells = {w.name: w for w in state.schedule.steps[0].wells}
    p1 = wells["P1"]
    assert not p1.is_injector
    assert p1.control_mode == "ORAT"
    assert p1.oil_rate == pytest.approx(30 / U.DAY)
    gi = wells["GI"]
    assert gi.is_injector and gi.control_mode == "RATE"
    assert gi.inj_rate == pytest.approx(5000 / U.DAY)


def test_drsdt_limits_dissolution(tmp_path):
    """Gas injection re-pressurizes undersaturated oil; without DRSDT the
    oil re-dissolves gas freely (Rs tracks saturation); DRSDT caps the
    rate of Rs increase."""
    p0 = tmp_path / "FREE.DATA"
    p0.write_text(DECK.format(drsdt=""))
    free = Simulator(load_state(str(p0)), SimulatorOptions())
    free.run()
    p1 = tmp_path / "LIM.DATA"
    p1.write_text(DECK.format(drsdt="DRSDT\n 0.0001 /\n"))
    lim = Simulator(load_state(str(p1)), SimulatorOptions())
    assert lim.state.schedule.steps[0].tuning["drsdt"] == pytest.approx(
        0.0001 / U.DAY)
    lim.run()
    from opm_autodiff_tpu.models.blackoil import FLAG_SG

    def free_gas(sim):
        u = np.asarray(sim.u)
        fl = np.asarray(sim.flag)
        return np.where(fl == FLAG_SG, u[:, 2], 0.0).sum()

    def dissolved(sim):
        from opm_autodiff_tpu.models.blackoil import FLAG_RS
        u = np.asarray(sim.u)
        fl = np.asarray(sim.flag)
        # RS cells carry Rs as x3; SG cells sit at (capped) saturation
        return np.where(fl == FLAG_RS, u[:, 2], np.nan)

    # the rate limit forces injected gas to stay FREE instead of
    # dissolving: more free gas in the limited run
    assert free_gas(lim) > free_gas(free) + 1e-4
