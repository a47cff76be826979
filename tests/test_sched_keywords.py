"""WPIMULT / WEFAC / GEFAC / TUNING / NOSIM schedule keywords
(reference: WellProdIndexCalculator, WellState efficiency handling,
AdaptiveTimeSteppingEbos::updateTUNING, FlowMainEbos NOSIM)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
from opm_autodiff_tpu.wells import build_wellset

BASE = """RUNSPEC
DIMENS
 5 1 1 /
OIL
WATER
METRIC
{runspec}
START
 1 'JAN' 2020 /
GRID
DX
 5*20 /
DY
 5*20 /
DZ
 5*5 /
TOPS
 5*1000 /
PORO
 5*0.25 /
PERMX
 5*300 /
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
 1.00 1.00  0.0  0 /
DENSITY
 850 1000 1 /
SOLUTION
PRESSURE
 5*200 /
SWAT
 5*0.15 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'P1' 'G' 5 1 1000 'OIL' /
/
COMPDAT
 'P1' 5 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
{sched}
TSTEP
 2 5 /
END
"""


def _state(tmp_path, name, runspec="", sched=""):
    p = tmp_path / f"{name}.DATA"
    p.write_text(BASE.format(runspec=runspec, sched=sched))
    return load_state(str(p))


def test_wpimult_scales_cf(tmp_path):
    s0 = _state(tmp_path, "A")
    s1 = _state(tmp_path, "B", sched="WPIMULT\n 'P1' 0.25 /\n/")
    from opm_autodiff_tpu.grid import build_geometry
    g0 = build_geometry(s0)
    g1 = build_geometry(s1)
    ws0 = build_wellset(g0, s0.schedule.steps[0].wells)
    ws1 = build_wellset(g1, s1.schedule.steps[0].wells)
    assert float(ws1.wi[0, 0]) == pytest.approx(0.25 * float(ws0.wi[0, 0]))


def test_wefac_scales_reported_rates(tmp_path):
    s1 = _state(tmp_path, "E", sched="WEFAC\n 'P1' 0.5 /\n/")
    w = s1.schedule.steps[0].wells[0]
    assert w.efac == pytest.approx(0.5)
    sim = Simulator(s1, SimulatorOptions())
    sim.run()
    # the reported rate carries the efficiency factor
    r = sim.summary.rows[-1]
    assert r["WOPR:P1"] > 0
    ws = build_wellset(sim.geo, s1.schedule.steps[0].wells)
    assert float(ws.efac[0]) == pytest.approx(0.5)


def test_tuning_caps_dt(tmp_path):
    s1 = _state(tmp_path, "T", sched="TUNING\n 0.1 0.5 /\n /\n /")
    step = s1.schedule.steps[0]
    assert step.tuning["initial_dt_days"] == pytest.approx(0.1)
    assert step.tuning["max_dt_days"] == pytest.approx(0.5)
    sim = Simulator(s1, SimulatorOptions())
    reports = sim.step()
    # dt never exceeded the TUNING cap
    assert max(r.dt_days for r in reports) <= 0.5 + 1e-9
    assert reports[0].dt_days <= 0.1 + 1e-9


def test_nosim(tmp_path):
    s1 = _state(tmp_path, "N", runspec="NOSIM")
    assert s1.runspec.nosim
    sim = Simulator(s1, SimulatorOptions())
    rep = sim.run()
    assert sim._step_index == 0  # no steps taken


LUMP_BASE = """RUNSPEC
DIMENS
 1 1 3 /
OIL
WATER
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 3*20 /
DY
 3*20 /
DZ
 3*5 /
TOPS
 3*1000 /
PORO
 3*0.25 /
PERMX
 3*300 /
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
 1.00 1.00  0.0  0 /
DENSITY
 850 1000 1 /
SOLUTION
PRESSURE
 3*200 /
SWAT
 3*0.15 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'P1' 'G' 1 1 1000 'OIL' /
/
COMPDAT
 'P1' 1 1 1 3 'OPEN' 1* 1* 0.2 /
/
COMPLUMP
 'P1' 1 1 1 2 1 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
TSTEP
 2 /
{welopen}TSTEP
 5 /
END
"""


def test_complump_welopen_shuts_connections(tmp_path):
    """COMPLUMP assigns completion numbers; WELOPEN by completion range
    shuts those connections only (reference: opm-common Schedule
    completion handling consumed by BlackoilWellModel)."""
    p = tmp_path / "LUMP.DATA"
    p.write_text(LUMP_BASE.format(
        welopen="WELOPEN\n 'P1' 'SHUT' 3* 1 1 /\n/\n"))
    state = load_state(str(p))
    w0 = state.schedule.steps[0].wells[0]
    assert [c.lump for c in w0.completions] == [1, 1, 0]
    assert all(c.open for c in w0.completions)
    w1 = state.schedule.steps[1].wells[0]
    assert w1.status == "OPEN"  # well itself stays open
    assert [c.open for c in w1.completions] == [False, False, True]


def test_welopen_by_location(tmp_path):
    p = tmp_path / "LUMP2.DATA"
    p.write_text(LUMP_BASE.format(
        welopen="WELOPEN\n 'P1' 'SHUT' 1 1 2 /\n/\n"))
    state = load_state(str(p))
    w1 = state.schedule.steps[1].wells[0]
    assert [c.open for c in w1.completions] == [True, False, True]


def test_welopen_whole_well_form_unchanged(tmp_path):
    p = tmp_path / "LUMP3.DATA"
    p.write_text(LUMP_BASE.format(
        welopen="WELOPEN\n 'P1' 'SHUT' /\n/\n"))
    state = load_state(str(p))
    w1 = state.schedule.steps[1].wells[0]
    assert w1.status == "SHUT"
    assert all(c.open for c in w1.completions)


def test_tuning_growth_and_chop_factors(tmp_path):
    """TUNING items 5/6 (TSFMAX/TSFMIN) map onto the adaptive stepper's
    growth and restart factors."""
    import os

    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    p = os.path.join(str(tmp_path), "TU.DATA")
    write_spe1_deck(p, 3, 3, 3)
    txt = open(p).read().replace(
        "TSTEP", "TUNING\n 0.5 10 0.01 1* 2.0 0.25 /\n/\n/\nTSTEP", 1)
    open(p, "w").write(txt)
    state = load_state(p)
    t = state.schedule.steps[0].tuning
    assert t["initial_dt_days"] == 0.5
    assert t["max_dt_days"] == 10
    assert t["growth_factor"] == 2.0
    assert t["restart_factor"] == 0.25


def test_welopen_stop_mid_schedule(tmp_path):
    """WELOPEN 'STOP' between report steps: the well produces in step 1,
    then is stopped at the surface — reported rates drop to zero — but
    stays a live CTRL_STOP well (reference Well::Status::STOP), and the
    run completes. 2-phase oil/water: the single-perf stopped well has
    no crossflow partner, so its net rate is exactly zero."""
    deck = BASE.format(runspec="", sched="").replace(
        "TSTEP\n 2 5 /", "TSTEP\n 2 /\nWELOPEN\n 'P1' 'STOP' 5* /\n/\n"
        "TSTEP\n 5 /")
    p = tmp_path / "STOPRUN.DATA"
    p.write_text(deck)
    s1 = load_state(str(p))
    assert [w.status for w in s1.schedule.steps[0].wells] == ["OPEN"]
    assert [w.status for w in s1.schedule.steps[1].wells] == ["STOP"]

    from opm_autodiff_tpu.wells.standard import CTRL_STOP
    from opm_autodiff_tpu.grid import build_geometry
    ws1 = build_wellset(build_geometry(s1), s1.schedule.steps[1].wells)
    assert bool(ws1.open_mask[0]) and int(ws1.ctrl_mode[0]) == CTRL_STOP

    sim = Simulator(s1, SimulatorOptions())
    sim.step()
    flowing = sim.summary.rows[-1]["WOPR:P1"]
    assert flowing > 0
    sim.step()
    stopped = sim.summary.rows[-1]["WOPR:P1"]
    assert abs(stopped) < 1e-6 * flowing
