"""Gas-lift setup pinned to the reference's GLIFT1.DATA fixture.

Loads /root/reference/tests/GLIFT1.DATA (20x30x10 corner-point model
with LIFTOPT/WLIFTOPT and three VFP tables; skip-if-absent) and anchors
against test_glift1.cpp:117 (case G1):

  * schedule parse: exactly one gas-lift producer B-1H with the deck's
    WLIFTOPT fields (max ALQ 150000 sm3/d, weight 1.01, min ALQ -1) and
    LIFTOPT economics (increment 12500, min gradient 0.005);
  * the initial gas-lift rates: the reference limits the oil potential
    at the ORAT target (state->oilRate() == 0.017361111... m3/s,
    oilIsLimited) and reports the raw gas potential
    (state->gasRate() == 1.6464647 m3/s) at the WellState initial bhp
    (0.99 x first-perforation cell pressure, WellState.cpp:214);
  * PBVD semantics: the potentials' GOR equals RsSat(Pb=75 bar) — the
    deck caps Rs by a constant bubble point, so produced GOR is a
    direct function-level anchor on the PVT + equilibration chain;
  * the optimizer outcome: no ALQ increase is economic at these
    conditions (state->alq() == 0, no increase) — optimize_alq keeps
    ALQ at 0.

The absolute potential tolerance is 15%: the connection factors are
Peaceman-defaulted from the corner-point geometry, where our effective
cell spans differ slightly from CpGrid's; the GOR and the limited oil
rate are exact.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

REF = "/root/reference/tests"
DECK = os.path.join(REF, "GLIFT1.DATA")

pytestmark = pytest.mark.skipif(
    not os.path.exists(DECK), reason="GLIFT1.DATA unavailable")


@pytest.fixture(scope="module")
def glift_sim():
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

    state = load_state(DECK)
    sim = Simulator(state, SimulatorOptions())
    from opm_autodiff_tpu.wells import build_wellset

    wells = [w for w in state.schedule.steps[0].wells
             if not getattr(w, "segments", None)]
    ws = build_wellset(sim.geo, wells,
                       vfp_numbering=sim._vfp_numbering,
                       vfp_inj_numbering=sim._vfp_inj_numbering)
    return sim, state, wells, ws


def test_glift_schedule_parse(glift_sim):
    _sim, state, wells, _ws = glift_sim
    lift = [w for w in wells if getattr(w, "glift_on", False)]
    assert len(lift) == 1
    w = lift[0]
    assert w.name == "B-1H"
    assert w.glift_max_alq == pytest.approx(150000.0)
    assert w.glift_weight == pytest.approx(1.01)
    assert w.glift_min_alq == pytest.approx(-1.0)
    assert w.control_mode == "ORAT"
    assert w.oil_rate == pytest.approx(0.017361111111111112)
    assert w.thp_limit == pytest.approx(30e5)
    assert w.vfp_table == 1
    lo = state.schedule.steps[0].liftopt
    assert lo["increment"] == pytest.approx(12500.0)
    assert lo["min_gradient"] == pytest.approx(0.005)


def test_glift_initial_rates(glift_sim):
    """test_glift1.cpp:189-195: oil limited at target, gas potential."""
    from opm_autodiff_tpu.wells.standard import well_rates_only

    sim, _state, _wells, ws = glift_sim
    target = 0.017361111111111112
    p_first = float(np.asarray(sim.u)[int(np.asarray(ws.cell)[0, 0]), 0])
    bhp0 = 0.99 * p_first  # WellState.cpp:214 producer init
    pbh = np.asarray(ws.bhp_target, float).copy()
    pbh[0] = bhp0
    q = well_rates_only(sim.fs, sim.u, sim.flag, jnp.asarray(pbh), ws,
                        sim.cells.regs, sim.cells.mob_mult)
    pot = np.maximum(-np.asarray(q), 0.0)[0]
    # oil potential exceeds the ORAT target -> the limited rate IS the
    # target (state->oilRate() == target, oilIsLimited)
    assert pot[1] > target
    assert min(pot[1], target) == pytest.approx(0.01736111111111111,
                                                rel=1e-12)
    # raw gas potential (state->gasRate()); 15% absolute (Peaceman CF
    # from corner-point geometry differs slightly from CpGrid)
    assert pot[2] == pytest.approx(1.6464646999768586, rel=0.15)
    # PBVD anchor: produced GOR == RsSat(Pb = 75 bar), exact
    from opm_autodiff_tpu.models.init import _HostProps

    hp = _HostProps(sim.fs, 0)
    assert pot[2] / pot[1] == pytest.approx(hp.rs_sat(75e5), rel=1e-6)


def test_glift_no_alq_increase(glift_sim):
    """state->alq() == 0 and no increase: lift gas is not economic at
    the initial conditions (the well meets its target without ALQ)."""
    from opm_autodiff_tpu.wells.gaslift import optimize_alq

    sim, state, wells, ws = glift_sim
    lift = dict(state.schedule.steps[0].liftopt)
    lift["tree"] = state.schedule.steps[0].groups.get("tree", {})
    alq = optimize_alq(sim.fs, sim.u, sim.flag, ws, wells, lift,
                       sim.vfp_bank, sim.cells.regs, sim.cells.mob_mult,
                       unit=state.runspec.unit_system)
    assert alq[0] == pytest.approx(0.0, abs=1e-12)
