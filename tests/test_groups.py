"""Group control + WECON tests (reference analog: SPE9 group-control
regression family + test_GroupState/test_glift units, SURVEY.md §4)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


def _group_deck(tmp_path, with_wecon=False):
    """Two group-controlled producers sharing a field ORAT target."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(8, 8, 3, tstep_days="2 5 10 20 30 60")
    wecon = "WECON\n 'PROD2' 2000 /\n/\n" if with_wecon else ""
    sched = """SCHEDULE
GRUPTREE
 'PLAT' 'FIELD' /
/
WELSPECS
 'PROD'  'PLAT' 8 8 8400 'OIL' /
 'PROD2' 'PLAT' 1 8 8400 'OIL' /
 'INJ'   'G1'   1 1 8335 'GAS' /
/
COMPDAT
 'PROD'  8 8 3 3 'OPEN' 1* 1* 0.5 /
 'PROD2' 1 8 2 3 'OPEN' 1* 1* 0.5 /
 'INJ'   1 1 1 1 'OPEN' 1* 1* 0.5 /
/
GCONPROD
 'PLAT' 'ORAT' 15000 /
/
WCONPROD
 'PROD'  'OPEN' 'GRUP' 5* 1000 /
 'PROD2' 'OPEN' 'GRUP' 5* 1000 /
/
""" + wecon + """WCONINJE
 'INJ' 'GAS' 'OPEN' 'RATE' 50000 1* 9014 /
/
TSTEP
 2 5 10 20 30 60 /
END
"""
    head = text.split("SCHEDULE")[0]
    p = tmp_path / "GRP.DATA"
    p.write_text(head + sched)
    return str(p)


def test_group_target_split(tmp_path):
    deck = _group_deck(tmp_path)
    sim = Simulator(load_state(deck), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    # total field oil rate matches the group target while unconstrained
    r0 = rows[0]
    assert r0["FOPR"] == pytest.approx(15000, rel=1e-3)
    assert r0["WOPR:PROD"] + r0["WOPR:PROD2"] == pytest.approx(15000,
                                                              rel=1e-3)
    # both wells produce a nonzero share
    assert r0["WOPR:PROD"] > 1000
    assert r0["WOPR:PROD2"] > 1000
    # shares persist through the run unless BHP-limited
    r_last = rows[-1]
    total = r_last["WOPR:PROD"] + r_last["WOPR:PROD2"]
    assert total <= 15000 * 1.01


def test_wecon_shuts_well(tmp_path):
    deck = _group_deck(tmp_path, with_wecon=True)
    sim = Simulator(load_state(deck), SimulatorOptions())
    # force PROD2 below its 2000 stb/d economic limit: give PROD a big
    # guide-rate head start by tightening the group target after start
    sim.run()
    # PROD2's WECON limit is 2000 stb/d; if its share fell below, it shut
    if "PROD2" in sim._shut_wells:
        r_last = sim.summary.rows[-1]
        assert r_last["WOPR:PROD2"] == 0.0
    else:
        # otherwise it must be producing above the limit
        assert sim.summary.rows[-1]["WOPR:PROD2"] >= 2000 * 0.99


def test_parse_group_keywords(tmp_path):
    deck = _group_deck(tmp_path)
    state = load_state(deck)
    g = state.schedule.steps[0].groups
    assert g["tree"] == {"PLAT": "FIELD"}
    assert g["prod"]["PLAT"]["mode"] == "ORAT"
    assert g["prod"]["PLAT"]["orat"] == pytest.approx(15000 * U.STB / U.DAY)
    wells = {w.name: w for w in state.schedule.steps[0].wells}
    assert wells["PROD"].control_mode == "GRUP"
    assert wells["PROD"].group == "PLAT"


def test_welopen_and_wtest(tmp_path):
    """WELOPEN shuts a well mid-schedule; WTEST re-opens a WECON-shut
    well after its retest interval."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(6, 6, 3, tstep_days="5 10")
    # shut the injector after the first two steps, then more steps
    text = text.replace(
        "TSTEP\n 5 10 /",
        "TSTEP\n 5 10 /\nWELOPEN\n 'INJ' 'SHUT' /\n/\nTSTEP\n 10 20 /")
    p = tmp_path / "WO.DATA"
    p.write_text(text)
    state = load_state(str(p))
    w_by_step = [({w.name: w.status for w in s.wells})
                 for s in state.schedule.steps]
    assert w_by_step[0]["INJ"] == "OPEN"
    assert w_by_step[2]["INJ"] == "SHUT"
    sim = Simulator(state, SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    assert rows[0]["WGIR:INJ"] > 0
    assert rows[-1]["WGIR:INJ"] == 0.0

    # WTEST parsing lands on the well config
    text2 = text.replace("WCONINJE\n", "WTEST\n 'PROD' 30 'E' /\n/\nWCONINJE\n", 1)
    p2 = tmp_path / "WT.DATA"
    p2.write_text(text2)
    st2 = load_state(str(p2))
    prod = next(w for w in st2.schedule.steps[0].wells if w.name == "PROD")
    assert prod.wtest_interval == pytest.approx(30.0)


def _rein_deck(tmp_path, mode_line):
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(8, 8, 3, tstep_days="5 10 20 30")
    sched = """SCHEDULE
WELSPECS
 'PROD' 'G1' 8 8 8400 'OIL' /
 'INJ'  'G1' 1 1 8335 'GAS' /
/
COMPDAT
 'PROD' 8 8 3 3 'OPEN' 1* 1* 0.5 /
 'INJ'  1 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONPROD
 'PROD' 'OPEN' 'ORAT' 12000 4* 1000 /
/
WCONINJE
 'INJ' 'GAS' 'OPEN' 'GRUP' /
/
""" + mode_line + """TSTEP
 5 10 20 30 /
END
"""
    head = text.split("SCHEDULE")[0]
    p = tmp_path / "REIN.DATA"
    p.write_text(head + sched)
    return str(p)


def test_gconinje_rein(tmp_path):
    """REIN: the group's gas injection follows its gas production times
    the reinjection fraction (reference: WellGroupHelpers REIN target)."""
    deck = _rein_deck(tmp_path, "GCONINJE\n 'G1' 'GAS' 'REIN' 2* 0.5 /\n/\n")
    sim = Simulator(load_state(deck), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    # after the first substep the fixed point holds: FGIR ~ 0.5 * FGPR
    r = rows[-1]
    assert r["FGIR"] == pytest.approx(0.5 * r["FGPR"], rel=0.05)


def test_gconinje_vrep(tmp_path):
    """VREP: injection runs on a reservoir-voidage (RESV) target."""
    deck = _rein_deck(tmp_path, "GCONINJE\n 'G1' 'GAS' 'VREP' 3* 1.0 /\n/\n")
    sim = Simulator(load_state(deck), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    # injector is active and tracking a voidage-replacement target
    assert rows[-1]["FGIR"] > 0
    from opm_autodiff_tpu.wells.standard import CTRL_RESV
    i_inj = sim._std_well_names.index("INJ")
    import numpy as np
    assert int(np.asarray(sim.active_mode)[i_inj]) in (CTRL_RESV, 0)


def test_wecon_item_positions(tmp_path):
    """WECON items: 2=min oil, 3=min gas, 4=max WCT, 5=max GOR
    (0-based 1..4) — regression for the item-index mapping."""
    from opm_autodiff_tpu import units as U

    deck = _group_deck(tmp_path)
    text = open(deck).read().replace(
        "WCONINJE", "WECON\n 'PROD' 100 50 0.8 2.5 /\n/\nWCONINJE", 1)
    p = tmp_path / "WE.DATA"
    p.write_text(text)
    state = load_state(str(p))
    w = next(x for x in state.schedule.steps[0].wells if x.name == "PROD")
    assert w.econ_min_oil == pytest.approx(100 * U.FIELD.liquid_rate)
    assert w.econ_min_gas == pytest.approx(50 * U.FIELD.gas_rate)
    assert w.econ_max_wct == pytest.approx(0.8)
    assert w.econ_max_gor == pytest.approx(2.5 * U.FIELD.gas_oil_ratio)


# ---------------------------------------------------------------------------
# Reference-semantics group control (round 2: target reduction, chain
# apportioning, GUIDERAT, WGRUPCON, FLD child-group caps —
# WellGroupHelpers.cpp:300 updateGroupTargetReduction, :931
# FractionCalculator, :1055 checkGroupConstraintsProd)
# ---------------------------------------------------------------------------

def _mk_well(name, group, mode="GRUP", injector=False, efac=1.0):
    from opm_autodiff_tpu.io.state import WellConfig

    return WellConfig(
        name=name, group=group, i=0, j=0, ref_depth=None,
        preferred_phase="OIL", is_injector=injector, status="OPEN",
        completions=[], control_mode=mode, efac=efac,
        inj_phase="GAS" if injector else None)


def _mgr(groups, wells, memory=None):
    from opm_autodiff_tpu.wells.groups import GroupManager

    return GroupManager(groups, wells, memory=memory)


def test_target_reduction_mixed_members():
    """Non-GRUP member production subtracts from the apportionable
    target (VERDICT.md weak #4)."""
    groups = {"tree": {"PLAT": "FIELD"},
              "prod": {"PLAT": {"mode": "ORAT", "orat": 100.0}}}
    wells = [_mk_well("A", "PLAT"), _mk_well("B", "PLAT"),
             _mk_well("C", "PLAT", mode="ORAT")]
    # current rates (into cells, negative production): A 30, B 30, C 25
    q = -np.array([[0, 30.0, 0], [0, 30.0, 0], [0, 25.0, 0]])
    out = _mgr(groups, wells).effective_controls(q)
    # apportionable = 100 - 25 = 75, split by rate guides 30:30
    assert out[0] == ("ORAT", pytest.approx(37.5))
    assert out[1] == ("ORAT", pytest.approx(37.5))
    assert 2 not in out  # C keeps its own control


def test_efficiency_factor_in_reduction_and_share():
    """WEFAC-weighted reduction; assigned targets are instantaneous
    (divided by efac) while accounting is efficiency-weighted."""
    groups = {"tree": {}, "prod": {"FIELD": {"mode": "ORAT",
                                             "orat": 100.0}}}
    wells = [_mk_well("A", "FIELD", efac=0.5),
             _mk_well("C", "FIELD", mode="ORAT", efac=0.5)]
    q = -np.array([[0, 40.0, 0], [0, 40.0, 0]])
    out = _mgr(groups, wells).effective_controls(q)
    # reduction = 0.5*40 = 20; effective target 80; A alone gets all of
    # it, instantaneous target = 80/0.5 = 160
    assert out[0] == ("ORAT", pytest.approx(160.0))


def test_nested_control_group_resolution():
    """A well two levels below the controlling group follows the nearest
    explicit ancestor; FLD layers are transparent (VERDICT.md weak #5)."""
    groups = {"tree": {"A1": "PLAT", "PLAT": "FIELD"},
              "prod": {"FIELD": {"mode": "ORAT", "orat": 60.0},
                       "PLAT": {"mode": "FLD"},
                       "A1": {"mode": "NONE"}}}
    wells = [_mk_well("W1", "A1"), _mk_well("W2", "PLAT")]
    q = -np.array([[0, 10.0, 0], [0, 30.0, 0]])
    out = _mgr(groups, wells).effective_controls(q)
    # both resolve to FIELD's target, split 10:30
    assert out[0] == ("ORAT", pytest.approx(15.0))
    assert out[1] == ("ORAT", pytest.approx(45.0))


def test_fld_child_group_cap_switches():
    """A FLD group carrying an ORAT target becomes the control group for
    its subtree when the subtree exceeds the target
    (checkGroupConstraintsProd / updateGroupIndividualControl)."""
    groups = {"tree": {"PLAT": "FIELD"},
              "prod": {"FIELD": {"mode": "ORAT", "orat": 100.0},
                       "PLAT": {"mode": "FLD", "orat": 30.0}}}
    wells = [_mk_well("W1", "PLAT"), _mk_well("W2", "FIELD")]
    mem = {}
    # W1 produces 50 > PLAT cap 30 -> PLAT switches to ORAT control
    q = -np.array([[0, 50.0, 0], [0, 40.0, 0]])
    out = _mgr(groups, wells, mem).effective_controls(q)
    assert mem[("gmode", "PLAT")] == "ORAT"
    # W1 now shares PLAT's 30; W2 gets FIELD's 100 minus PLAT's 50
    assert out[0] == ("ORAT", pytest.approx(30.0))
    assert out[1] == ("ORAT", pytest.approx(50.0))


def test_wgrupcon_fixed_guide_rates():
    groups = {"tree": {}, "prod": {"FIELD": {"mode": "ORAT",
                                             "orat": 80.0}},
              "wgrupcon": {"A": {"available": True, "guide_rate": 3.0,
                                 "phase": "OIL", "scaling": 1.0},
                           "B": {"available": True, "guide_rate": 1.0,
                                 "phase": "OIL", "scaling": 1.0}}}
    wells = [_mk_well("A", "FIELD"), _mk_well("B", "FIELD")]
    q = -np.array([[0, 10.0, 0], [0, 10.0, 0]])
    out = _mgr(groups, wells).effective_controls(q)
    assert out[0] == ("ORAT", pytest.approx(60.0))
    assert out[1] == ("ORAT", pytest.approx(20.0))


def test_wgrupcon_unavailable_counts_as_reduction():
    groups = {"tree": {}, "prod": {"FIELD": {"mode": "ORAT",
                                             "orat": 100.0}},
              "wgrupcon": {"B": {"available": False, "guide_rate": None,
                                 "phase": "OIL", "scaling": 1.0}}}
    wells = [_mk_well("A", "FIELD"), _mk_well("B", "FIELD")]
    q = -np.array([[0, 20.0, 0], [0, 30.0, 0]])
    out = _mgr(groups, wells).effective_controls(q)
    assert out[0] == ("ORAT", pytest.approx(70.0))  # 100 - 30
    assert 1 not in out


def test_guiderat_formula():
    """GR = POT^A / (B + C*WCT^D + E*GOR^F) with damping."""
    gm = {"phase": "OIL", "a": 1.0, "b": 1.0, "c": 2.0, "d": 1.0,
          "e": 0.0, "f": 0.0, "allow_increase": True, "damping": 1.0}
    groups = {"tree": {}, "prod": {"FIELD": {"mode": "ORAT",
                                             "orat": 90.0}},
              "guiderat": gm}
    wells = [_mk_well("A", "FIELD"), _mk_well("B", "FIELD")]
    # A: oil 10, water 10 (wct 0.5 -> denom 2) => gr 5
    # B: oil 10, water 0  (wct 0   -> denom 1) => gr 10
    q = -np.array([[10.0, 10.0, 0], [0.0, 10.0, 0]])
    out = _mgr(groups, wells).effective_controls(q)
    assert out[0] == ("ORAT", pytest.approx(30.0))
    assert out[1] == ("ORAT", pytest.approx(60.0))


def test_guiderat_allow_increase_no():
    gm = {"phase": "OIL", "a": 1.0, "b": 1.0, "c": 0.0, "d": 1.0,
          "e": 0.0, "f": 0.0, "allow_increase": False, "damping": 1.0}
    groups = {"tree": {}, "prod": {"FIELD": {"mode": "ORAT",
                                             "orat": 90.0}},
              "guiderat": gm}
    wells = [_mk_well("A", "FIELD"), _mk_well("B", "FIELD")]
    mem = {}
    q1 = -np.array([[0, 10.0, 0], [0, 20.0, 0]])
    _mgr(groups, wells, mem).effective_controls(q1)
    assert mem[("gr", "A")] == pytest.approx(10.0)
    # A's potential rises to 40 but the guide rate may not increase
    q2 = -np.array([[0, 40.0, 0], [0, 20.0, 0]])
    out = _mgr(groups, wells, mem).effective_controls(q2)
    assert mem[("gr", "A")] == pytest.approx(10.0)
    assert out[0] == ("ORAT", pytest.approx(90.0 * 10 / 30))


def test_guiderat_keyword_parsed(tmp_path):
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(4, 4, 3, tstep_days="1")
    extra = """GUIDERAT
 7.0 OIL 1.0 0.5 2.0 1.0 0.0 0.0 NO 0.75 /
WGRUPCON
 'PROD' YES 5.0 OIL /
/
TSTEP"""
    p = tmp_path / "GR.DATA"
    p.write_text(text.replace("TSTEP", extra, 1))
    state = load_state(str(p))
    g = state.schedule.steps[0].groups
    assert g["guiderat"]["phase"] == "OIL"
    assert g["guiderat"]["c"] == 2.0
    assert g["guiderat"]["allow_increase"] is False
    assert g["guiderat"]["damping"] == 0.75
    assert g["wgrupcon"]["PROD"]["guide_rate"] == 5.0


# ---------------------------------------------------------------------------
# WECON item-7 workover: CON / +CON close the worst-offending connection
# instead of shutting the well (reference: WellInterface_impl.hpp
# updateWellTestStateEconomic -> worstOffendingCompletion; VERDICT
# round-1 weak item 7)
# ---------------------------------------------------------------------------

_WORKOVER_DECK = """RUNSPEC
DIMENS
 10 1 2 /
OIL
WATER
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 20*20 /
DY
 20*20 /
DZ
 20*5 /
TOPS
 10*1000 10*1005 /
PORO
 20*0.25 /
PERMX
 20*500 /
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
 20*200 /
SWAT
 10*0.15 10*0.80 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'P1' 'G' 10 1 1000 'OIL' /
/
COMPDAT
 'P1' 10 1 1 2 'OPEN' 1* 1* 0.2 /
/
WCONPROD
 'P1' 'OPEN' 'LRAT' 2* 1* 60 1* 100 /
/
WECON
 'P1' 2* 0.40 2* '{workover}' /
/
TSTEP
 5 10 10 10 /
END
"""


def _run_workover(tmp_path, workover):
    p = tmp_path / f"WO_{workover.replace('+', 'P')}.DATA"
    p.write_text(_WORKOVER_DECK.format(workover=workover))
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_wecon_con_workover_closes_worst_connection(tmp_path):
    """The bottom (water-leg) connection violates the 0.40 water-cut
    limit; 'CON' closes it and the well keeps producing oil."""
    sim = _run_workover(tmp_path, "CON")
    closed = sim._closed_conns.get("P1")
    assert closed, "workover should have closed a connection"
    # the worst connection is the bottom one (k=1, 0-based) in the
    # water-swept layer
    assert (9, 0, 1) in closed
    assert "P1" not in sim._shut_wells
    # the well still produces oil after the workover
    assert sim.summary.rows[-1]["WOPR:P1"] > 0
    # water cut improves once the watered-out connection is gone
    wct_first = sim.summary.rows[0]["WWCT:P1"]
    wct_last = sim.summary.rows[-1]["WWCT:P1"]
    assert wct_last < wct_first


def test_wecon_well_shut_without_workover(tmp_path):
    """Same deck with workover NONE: the whole well shuts (the round-1
    behavior) — documents the CON delta."""
    sim = _run_workover(tmp_path, "NONE")
    assert "P1" in sim._shut_wells
    assert not sim._closed_conns.get("P1")


def _nupcol_deck(tmp_path, nupcol=None):
    """Group target one well cannot carry: PROD2's BHP floor binds, so
    the group must re-apportion to PROD *within* the substep to hit the
    target (reference: per-iteration group updates gated by NUPCOL,
    BlackoilWellModel_impl.hpp:828)."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(8, 8, 3, tstep_days="2")
    head = text.split("SCHEDULE")[0]
    if nupcol is not None:
        head = head.replace("WELLDIMS", f"NUPCOL\n {nupcol} /\nWELLDIMS")
    sched = """SCHEDULE
GRUPTREE
 'PLAT' 'FIELD' /
/
WELSPECS
 'PROD'  'PLAT' 8 8 8400 'OIL' /
 'PROD2' 'PLAT' 1 8 8400 'OIL' /
 'INJ'   'G1'   1 1 8335 'GAS' /
/
COMPDAT
 'PROD'  8 8 3 3 'OPEN' 1* 1* 0.5 /
 'PROD2' 1 8 3 3 'OPEN' 1* 1* 0.5 /
/
GCONPROD
 'PLAT' 'ORAT' 12000 /
/
WCONPROD
 'PROD'  'OPEN' 'GRUP' 5* 1000 /
 'PROD2' 'OPEN' 'GRUP' 5* 4700 /
/
TSTEP
 2 2 /
END
"""
    p = tmp_path / f"NUP{nupcol}.DATA"
    p.write_text(head + sched)
    return str(p)


def test_nupcol_same_substep_reapportioning(tmp_path):
    """With NUPCOL active (default 12), a member hitting its BHP floor
    mid-substep is compensated by the others in the SAME substep; with
    NUPCOL 1 the re-apportioning waits for the next substep. Also pins
    that the deck's NUPCOL keyword is consumed."""
    from opm_autodiff_tpu.io.state import load_state as _ls

    st_active = _ls(_nupcol_deck(tmp_path, nupcol=None))
    st_lagged = _ls(_nupcol_deck(tmp_path, nupcol=1))
    assert st_active.runspec.nupcol == 12
    assert st_lagged.runspec.nupcol == 1

    sim_a = Simulator(st_active, SimulatorOptions())
    sim_a.run()
    sim_l = Simulator(st_lagged, SimulatorOptions())
    sim_l.run()

    target = 12000.0
    r0_a = sim_a.summary.rows[0]
    r0_l = sim_l.summary.rows[0]
    # if the scenario actually constrained a member in substep 1, the
    # NUPCOL-active run must sit closer to (at) the group target
    gap_a = abs(r0_a["FOPR"] - target)
    gap_l = abs(r0_l["FOPR"] - target)
    assert gap_a <= gap_l + 1e-9
    assert r0_a["FOPR"] == pytest.approx(target, rel=2e-2)
