"""UDQ and ACTIONX tests (reference: EclProblem::applyActions,
ebos/eclproblem.hh:1243; opm-common UDQ/Action machinery)."""

import numpy as np
import pytest

from opm_autodiff_tpu.actions import UdqEngine, evaluate
from opm_autodiff_tpu.io.deck import read_deck
from opm_autodiff_tpu.io.state import load_state
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
SOLUTION
PRESSURE
 10*200 /
SWAT
 10*0.15 /
SUMMARY
FOPR
SCHEDULE
UDQ
 DEFINE FULIQ FOPR + FWPR /
 ASSIGN FULIM 30 /
/
WELSPECS
 'I1' 'G' 1  1 1000 'WATER' /
 'P1' 'G' 10 1 1000 'OIL' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 60 1* 400 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
ACTIONX
 'CUTBACK' 1 /
 FWPR > 5 /
/
WCONPROD
 'P1' 'OPEN' 'ORAT' 10 4* 120 /
/
ENDACTIO
TSTEP
 5 10 20 30 30 /
END
"""


def test_expression_evaluator():
    vals = {"FOPR": 100.0, "FWPR": 20.0, "WOPR:P1": 55.0}
    lk = vals.get
    assert evaluate([-3.0, "+", 5.0], lk) == pytest.approx(2.0)
    assert evaluate(["FOPR", "+", "FWPR"], lk) == pytest.approx(120.0)
    assert evaluate(["FOPR", "*", 2.0, ">", 150.0], lk) == 1.0
    assert evaluate(["WOPR", "P1", ">", 50.0, "AND", "FWPR", "<", 30.0],
                    lk) == 1.0
    assert evaluate(["(", "FOPR", "-", "FWPR", ")", "*", 0.5], lk) \
        == pytest.approx(40.0)


def test_actionx_payload_parsed(tmp_path):
    p = tmp_path / "A.DATA"
    p.write_text(DECK)
    deck = read_deck(str(p))
    acts = deck.get("ACTIONX")
    assert len(acts) == 1
    a = acts[0]
    assert str(a.records[0][0]) == "CUTBACK"
    assert len(a.sub) == 1 and a.sub[0].name == "WCONPROD"
    # TSTEP after ENDACTIO is NOT swallowed by the action
    assert deck.get1("TSTEP") is not None


def test_actionx_triggers_cutback(tmp_path):
    p = tmp_path / "A.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    # UDQ evaluated into the summary stream
    assert "FULIQ" in rows[-1]
    assert rows[-1]["FULIQ"] == pytest.approx(
        rows[-1]["FOPR"] + rows[-1]["FWPR"], rel=1e-9)
    # before water breakthrough the well produces on BHP (high rate);
    # once FWPR > 5 the action must cut it back to 10 m3/d oil
    assert rows[0]["WOPR:P1"] > 20.0
    trig = [r for r in rows if r["FWPR"] > 5.0]
    assert trig, "water never broke through — test deck broken"
    assert rows[-1]["WOPR:P1"] == pytest.approx(10.0, rel=2e-2)


# ---------------------------------------------------------------------------
# UDQ function set (reference: opm-common UDQParser; ECLIPSE UDQ manual
# section — scalar + set functions, division, per-well quantities)
# ---------------------------------------------------------------------------


def test_expression_division_and_power():
    lk = {"FOPR": 100.0, "FWPR": 20.0}.get
    assert evaluate(["FOPR", "/", "FWPR"], lk) == pytest.approx(5.0)
    # ECL convention: x / 0 = 0
    assert evaluate(["FOPR", "/", 0.0], lk) == 0.0
    assert evaluate([2.0, "^", 10.0], lk) == pytest.approx(1024.0)
    assert evaluate(["(", "FOPR", "+", "FWPR", ")", "/", 2.0], lk) \
        == pytest.approx(60.0)


def test_scalar_functions():
    lk = {"FOPR": 100.0}.get
    assert evaluate(["SQRT", "(", "FOPR", ")"], lk) == pytest.approx(10.0)
    assert evaluate(["ABS", "(", "-", 3.0, ")"], lk) == pytest.approx(3.0)
    assert evaluate(["LOG", "(", "FOPR", ")"], lk) == pytest.approx(2.0)
    assert evaluate(["LN", "(", "EXP", "(", 2.0, ")", ")"], lk) \
        == pytest.approx(2.0)
    assert evaluate(["NINT", "(", 2.6, ")"], lk) == 3.0


def test_set_functions_over_wells():
    from opm_autodiff_tpu.actions import make_vector_lookup

    row = {"WOPR:P1": 10.0, "WOPR:P2": 40.0, "WOPR:I1": 0.0,
           "FOPR": 50.0}
    lv = make_vector_lookup(row)
    lk = row.get
    assert evaluate(["SUM", "(", "WOPR", ")"], lk, lv) \
        == pytest.approx(50.0)
    assert evaluate(["MAX", "(", "WOPR", ")"], lk, lv) \
        == pytest.approx(40.0)
    assert evaluate(["MIN", "(", "WOPR", "P*", ")"], lk, lv) \
        == pytest.approx(10.0)
    assert evaluate(["AVEA", "(", "WOPR", "P*", ")"], lk, lv) \
        == pytest.approx(25.0)
    assert evaluate(["NORM2", "(", "WOPR", "P*", ")"], lk, lv) \
        == pytest.approx(np.hypot(10.0, 40.0))
    # set function of an empty selection is 0 (never raises)
    assert evaluate(["SUM", "(", "WGOR", ")"], lk, lv) == 0.0


def test_udq_division_lexed_from_deck(tmp_path):
    """'/' inside a DEFINE is division — only the line-final '/'
    terminates the record (io/deck.py read_expr_records)."""
    deck = DECK.replace(
        "UDQ\n DEFINE FULIQ FOPR + FWPR /\n ASSIGN FULIM 30 /\n/",
        "UDQ\n DEFINE FULIQ FOPR + FWPR /\n"
        " DEFINE FUWCT FWPR / (FWPR + FOPR + 1E-20) /\n"
        " DEFINE FUMXO MAX(WOPR 'P*') /\n"
        " DEFINE WUSCL WOPR * 0.5 /\n"
        "/")
    p = tmp_path / "U.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    last = rows[-1]
    assert last["FUWCT"] == pytest.approx(
        last["FWPR"] / (last["FWPR"] + last["FOPR"] + 1e-20), rel=1e-9)
    assert last["FUMXO"] == pytest.approx(last["WOPR:P1"], rel=1e-9)
    # per-well UDQ: one value per well, in the summary stream
    assert last["WUSCL:P1"] == pytest.approx(0.5 * last["WOPR:P1"],
                                             rel=1e-9)
    assert "WUSCL:I1" in last


def test_udq_update_off_freezes(tmp_path):
    deck = DECK.replace(
        "UDQ\n DEFINE FULIQ FOPR + FWPR /\n ASSIGN FULIM 30 /\n/",
        "UDQ\n DEFINE FULIQ FOPR + FWPR /\n"
        " DEFINE FUFRZ FOPR /\n"
        " UPDATE FUFRZ NEXT /\n"
        "/")
    p = tmp_path / "F.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    # FUFRZ froze at its first evaluation; FULIQ keeps tracking
    assert rows[-1]["FUFRZ"] == pytest.approx(rows[0]["FUFRZ"])
    assert rows[-1]["FOPR"] != pytest.approx(rows[0]["FOPR"], rel=1e-3)
    assert rows[-1]["FULIQ"] == pytest.approx(
        rows[-1]["FOPR"] + rows[-1]["FWPR"], rel=1e-9)


def test_actionx_set_function_condition(tmp_path):
    """ACTIONX condition using a set function over the well vector."""
    deck = DECK.replace(" FWPR > 5 /", " SUM(WWPR 'P*') > 5 /")
    p = tmp_path / "S.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    rows = sim.summary.rows
    assert rows[-1]["WOPR:P1"] == pytest.approx(10.0, rel=2e-2)
