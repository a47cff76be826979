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
