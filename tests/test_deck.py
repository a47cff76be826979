"""Deck tokenizer/parser + state builder tests (SPE1 keyword set)."""

import pytest as _pytest

pytestmark = _pytest.mark.smoke


import datetime

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.deck import DEFAULT, read_deck
from opm_autodiff_tpu.io.state import build_state


@pytest.fixture(scope="module")
def deck(spe1_deck_path):
    return read_deck(spe1_deck_path)


@pytest.fixture(scope="module")
def state(deck):
    return build_state(deck)


def test_keywords_present(deck):
    for name in ["DIMENS", "OIL", "GAS", "WATER", "DISGAS", "FIELD", "DX",
                 "PORO", "PVTW", "SWOF", "SGOF", "PVDG", "PVTO", "EQUIL",
                 "WELSPECS", "COMPDAT", "WCONPROD", "WCONINJE", "TSTEP"]:
        assert name in deck, name


def test_repeat_expansion(deck):
    dx = deck.get1("DX").records[0]
    assert len(dx) == 300
    assert all(v == 1000 for v in dx)
    dz = deck.get1("DZ").records[0]
    assert dz[0] == 20 and dz[150] == 30 and dz[250] == 50


def test_default_items(deck):
    compdat = deck.get1("COMPDAT").records
    assert len(compdat) == 2
    prod = compdat[0]
    assert prod[0] == "PROD"
    assert prod[6] is DEFAULT  # 1* sattab
    assert prod[8] == 0.5  # diameter


def test_pvto_records(deck):
    pvto = deck.get1("PVTO")
    # TABLES keywords keep empty records as per-region separators; the
    # closing '/' of the (single) region table is the trailing empty one
    recs = [r for r in pvto.records if r]
    assert len(recs) == 10
    assert pvto.records[-1] == []
    # 1.618 branch has undersaturated points: Rs + 2 (p,Bo,mu) triples
    assert len(recs[-2]) == 1 + 2 * 3
    assert len(recs[-3]) == 1 + 3 * 3
    assert len(recs[-1]) == 1 + 1 * 3


def test_runspec(state):
    rs = state.runspec
    assert rs.cartdims == (10, 10, 3)
    assert rs.phases == frozenset({"OIL", "WATER", "GAS"})
    assert rs.disgas and not rs.vapoil
    assert rs.unit_system.name == "FIELD"
    assert rs.start == datetime.date(2015, 1, 1)


def test_grid_si(state):
    g = state.grid
    assert g.dx.shape == (300,)
    np.testing.assert_allclose(g.dx, 1000 * U.FOOT)
    np.testing.assert_allclose(g.dz[:100], 20 * U.FOOT)
    np.testing.assert_allclose(g.dz[200:], 50 * U.FOOT)
    # depths: layer centers at 8335, 8360, 8400 ft
    np.testing.assert_allclose(g.depth[:100], 8335 * U.FOOT)
    np.testing.assert_allclose(g.depth[100:200], 8360 * U.FOOT)
    np.testing.assert_allclose(g.depth[200:], 8400 * U.FOOT)
    np.testing.assert_allclose(g.permx[:100], 500 * U.MILLIDARCY)
    np.testing.assert_allclose(g.permz[200:], 25 * U.MILLIDARCY)
    assert g.actnum.sum() == 300


def test_props_si(state):
    p = state.props
    assert p.pvtw.p_ref == pytest.approx(4014.7 * U.PSI)
    assert p.pvtw.comp == pytest.approx(3.13e-6 / U.PSI)
    assert p.rock.comp == pytest.approx(3e-6 / U.PSI)
    assert p.density.oil == pytest.approx(49.1 * U.LB_PER_FT3)
    # PVDG: Bg in rb/Mscf -> SI
    assert p.pvdg.shape == (10, 3)
    assert p.pvdg[0, 0] == pytest.approx(14.7 * U.PSI)
    assert p.pvdg[0, 1] == pytest.approx(166.666 * U.STB / U.MSCF)
    # PVTO: 10 branches, monotone Rs
    assert p.pvto.rs.shape == (10,)
    assert np.all(np.diff(p.pvto.rs) > 0)
    assert p.pvto.rs[-3] == pytest.approx(1.270 * U.MSCF / U.STB)
    p_us, bo_us, mu_us = p.pvto.branches[-3]
    assert len(p_us) == 3  # saturated point + 2 undersaturated
    assert bo_us[0] == pytest.approx(1.695 * U.STB / U.STB)
    assert p.sgof.shape == (15, 4)
    assert p.swof.shape == (2, 4)


def test_solution(state):
    eq = state.solution.equil
    assert eq.datum_depth == pytest.approx(8400 * U.FOOT)
    assert eq.datum_pressure == pytest.approx(4800 * U.PSI)
    assert eq.goc_depth == pytest.approx(8200 * U.FOOT)
    assert state.solution.rsvd.shape == (2, 2)


def test_schedule(state):
    sched = state.schedule
    # 16 + 12 + 33 report steps, ~10 years total
    assert len(sched.steps) == 61
    total_days = sched.steps[-1].end_days
    assert total_days == pytest.approx(280 + 12 * 30.4 + 33 * 91.25)
    step0 = sched.steps[0]
    assert step0.end_days - step0.start_days == pytest.approx(1.0)
    wells = {w.name: w for w in step0.wells}
    prod, inj = wells["PROD"], wells["INJ"]
    assert prod.control_mode == "ORAT"
    assert prod.oil_rate == pytest.approx(20000 * U.STB / U.DAY)
    assert prod.bhp_limit == pytest.approx(1000 * U.PSI)
    assert len(prod.completions) == 1
    assert prod.completions[0].k == 2
    assert prod.completions[0].diameter == pytest.approx(0.5 * U.FOOT)
    assert inj.is_injector and inj.inj_phase == "GAS"
    assert inj.inj_rate == pytest.approx(100000 * U.MSCF / U.DAY)
    assert inj.bhp_limit == pytest.approx(9014 * U.PSI)


def test_summary_config(state):
    kws = dict(state.summary.keywords)
    assert "FOPR" in kws
    assert kws["WBHP"] == ["PROD", "INJ"]


def test_keyword_validation_and_diagnostics(tmp_path):
    """KeywordValidation + RelpermDiagnostics messages (reference:
    KeywordValidation.hpp:19; RelpermDiagnostics.cpp)."""
    from opm_autodiff_tpu.io.validation import (relperm_diagnostics,
                                                validate_deck)
    text = (open("tests/data/SPE1CASE1.DATA").read()
            .replace("SCHEDULE", "WPAVE\n 1* /\nTUNING\n /\n /\n /\nSCHEDULE"))
    p = tmp_path / "V.DATA"
    p.write_text(text)
    from opm_autodiff_tpu.io.deck import read_deck
    from opm_autodiff_tpu.io.state import build_state
    d = read_deck(str(p))
    msgs = validate_deck(d)
    assert any("WPAVE" in m and m.startswith("WARN") for m in msgs)
    assert any("TUNING" in m and m.startswith("WARN") for m in msgs)
    st = build_state(d)
    # clean SPE1 tables produce no relperm errors
    diag = relperm_diagnostics(st.props)
    assert not any(m.startswith("ERROR") for m in diag)

    import numpy as np
    bad = dataclasses_replace_tables(st.props)
    diag = relperm_diagnostics(bad)
    assert any("not strictly increasing" in m for m in diag)


def dataclasses_replace_tables(props):
    import copy

    import numpy as np
    bad = copy.deepcopy(props)
    t = np.asarray(bad.swof_regions[0]).copy()
    t[1, 0] = t[0, 0]  # duplicate node
    bad.swof_regions[0] = t
    return bad


def test_native_decklex_matches_python(tmp_path, monkeypatch):
    """The native bulk-number fast path (native/decklex.cpp) must produce
    the same DATA arrays as the Python tokenizer, including repeats,
    comments, and D-exponents."""
    import numpy as np

    from opm_autodiff_tpu.io import decklex
    from opm_autodiff_tpu.io.deck import read_deck

    if not decklex.available():
        import pytest
        pytest.skip("native lexer unavailable")
    text = """RUNSPEC
DIMENS
 3 2 1 /
OIL
GRID
PORO
 0.25 0.30 2*0.1 -- comment inside
 1.5D-1 0.2 /
PERMX
 6*100.0 /
END
"""
    p = tmp_path / "LX.DATA"
    p.write_text(text)
    d_fast = read_deck(str(p))
    monkeypatch.setenv("OPM_TPU_NATIVE_DECKLEX", "0")
    d_py = read_deck(str(p))
    for kw in ("PORO", "PERMX"):
        a = np.asarray(d_fast.get1(kw).records[0], float)
        b = np.asarray(d_py.get1(kw).records[0], float)
        np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(
        np.asarray(d_fast.get1("PORO").records[0], float),
        [0.25, 0.30, 0.1, 0.1, 0.15, 0.2])


def test_native_decklex_falls_back_on_defaults(tmp_path):
    """A DATA body containing defaulted items ('N*') must fall back to
    the Python tokenizer (the native lexer refuses it)."""
    from opm_autodiff_tpu.io.deck import DEFAULT, read_deck

    text = """RUNSPEC
DIMENS
 2 1 1 /
GRID
PORO
 0.25 1* /
END
"""
    p = tmp_path / "LXD.DATA"
    p.write_text(text)
    d = read_deck(str(p))
    rec = d.get1("PORO").records[0]
    assert rec[0] == 0.25
    assert rec[1] is DEFAULT


def test_gravity_converts_to_densities(tmp_path):
    """GRAVITY (API / specific gravities) is the DENSITY alternative."""
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    import os

    p = os.path.join(str(tmp_path), "GR.DATA")
    write_spe1_deck(p, 3, 3, 3)
    txt = open(p).read()
    import re
    txt = re.sub(r"DENSITY\n[^/]*/", "GRAVITY\n 30.0 1.05 0.75 /", txt)
    open(p, "w").write(txt)
    state = load_state(p)
    d = state.props.density
    assert d.oil == pytest.approx(141.5 / 161.5 * 999.014, rel=1e-6)
    assert d.water == pytest.approx(1.05 * 999.014, rel=1e-6)
    assert d.gas == pytest.approx(0.75 * 1.22, rel=1e-6)


def test_pvcdo_synthesizes_pvdo(tmp_path):
    """PVCDO (constant-compressibility dead oil) stands in for PVDO."""
    from opm_autodiff_tpu.io.state import load_state

    import os

    p = os.path.join(str(tmp_path), "PC.DATA")
    from tests.test_components import BASE
    deck = BASE.format(runspec_extra="", props_extra="", sched_extra="")
    deck = deck.replace(
        "PVDO\n 100 1.05 2.0\n 400 1.02 2.0 /",
        "PVCDO\n 200 1.04 1.0E-4 2.0 0.0 /")
    open(p, "w").write(deck)
    state = load_state(p)
    t = state.props.pvdo
    assert t is not None and t.shape[0] >= 100
    # B at reference pressure == B_ref; decreasing in p
    import numpy as np
    bar = 1e5
    b_at_ref = np.interp(200 * bar, t[:, 0], t[:, 1])
    assert b_at_ref == pytest.approx(1.04, rel=1e-4)
    assert t[-1, 1] < t[0, 1]
    # and the deck runs end-to-end
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
    sim = Simulator(state, SimulatorOptions())
    sim.run()
    assert np.isfinite(np.asarray(sim.u)).all()
