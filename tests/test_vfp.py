"""VFP table tests (reference analog: tests/test_vfpproperties.cpp)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.deck import read_deck
from opm_autodiff_tpu.io.state import build_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
from opm_autodiff_tpu.wells.vfp import VfpBank, bank_bhp, parse_vfpprod

VFP_TEXT = """VFPPROD
-- num datum flo wfr gfr pres alq
 1 8400 'OIL' 'WOR' 'GOR' 'THP' ' ' 'FIELD' 'BHP' /
-- flo axis (stb/d)
 1000 5000 10000 /
-- thp axis (psia)
 200 500 /
-- wfr axis
 0.0 1.0 /
-- gfr axis
 1.0 5.0 /
-- alq axis
 0.0 /
-- body: thp_idx wfr_idx gfr_idx alq_idx bhp(flo...)
 1 1 1 1 1500 1800 2100 /
 1 1 2 1 1200 1400 1600 /
 1 2 1 1 1700 2000 2300 /
 1 2 2 1 1400 1600 1800 /
 2 1 1 1 1900 2200 2500 /
 2 1 2 1 1600 1800 2000 /
 2 2 1 1 2100 2400 2700 /
 2 2 2 1 1800 2000 2200 /
/
"""


def _table():
    deck = read_deck_text(VFP_TEXT)
    kw = deck.get1("VFPPROD")
    return parse_vfpprod(kw.records, U.FIELD)


def read_deck_text(text):
    import os
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "VFP.DATA")
    open(p, "w").write("SCHEDULE\n" + text + "END\n")
    return read_deck(p)


def test_parse_vfpprod():
    t = _table()
    assert t.table_num == 1
    assert t.flo_type == "OIL" and t.wfr_type == "WOR" and t.gfr_type == "GOR"
    assert t.flo.shape == (3,)
    np.testing.assert_allclose(np.asarray(t.flo) / (U.STB / U.DAY),
                               [1000, 5000, 10000])
    assert t.bhp.shape == (2, 2, 2, 1, 3)
    # node value: thp=200, wfr=0, gfr=1, flo=5000 -> 1800 psia
    assert float(t.bhp[0, 0, 0, 0, 1]) / U.PSI == pytest.approx(1800)


def test_interpolation_at_nodes_and_between():
    t = _table()
    # exact node
    bhp = t.eval_bhp(5000 * U.STB / U.DAY, 200 * U.PSI, 0.0,
                     1.0 * U.MSCF / U.STB)
    assert float(bhp) / U.PSI == pytest.approx(1800)
    # midpoint in flo between 1800 and 2100
    bhp = t.eval_bhp(7500 * U.STB / U.DAY, 200 * U.PSI, 0.0,
                     1.0 * U.MSCF / U.STB)
    assert float(bhp) / U.PSI == pytest.approx(1950)
    # clamped beyond the flo axis
    bhp = t.eval_bhp(50000 * U.STB / U.DAY, 200 * U.PSI, 0.0,
                     1.0 * U.MSCF / U.STB)
    assert float(bhp) / U.PSI == pytest.approx(2100)
    # thp interpolation
    bhp = t.eval_bhp(1000 * U.STB / U.DAY, 350 * U.PSI, 0.0,
                     1.0 * U.MSCF / U.STB)
    assert float(bhp) / U.PSI == pytest.approx(0.5 * (1500 + 1900))


def test_bank_matches_single_table():
    t = _table()
    bank = VfpBank.from_tables([t])
    prod = jnp.asarray([0.0, 7500 * U.STB / U.DAY,
                        7500 * U.STB / U.DAY * 1.0 * U.MSCF / U.STB])
    b = bank_bhp(bank, jnp.asarray(0), jnp.asarray(200 * U.PSI), prod)
    ref = t.eval_bhp(7500 * U.STB / U.DAY, 200 * U.PSI, 0.0,
                     1.0 * U.MSCF / U.STB)
    assert float(b) == pytest.approx(float(ref), rel=1e-12)
    # missing table -> 0
    assert float(bank_bhp(bank, jnp.asarray(-1), jnp.asarray(1e6),
                          prod)) == 0.0


def test_thp_controlled_well(tmp_path):
    """End-to-end: producer under THP control holds pbh = VFP(thp, rates)."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(6, 6, 3, tstep_days="2 5 10")
    text = text.replace("SCHEDULE\n", "SCHEDULE\n" + VFP_TEXT, 1)
    text = text.replace(" 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 /",
                        " 'PROD' 'OPEN' 'THP' 5* 1000 500 1 /")
    p = tmp_path / "THP.DATA"
    p.write_text(text)
    sim = Simulator(build_state(read_deck(str(p))), SimulatorOptions())
    assert sim.vfp_bank is not None
    wells = {w.name: w for w in sim.state.schedule.steps[0].wells}
    assert wells["PROD"].control_mode == "THP"
    assert wells["PROD"].vfp_table == 1
    sim.step()
    r = sim.summary.rows[-1]
    # pbh must equal the VFP bhp at the produced rates and thp=500 psia
    prod = jnp.asarray([r["WWPR:PROD"] * U.STB / U.DAY,
                        r["WOPR:PROD"] * U.STB / U.DAY,
                        r["WGPR:PROD"] * U.MSCF / U.DAY])
    expected = bank_bhp(sim.vfp_bank, jnp.asarray(0),
                        jnp.asarray(500 * U.PSI), prod)
    assert r["WBHP:PROD"] == pytest.approx(float(expected) / U.PSI, rel=1e-3)
    assert r["WOPR:PROD"] > 0


VFPINJ_TEXT = """VFPINJ
-- num datum flo pres units bhp
 5 8400 'WAT' 'THP' 'FIELD' 'BHP' /
-- flo axis (stb/d)
 500 2000 8000 /
-- thp axis (psia)
 500 1000 /
 1 2000 2400 3400 /
 2 2600 3000 4000 /
"""


def test_parse_vfpinj_and_bank():
    from opm_autodiff_tpu.wells.vfp import (VfpInjBank, bank_inj_bhp,
                                            parse_vfpinj)
    deck = read_deck_text(VFPINJ_TEXT)
    kw = deck.get1("VFPINJ")
    t = parse_vfpinj(kw.records, U.FIELD)
    assert t.table_num == 5
    assert t.flo_type == "WAT"
    assert t.bhp.shape == (2, 3)
    assert float(t.bhp[0, 1]) / U.PSI == pytest.approx(2400)

    bank = VfpInjBank.from_tables([t])
    # node hit
    v = float(bank_inj_bhp(bank, 0, 500 * U.PSI, 2000 * U.STB / U.DAY))
    assert v / U.PSI == pytest.approx(2400)
    # interpolation between thp rows and flo columns
    v = float(bank_inj_bhp(bank, 0, 750 * U.PSI, 5000 * U.STB / U.DAY))
    assert 2400 < v / U.PSI < 3700
    # missing table index -> 0
    assert float(bank_inj_bhp(bank, -1, 500 * U.PSI, 0.0)) == 0.0


def test_printvfp_tool(tmp_path, capsys):
    """examples/printvfp.cpp analog: dumps a BHP(rate, thp) grid."""
    p = tmp_path / "V.DATA"
    p.write_text("RUNSPEC\nFIELD\nSCHEDULE\n" + VFP_TEXT + "END\n")
    from opm_autodiff_tpu.tools.printvfp import main as printvfp
    printvfp([str(p), "--n", "3"])
    out = capsys.readouterr().out
    lines = out.strip().splitlines()
    assert lines[0].startswith("-- table 1")
    assert len(lines) == 5  # header + axis row + 3 rate rows... 
