"""Gas-water (no oil) runs: the flow_gaswater variant.

Reference: flow/flow_ebos_gaswater.cpp + the SGWFN gas-water saturation
family (opm-common TableManager). Here the variant is one more static
phase mask: every cell lives in the RV state (sg = 1 - sw
structurally), the oil equation is pinned, and the SGWFN / SWFN+SGFN
tables synthesize into the internal SWOF/SGOF banks
(io/state._synthesize_satfam).
"""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.blackoil import FLAG_RV
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

DECK = """RUNSPEC
DIMENS
 10 1 1 /
WATER
GAS
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 10*30 /
DY
 10*30 /
DZ
 10*10 /
TOPS
 10*1500 /
PORO
 10*0.2 /
PERMX
 10*200 /
PROPS
PVTW
 150 1.02 4.0E-5 0.4 0 /
PVDG
 50  0.026 0.014
 150 0.0085 0.016
 250 0.0050 0.019 /
ROCK
 150 4E-5 /
SGWFN
-- Sg    krg    krw    Pcgw
 0.00  0.000  1.000  0.0
 0.20  0.050  0.450  0.0
 0.50  0.320  0.100  0.0
 0.80  0.900  0.000  0.0 /
DENSITY
 1* 1000 0.9 /
SOLUTION
PRESSURE
 10*150 /
SWAT
 5*0.25 5*1.0 /
SUMMARY
FGPR
SCHEDULE
WELSPECS
 'G1' 'G' 1 1 1505 'GAS' /
/
COMPDAT
 'G1' 1 1 1 1 'OPEN' 1* 1* 0.3 /
/
WCONPROD
 'G1' 'OPEN' 'GRAT' 2* 30000 2* 40 /
/
TSTEP
 2 5 10 20 30 /
END
"""


@pytest.fixture(scope="module")
def gw_sim(tmp_path_factory):
    p = tmp_path_factory.mktemp("gw") / "GW.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_gaswater_tables_synthesized(gw_sim):
    state = gw_sim.state
    assert state.props.swof is not None
    assert state.props.sgof is not None
    # krw from the SGWFN KRW column at sw = 1 - sg
    assert state.props.swof[-1, 1] == pytest.approx(1.0)  # sw=1 -> krw=1
    assert np.all(state.props.swof[:, 2] == 0.0)          # krow == 0
    assert np.all(state.props.sgof[:, 2] == 0.0)          # krog == 0


def test_gaswater_runs_in_rv_state(gw_sim):
    sim = gw_sim
    assert not sim.opts.newton.has_oil
    flag = np.asarray(sim.flag)
    u = np.asarray(sim.u)
    # gas-bearing cells ride the RV state; water-swept ones may fall to
    # SG with sg = x3 = 0 (both give so == 0)
    sg = np.where(flag == FLAG_RV, 1.0 - u[:, 1], u[:, 2])
    so = 1.0 - u[:, 1] - sg
    assert np.abs(so).max() < 1e-9
    assert np.isfinite(u).all()


def test_gaswater_production_and_influx(gw_sim):
    sim = gw_sim
    rows = sim.summary.rows
    # the producer delivers gas at (or chopped below) target
    assert rows[0]["FGPR"] > 0
    # depletion: pressure near the producer falls
    u = np.asarray(sim.u)
    assert u[0, 0] < 150e5
    # water encroaches toward the depleted gas zone: total water in the
    # gas half rises
    sw = u[:5, 1]
    assert sw.sum() > 5 * 0.25 - 1e-9


def test_family2_three_phase_synthesis(tmp_path):
    """SWFN/SGFN/SOF3 (family II) on a 3-phase deck synthesizes into
    SWOF/SGOF and reproduces the family-I run (same physics, different
    keyword spelling — the opm-common TableManager unification)."""
    from tests.test_components import BASE

    fam1 = BASE.format(runspec_extra="", props_extra="", sched_extra="")
    # translate the SWOF into family II: SWFN (sw, krw, pcow) +
    # SOF3 (so, krow, krog) + a trivial SGFN (no gas in the deck)
    swof_rows = [
        (0.15, 0.00, 0.90), (0.50, 0.20, 0.30),
        (0.85, 0.60, 0.0), (1.00, 1.00, 0.0)]
    swfn = "\n".join(f" {sw} {krw} 0" for sw, krw, _ in swof_rows)
    sof3 = "\n".join(f" {round(1 - sw, 2)} {krow} {krow}"
                     for sw, _, krow in reversed(swof_rows))
    sgfn = " 0.0 0.0 0\n 0.85 0.85 0"
    fam2 = fam1.replace(
        """SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /""",
        f"SWFN\n{swfn} /\nSGFN\n{sgfn} /\nSOF3\n{sof3} /")
    assert "SWFN" in fam2 and "SWOF" not in fam2

    p1 = tmp_path / "F1.DATA"
    p1.write_text(fam1)
    p2 = tmp_path / "F2.DATA"
    p2.write_text(fam2)
    s1 = Simulator(load_state(str(p1)), SimulatorOptions())
    s1.run()
    s2 = Simulator(load_state(str(p2)), SimulatorOptions())
    s2.run()
    np.testing.assert_allclose(np.asarray(s2.u[:, 0]),
                               np.asarray(s1.u[:, 0]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.u[:, 1]),
                               np.asarray(s1.u[:, 1]), atol=1e-6)


def test_slgof_equals_sgof(tmp_path):
    """SLGOF (liquid-saturation spelling) reproduces the SGOF run."""
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck
    import os

    p1 = os.path.join(str(tmp_path), "SG.DATA")
    write_spe1_deck(p1, 5, 5, 3)
    state1 = load_state(p1)
    sgof = state1.props.sgof

    p2 = os.path.join(str(tmp_path), "SL.DATA")
    write_spe1_deck(p2, 5, 5, 3)
    txt = open(p2).read()
    import re
    m = re.search(r"SGOF\n(.*?)/", txt, re.S)
    rows = [ln.split() for ln in m.group(1).strip().splitlines()]
    sl_rows = [" ".join([f"{1.0 - float(r[0]):.6g}"] + r[1:])
               for r in reversed(rows)]
    txt = txt[:m.start()] + "SLGOF\n" + "\n".join(sl_rows) + " /" \
        + txt[m.end():]
    open(p2, "w").write(txt)
    state2 = load_state(p2)
    np.testing.assert_allclose(state2.props.sgof, sgof, rtol=1e-12)

    s1 = Simulator(state1, SimulatorOptions())
    s1.run()
    s2 = Simulator(state2, SimulatorOptions())
    s2.run()
    np.testing.assert_allclose(np.asarray(s2.u), np.asarray(s1.u),
                               rtol=1e-10)


def test_sof2_stands_in_for_sof3(tmp_path):
    """SOF2 (two-phase oil functions) drives the family-II synthesis on
    an oil-water deck."""
    from tests.test_components import BASE

    fam1 = BASE.format(runspec_extra="", props_extra="", sched_extra="")
    swof_rows = [
        (0.15, 0.00, 0.90), (0.50, 0.20, 0.30),
        (0.85, 0.60, 0.0), (1.00, 1.00, 0.0)]
    swfn = "\n".join(f" {sw} {krw} 0" for sw, krw, _ in swof_rows)
    sof2 = "\n".join(f" {round(1 - sw, 2)} {krow}"
                     for sw, _, krow in reversed(swof_rows))
    sgfn = " 0.0 0.0 0\n 0.85 0.85 0"
    fam2 = fam1.replace(
        """SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /""",
        f"SWFN\n{swfn} /\nSGFN\n{sgfn} /\nSOF2\n{sof2} /")
    p1 = tmp_path / "S2A.DATA"
    p1.write_text(fam1)
    p2 = tmp_path / "S2B.DATA"
    p2.write_text(fam2)
    s1 = Simulator(load_state(str(p1)), SimulatorOptions())
    s1.run()
    s2 = Simulator(load_state(str(p2)), SimulatorOptions())
    s2.run()
    np.testing.assert_allclose(np.asarray(s2.u[:, :2]),
                               np.asarray(s1.u[:, :2]), rtol=1e-6,
                               atol=1e-9)


def test_gaswater_npz_restart_roundtrip(tmp_path):
    """Gas-water runs resume exactly from the npz checkpoint (the RV
    state round-trips)."""
    p = tmp_path / "GWR.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.step()
    ckpt = str(tmp_path / "gw.npz")
    sim.save_restart(ckpt)
    u_mid = np.asarray(sim.u).copy()
    sim.step()
    u_end = np.asarray(sim.u).copy()

    sim2 = Simulator(load_state(str(p)), SimulatorOptions())
    sim2.load_restart(ckpt)
    np.testing.assert_array_equal(np.asarray(sim2.u), u_mid)
    sim2.step()
    np.testing.assert_allclose(np.asarray(sim2.u), u_end,
                               rtol=1e-12, atol=1e-14)
