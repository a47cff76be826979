"""Fully-implicit polymer (4th equation in the block system).

Reference parity target: flow_ebos_polymer.cpp solves polymer inside the
4x4 fully-implicit block system (opm-models blackoilpolymermodules).
VERDICT round-1 item 8 asked for this as the extended-component pilot,
with documented split-vs-implicit deltas; the split transport
(models/components.py) stays the fallback via
SimulatorOptions(polymer_implicit=False).
"""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

from tests.test_components import BASE, POLYMER_PROPS, POLYMER_SCHED


def _run(tmp_path, name, implicit):
    deck = BASE.format(runspec_extra="POLYMER", props_extra=POLYMER_PROPS,
                       sched_extra=POLYMER_SCHED)
    p = tmp_path / f"{name}.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(polymer_implicit=implicit))
    sim.run()
    return sim


def test_implicit_polymer_transport_and_feedback(tmp_path):
    sim = _run(tmp_path, "IMP", implicit=True)
    assert sim.poly is not None
    assert not sim.components.has_polymer  # split path disabled
    c = np.asarray(sim.u[:, 3])
    # transported front: injected 2.0 kg/m3 near the injector, far less
    # at the producer, monotone-ish decay along the 1-D line
    assert c[0] > 0.5
    assert c[-1] < c[0]
    assert np.all(c >= 0.0)
    assert np.all(c <= 1.1 * float(sim.poly.c_max))
    # adsorption accumulated (instantaneous Langmuir equilibrium)
    ads = np.asarray(sim.poly.adsorption(sim.u[:, 3], sim.poly.ads_prev))
    assert float(ads.max()) > 0.0
    # polymer thickens water: the well water-mobility factor < 1 at the
    # injector cell
    f = float(sim.poly.water_mob_factor(sim.u[0, 3], sim.poly.ads_prev[0]))
    assert f < 0.6


def test_implicit_vs_split_deltas(tmp_path):
    """The two formulations agree on the physics (same front, same
    production trend); the implicit one has no operator-splitting lag.
    The asserted envelopes document the expected deltas."""
    imp = _run(tmp_path, "IMPC", implicit=True)
    spl = _run(tmp_path, "SPLC", implicit=False)

    c_imp = np.asarray(imp.u[:, 3])
    c_spl = np.asarray(spl.components.c_poly)
    # same qualitative front; pointwise within a front-width tolerance
    # (the split model lags the mobility feedback by one substep)
    assert abs(float(c_imp[0]) - float(c_spl[0])) < 0.5
    assert np.max(np.abs(c_imp - c_spl)) < 1.0
    # identical trend on production: both see reduced water production
    # vs the polymer-free base (checked in test_components); the two
    # answers agree within 10%
    r_imp = imp.summary.rows[-1]
    r_spl = spl.summary.rows[-1]
    assert abs(r_imp["FWPR"] - r_spl["FWPR"]) <= \
        0.10 * max(r_spl["FWPR"], 1e-12)
    assert abs(r_imp["FOPR"] - r_spl["FOPR"]) <= \
        0.10 * max(abs(r_spl["FOPR"]), 1e-12)


def test_polymer_region_banking(tmp_path):
    """Two PLYVISC regions (TABDIMS NTPVT=2): region 2 thickens water
    4x more — the banked tables give different mobility factors."""
    deck = BASE.format(runspec_extra="POLYMER\nTABDIMS\n 1 2 /",
                       props_extra=POLYMER_PROPS, sched_extra=POLYMER_SCHED)
    # second region tables: PVTW/PVDO/ROCK/DENSITY recycled; PLYVISC
    # gets an explicit much-thicker second region
    deck = deck.replace(
        "PLYVISC\n 0.0  1.0\n 1.0  4.0\n 3.0 10.0 /",
        "PLYVISC\n 0.0  1.0\n 1.0  4.0\n 3.0 10.0 /\n"
        " 0.0  1.0\n 1.0 16.0\n 3.0 40.0 /")
    deck = deck.replace("SOLUTION", "REGIONS\nPVTNUM\n 5*1 5*2 /\nSOLUTION")
    p = tmp_path / "P2R.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(polymer_implicit=True))
    assert sim.poly.visc_c.shape[0] == 2
    sim.run()
    c = np.asarray(sim.u[:, 3])
    assert c[0] > 0.5  # transported
    # at equal concentration the region-2 factor is much smaller
    f1 = float(sim.poly.water_mob_factor(1.0, 0.0, 0))
    f2 = float(sim.poly.water_mob_factor(1.0, 0.0, 1))
    assert f1 == pytest.approx(1 / 4.0 / 1.5, rel=0.3)
    assert f2 < f1 / 3


def test_polymer_summary_vectors(tmp_path):
    """FCIP / FCPR / FCPT summary vectors for implicit polymer runs."""
    sim = _run(tmp_path, "SUMV", implicit=True)
    row = sim.summary.rows[-1]
    assert row["FCIP"] > 0           # polymer in place (free + adsorbed)
    assert row["FCPT"] >= 0          # cumulative produced polymer mass
    # mass balance: injected == in place + produced (within CNV slack)
    inj_rate = 40.0 / 86400.0 * 2.0  # 40 m3/d at 2 kg/m3
    t_days = row["TIME"]
    injected = inj_rate * t_days * 86400.0
    assert row["FCIP"] + row["FCPT"] == pytest.approx(injected, rel=0.05)


def test_polymer_ell_matches_scatter(tmp_path):
    """The gather-only (ELL) 4-equation assembly equals the scatter
    formulation on the polymer system."""
    import jax
    import jax.numpy as jnp

    from opm_autodiff_tpu.models import polymer as pm
    from opm_autodiff_tpu.models.blackoil import PrimaryState

    deck = BASE.format(runspec_extra="POLYMER", props_extra=POLYMER_PROPS,
                       sched_extra=POLYMER_SCHED)
    p = tmp_path / "PELL.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(polymer_implicit=True))
    rng = np.random.default_rng(9)
    u = np.asarray(sim.u).copy()
    u[:, 3] = rng.random(u.shape[0])  # nonzero concentrations
    u = jnp.asarray(u)
    ps = PrimaryState(u, sim.flag)
    acc0 = sim._compute_acc0(u, sim.flag)

    # the simulator routes this fully-active deck onto the BANDED
    # path now; the ELL-vs-scatter comparison targets the face list
    assert sim.facelist.ell_face is not None
    s_ell = pm.assemble_system4(sim.fs, sim.poly, sim.cells, sim.facelist,
                                ps, acc0, 86400.0)
    faces_sc = sim.facelist._replace(ell_face=None, ell_nbr=None,
                                     ell_left=None)
    s_sc = pm.assemble_system4(sim.fs, sim.poly, sim.cells, faces_sc,
                               ps, acc0, 86400.0)
    np.testing.assert_allclose(np.asarray(s_ell.residual),
                               np.asarray(s_sc.residual),
                               rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(np.asarray(s_ell.diag),
                               np.asarray(s_sc.diag),
                               rtol=1e-12, atol=1e-20)


def test_polymer_with_group_control(tmp_path):
    """Implicit polymer under GCONPROD group apportioning (interplay of
    the 4-equation system with the group-control layer)."""
    deck = BASE.format(runspec_extra="POLYMER", props_extra=POLYMER_PROPS,
                       sched_extra=POLYMER_SCHED)
    deck = deck.replace(
        "WELSPECS\n 'I1' 'G' 1 1 1000 'WATER' /\n 'P1' 'G' 10 1 1000 'OIL' /",
        "GRUPTREE\n 'G' 'FIELD' /\n/\n"
        "WELSPECS\n 'I1' 'G' 1 1 1000 'WATER' /\n 'P1' 'G' 10 1 1000 'OIL' /")
    deck = deck.replace(
        "WCONPROD\n 'P1' 'OPEN' 'BHP' 5* 150 /",
        "GCONPROD\n 'G' 'LRAT' 3* 35 /\n/\n"
        "WCONPROD\n 'P1' 'OPEN' 'GRUP' 5* 120 /")
    p = tmp_path / "PGC.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(polymer_implicit=True))
    sim.run()
    c = np.asarray(sim.u[:, 3])
    assert np.isfinite(np.asarray(sim.u)).all()
    assert c[0] > 0.3  # polymer transported under group-driven rates
    row = sim.summary.rows[0]
    liq = row["WOPR:P1"] + row["WWPR:P1"]
    assert liq == pytest.approx(35, rel=0.05)  # group LRAT honored
