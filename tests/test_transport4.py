"""Fully-implicit brine and foam (4th equation in the block system).

Reference parity target: flow_ebos_brine.cpp / flow_ebos_foam.cpp solve
the component inside the 4x4 fully-implicit block system (opm-models
blackoilbrinemodules / blackoilfoammodules). models/transport4.py is
the generic carrier-phase rebuild; the split transport
(models/components.py) stays the fallback via
SimulatorOptions(brine_implicit=False / foam_implicit=False).
"""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

from tests.test_components import (BASE, BRINE_PROPS, BRINE_SCHED,
                                   FOAM_PROPS, FOAM_SCHED, GASFLOOD_SCHED)


def _run_brine(tmp_path, name, implicit, fine_dt=False):
    deck = BASE.format(runspec_extra="BRINE", props_extra=BRINE_PROPS,
                       sched_extra=BRINE_SCHED)
    if fine_dt:
        deck = deck.replace("TSTEP\n 5 10 20 30 /", "TSTEP\n 65*1 /")
    p = tmp_path / f"{name}.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(brine_implicit=implicit))
    sim.run()
    return sim


def _run_foam(tmp_path, name, implicit):
    deck = BASE.format(
        runspec_extra="GAS\nFOAM",
        props_extra=FOAM_PROPS + """PVDG
 100 0.012 0.012
 400 0.003 0.016 /
SGOF
 0.0  0.0  0.90 0
 0.5  0.4  0.20 0
 0.85 0.9  0.0  0 /
""",
        sched_extra=FOAM_SCHED + GASFLOOD_SCHED)
    p = tmp_path / f"{name}.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(foam_implicit=implicit))
    sim.run()
    return sim


def test_implicit_brine_transport_and_viscosity(tmp_path):
    sim = _run_brine(tmp_path, "BRI", implicit=True)
    assert sim.trans4 is not None and sim._trans4_kind == "brine"
    assert not sim.components.has_brine  # split path disabled
    c = np.asarray(sim.u[:, 3])
    # salt front: injected 40 kg/m3 near the injector, gradient toward
    # the producer; bounded by the chop clamp
    assert c[0] > 5.0
    assert c[-1] < c[0]
    assert np.all(c >= 0.0)
    assert np.all(c <= 1.1 * float(sim.trans4.c_max))
    # salty water is thicker: carrier (water) mobility factor < 1
    f = float(sim.trans4.mob_factor(c[0]))
    assert f < 1.0
    # the carrier mask points at water
    assert np.asarray(sim.trans4.phase_mask).tolist() == [1.0, 0.0, 0.0]


def test_implicit_vs_split_brine(tmp_path):
    """Both formulations agree at resolved dt (the split model's
    one-substep viscosity-feedback lag vanishes as dt -> 0 — at the
    coarse 5-30 day schedule it over-produces water by ~80%, which is
    exactly why the fully-implicit coupling is the default)."""
    imp = _run_brine(tmp_path, "BRIC", implicit=True, fine_dt=True)
    spl = _run_brine(tmp_path, "BRSC", implicit=False, fine_dt=True)
    c_imp = np.asarray(imp.u[:, 3])
    c_spl = np.asarray(spl.components.c_salt)
    assert abs(float(c_imp[0]) - float(c_spl[0])) < 5.0
    # both fronts advanced past the midpoint of the 1-D line
    mid = len(c_imp) // 2
    assert c_imp[mid] > 5.0 and c_spl[mid] > 5.0
    # cumulative water production: resolved-dt agreement within 10%
    assert abs(imp.cum["FWPT"] - spl.cum["FWPT"]) <= \
        0.10 * max(spl.cum["FWPT"], 1e-12)
    # and the implicit answer is dt-robust: the coarse schedule lands on
    # the same cumulative
    imp_c = _run_brine(tmp_path, "BRCC", implicit=True)
    assert abs(imp.cum["FWPT"] - imp_c.cum["FWPT"]) <= \
        0.05 * max(imp.cum["FWPT"], 1e-12)
    # absolute anchor for the implicit model: salt is conserved —
    # in-place mass <= injected mass (production takes the rest), and
    # a meaningful fraction of the injected salt is in the domain
    acc = np.asarray(imp._compute_acc0(imp.u, imp.flag))
    in_place = float(acc[:, 3].sum())
    injected = imp.cum["FWIT"] * 40.0  # WSALT 40 kg/m3 on all water
    assert 0.0 < in_place <= injected * 1.01
    assert in_place > 0.3 * injected


def test_implicit_foam_cuts_gas_mobility(tmp_path):
    sim = _run_foam(tmp_path, "FOI", implicit=True)
    assert sim.trans4 is not None and sim._trans4_kind == "foam"
    assert not sim.components.has_foam
    c = np.asarray(sim.u[:, 3])
    # surfactant transported with the injected gas; by the end of the
    # run the front has swept the whole 1-D line, so the profile is
    # near-uniform at the injected 2.0 kg/m3 (no overshoot)
    assert c[0] > 0.05
    assert c[-1] <= c[0] + 1e-3
    assert np.all(c >= 0.0)
    # gas mobility reduction at the injector (FOAMMOB factor < 1)
    f0 = float(sim.trans4.mob_factor(c[0]))
    assert f0 < 0.7
    assert np.asarray(sim.trans4.phase_mask).tolist() == [0.0, 0.0, 1.0]


def test_implicit_vs_split_foam(tmp_path):
    imp = _run_foam(tmp_path, "FOIC", implicit=True)
    spl = _run_foam(tmp_path, "FOSC", implicit=False)
    c_imp = np.asarray(imp.u[:, 3])
    c_spl = np.asarray(spl.components.c_foam)
    # same qualitative front (the split lags the feedback one substep)
    assert abs(float(c_imp[0]) - float(c_spl[0])) < 1.0
    r_imp = imp.summary.rows[-1]
    r_spl = spl.summary.rows[-1]
    assert abs(r_imp["FOPR"] - r_spl["FOPR"]) <= \
        0.15 * max(abs(r_spl["FOPR"]), 1e-12)


def test_msw_deck_falls_back_to_split(tmp_path):
    """A BRINE deck with WELSEGS wells runs end-to-end through the
    operator-split transport (the implicit 4-equation coupling does not
    carry the component through the multisegment well system yet) —
    completing the run beats erroring; the reference runs such decks."""
    from tests.test_msw import MSW_DECK

    deck = MSW_DECK.replace("OIL\nWATER\n", "OIL\nWATER\nBRINE\n")
    deck = deck.replace("PVTW\n 200 1.02 4.0E-5 0.5 0 /\n", """PVTWSALT
 200 0 /
 0  1.02 4.0E-5 0.5 0
 50 1.00 4.0E-5 1.5 0 /
""")
    deck = deck.replace("WCONINJE\n", """WSALT
 'I1' 40 /
/
WCONINJE
""")
    p = tmp_path / "MB.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.trans4 is None          # implicit coupling not engaged
    assert sim.components.has_brine    # split transport owns the salt
    sim.run()
    c = np.asarray(sim.components.c_salt)
    assert c[0] > 5.0                  # salt entered at the injector
    assert np.all(np.isfinite(np.asarray(sim.u)))


def test_brine_polymer_precedence(tmp_path):
    """A POLYMER+BRINE deck keeps polymer implicit (priority) and runs
    brine split — both feedbacks active, no double counting."""
    from tests.test_components import POLYMER_PROPS, POLYMER_SCHED

    deck = BASE.format(runspec_extra="POLYMER\nBRINE",
                       props_extra=POLYMER_PROPS + BRINE_PROPS,
                       sched_extra=POLYMER_SCHED + BRINE_SCHED)
    p = tmp_path / "PB.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.poly is not None
    assert sim.trans4 is None
    assert sim.components.has_brine
    sim.run()
    c_poly = np.asarray(sim.u[:, 3])
    c_salt = np.asarray(sim.components.c_salt)
    assert c_poly[0] > 0.5
    assert c_salt[0] > 5.0
