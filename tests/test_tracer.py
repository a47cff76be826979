"""Passive tracer transport tests (reference analog: EclTracerModel +
tracer regression decks)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


def _tracer_deck(tmp_path):
    """SPE1-small with a gas-phase tracer injected at INJ."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(6, 6, 3, tstep_days="5 10 20 30 30 60")
    text = text.replace("WELLDIMS\n 2 3 1 2 /",
                        "WELLDIMS\n 2 3 1 2 /\nTRACERS\n 1* 1 1* 1* /")
    text = text.replace("PROPS\n", "PROPS\nTRACER\n 'GT1' 'GAS' /\n/\n", 1)
    text = text.replace(
        "WCONINJE\n", "WTRACER\n 'INJ' 'GT1' 1.0 /\n/\n\nWCONINJE\n", 1)
    p = tmp_path / "TRC.DATA"
    p.write_text(text)
    return str(p)


def test_tracer_injection_front(tmp_path):
    deck = _tracer_deck(tmp_path)
    sim = Simulator(load_state(deck), SimulatorOptions())
    assert sim.tracers.active
    assert sim.tracers.defs[0].name == "GT1"
    assert sim.tracers.defs[0].phase == 2
    c0 = np.asarray(sim.tracers.conc[0])
    np.testing.assert_allclose(c0, 0.0)

    sim.run()
    c = np.asarray(sim.tracers.conc[0])
    inj_cell = sim.geo.act_index(0, 0, 0)
    far_cell = sim.geo.act_index(5, 5, 2)
    # tracer accumulates near the injector, not at the far corner yet
    assert c[inj_cell] > 0.5
    assert c[far_cell] < c[inj_cell]
    assert np.all(c >= 0.0) and np.all(c <= 1.0 + 1e-6)
    # concentration decays monotonically-ish away from the injector along
    # the diagonal (front shape)
    diag_cells = [sim.geo.act_index(i, i, 0) for i in range(6)]
    cd = c[diag_cells]
    assert cd[0] > cd[3]


def test_tracer_mass_bounded_by_injection(tmp_path):
    deck = _tracer_deck(tmp_path)
    sim = Simulator(load_state(deck), SimulatorOptions())
    sim.run()
    total = sim.tracers.totals()["GT1"]
    injected_gas = sim.cum["FGIT"]  # tracer conc 1.0 in injected gas
    produced_gas = sim.cum["FGPT"]
    assert 0 < total <= injected_gas * 1.001
    # most of the injected tracer is still in place (producer far away)
    assert total > 0.3 * (injected_gas - produced_gas)
