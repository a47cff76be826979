"""DeferredLogger: deterministic event derivation from device state.

Reference analog: opm/simulators/utils/DeferredLogger.hpp +
gatherDeferredLogger.cpp (queue during assembly, deterministic flush).
Here events are derived on the host from device-state diffs after each
substep (utils/deferred_logger.py).
"""

import numpy as np

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

from tests.test_groups import _WORKOVER_DECK


def test_control_switch_and_workover_events(tmp_path):
    p = tmp_path / "DL.DATA"
    p.write_text(_WORKOVER_DECK.format(workover="CON"))
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    lines = sim.deferred.drain()
    # the WECON workover connection closure is logged
    assert any("closed by WECON workover" in ln for ln in lines)
    # draining empties the queue
    assert sim.deferred.drain() == []


def test_control_switch_logged(tmp_path):
    """A producer driven onto its BHP floor logs the control switch."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(6, 6, 3, tstep_days="5 10 30 60 90")
    # crank the oil target so the producer hits the BHP floor fast
    text = text.replace("'PROD' 'OPEN' 'ORAT' 20000",
                        "'PROD' 'OPEN' 'ORAT' 90000")
    p = tmp_path / "SW.DATA"
    p.write_text(text)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    lines = sim.deferred.drain()
    assert any("Switching control mode for well PROD" in ln
               for ln in lines), lines[:5]
