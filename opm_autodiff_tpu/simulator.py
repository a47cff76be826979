"""Top-level simulator driver (placeholder — filled in as layers land).

Mirrors the reference's SimulatorFullyImplicitBlackoilEbos::run report-step
loop (reference: opm/simulators/flow/SimulatorFullyImplicitBlackoilEbos.hpp:147).
"""

from __future__ import annotations


class Simulator:
    def __init__(self, state):
        self.state = state


def run_deck(path: str):
    raise NotImplementedError("end-to-end driver lands after the solver stack")
