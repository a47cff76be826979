"""Deterministic deferred event log.

Rebuild of the reference's DeferredLogger + gatherDeferredLogger
(opm/simulators/utils/DeferredLogger.hpp, gatherDeferredLogger.cpp):
there, messages generated inside the assembly loop on every MPI rank
are queued and flushed in deterministic rank/tag order on the I/O rank.
In the single-program TPU design nothing runs per-rank, but the same
problem exists in time: events happen inside the jitted device step
where Python logging is impossible. The analog is event DERIVATION —
after each substep the host diffs the device state (control modes,
primary-variable flags) in fixed well/cell order and queues rendered
messages; the driver drains them into the .PRT stream once per report
step. Ordering is deterministic by construction (fixed array order, no
wall-clock interleaving).
"""

from __future__ import annotations

import numpy as np

# inverse of wells/standard._MODE_IDX for rendering
MODE_NAMES = {0: "BHP", 1: "ORAT", 2: "WRAT", 3: "GRAT", 4: "LRAT",
              5: "RATE", 6: "RESV", 7: "THP"}


class DeferredLogger:
    """Queue of (severity, message); drained by the .PRT writer."""

    def __init__(self):
        self.messages: list[tuple[str, str]] = []

    # -- queueing ------------------------------------------------------
    def info(self, msg: str) -> None:
        self.messages.append(("INFO", msg))

    def warning(self, msg: str) -> None:
        self.messages.append(("WARNING", msg))

    def problem(self, msg: str) -> None:
        self.messages.append(("PROBLEM", msg))

    # -- device-state diffs (the "deferred" part) ----------------------
    def log_control_switches(self, names: list[str], mode_old, mode_new,
                             t_days: float) -> None:
        """One line per well whose active control changed over the
        substep (reference: WellInterface updateWellControl's
        'Switching control mode for well' info line)."""
        mo = np.asarray(mode_old)
        mn = np.asarray(mode_new)
        for iw in range(min(len(names), mo.shape[0], mn.shape[0])):
            if mo[iw] != mn[iw]:
                self.info(
                    f"Switching control mode for well {names[iw]} from "
                    f"{MODE_NAMES.get(int(mo[iw]), '?')} to "
                    f"{MODE_NAMES.get(int(mn[iw]), '?')} at day "
                    f"{t_days:.2f}")

    def log_flag_switches(self, flag_old, flag_new, t_days: float) -> None:
        """Aggregate count of primary-variable switches (opm-models'
        per-cell variable switching; logged as a count like the
        reference's 'Switched primary variables' NEWTON_ITER line)."""
        fo = np.asarray(flag_old)
        fn = np.asarray(flag_new)
        n = int((fo != fn).sum())
        if n:
            self.info(f"Primary variables switched in {n} cells at day "
                      f"{t_days:.2f}")

    def log_substep_failure(self, t_days: float, dt_days: float,
                            reason: str) -> None:
        self.warning(f"Substep at day {t_days:.2f} (dt={dt_days:.3f}d) "
                     f"failed: {reason}; chopping")

    def log_well_event(self, msg: str) -> None:
        self.warning(msg)

    # -- draining ------------------------------------------------------
    def drain(self) -> list[str]:
        out = [f"{sev}: {msg}" for sev, msg in self.messages]
        self.messages.clear()
        return out
