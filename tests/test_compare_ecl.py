"""compareECL-style comparator (tools/compare_ecl.py) — the regression
contract of SURVEY.md §4 (tolerances compareECLFiles.cmake:198-200)."""

import numpy as np
import pytest

from opm_autodiff_tpu.tools.compare_ecl import compare, load_summary


def test_identical_pass():
    a = {"TIME": np.arange(5.0), "FOPR": np.array([1e4, 9e3, 8e3, 7e3, 6e3])}
    assert compare(a, dict(a), 2e-2, 1e-5) == []


def test_deviation_detected():
    a = {"TIME": np.arange(5.0), "FOPR": np.array([1e4, 9e3, 8e3, 7e3, 6e3])}
    b = {"TIME": np.arange(5.0), "FOPR": a["FOPR"] * 1.01}
    msgs = compare(a, b, 2e-2, 1e-5)
    assert len(msgs) == 1 and "FOPR" in msgs[0]


def test_time_alignment():
    """Different substep counts align through TIME interpolation."""
    a = {"TIME": np.array([1.0, 2, 3, 4]), "FOPR": np.array([4., 3, 2, 1])}
    b = {"TIME": np.array([1.0, 1.5, 2, 3, 3.5, 4]),
         "FOPR": np.array([4.0, 3.5, 3, 2, 1.5, 1])}
    assert compare(a, b, 1e-6, 1e-9) == []


def test_roundtrip_against_own_output(tmp_path, spe1_deck_path):
    """Write SMSPEC/UNSMRY from a short run, read them back, compare
    against the in-memory rows: exact match."""
    from opm_autodiff_tpu.io.eclbinary import write_summary_files
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

    sim = Simulator(load_state(spe1_deck_path), SimulatorOptions())
    sim.step()
    sim.step()
    state = sim.state
    base = str(tmp_path / "CASE")
    write_summary_files(base, sim.summary.rows, state.cartdims,
                        state.runspec.start, state.runspec.unit_system.name)
    disk = load_summary(base)
    mem = {k: np.asarray([r.get(k, 0.0) for r in sim.summary.rows])
           for k in sim.summary.rows[0]}
    msgs = compare(mem, disk, 1e-4, 1e-5)
    assert msgs == [], msgs
