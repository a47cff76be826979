"""Whole-substep device Newton loop (solvers/newton.newton_solve_device).

The host loop dispatches one device program per Newton iteration; the
device loop runs the whole substep (inner well solve + iterations +
oscillation relaxation + convergence exit) as one lax.while_loop
program — the reference's all-C++ nonlinear loop has no such host
bubble either (SURVEY.md §1 L4). These tests pin the two loops to the
same answers and iteration budgets."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


def _deck(tmp_path, nx=6, ny=6, nz=3):
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    path = str(tmp_path / "SPE1S.DATA")
    write_spe1_deck(path, nx, ny, nz)
    return path


def _run(path, mode):
    sim = Simulator(load_state(path),
                    SimulatorOptions(newton_device_loop=mode))
    sim.run()
    return sim


def test_device_loop_matches_host_loop(tmp_path):
    path = _deck(tmp_path)
    dev = _run(path, "auto")
    host = _run(path, "never")
    # identical iteration budgets: the loops take the same Newton path
    assert (dev.report.total_newton_iterations
            == host.report.total_newton_iterations)
    assert dev.report.total_substeps == host.report.total_substeps
    np.testing.assert_allclose(np.asarray(dev.u), np.asarray(host.u),
                               rtol=1e-10)
    for k in dev.cum:
        assert dev.cum[k] == pytest.approx(host.cum[k], rel=1e-8, abs=1e-12)


def test_device_loop_on_chopping_deck(tmp_path):
    """A deck that forces substep chops (tight max_iter) behaves the
    same through both loops — the failure path (chop + retry) crosses
    the host/device boundary identically."""
    import dataclasses

    path = _deck(tmp_path)
    sims = []
    for mode in ("auto", "never"):
        opts = SimulatorOptions(newton_device_loop=mode)
        opts.newton = dataclasses.replace(opts.newton, max_iter=4)
        sim = Simulator(load_state(path), opts)
        sim.run()
        sims.append(sim)
    dev, host = sims
    assert dev.report.total_substeps == host.report.total_substeps
    assert (dev.report.total_newton_iterations
            == host.report.total_newton_iterations)
    np.testing.assert_allclose(np.asarray(dev.u), np.asarray(host.u),
                               rtol=1e-10)
