"""Whole-substep device Newton loop (solvers/newton.newton_solve_device).

The host loop dispatches one device program per Newton iteration; the
device loop runs the whole substep (inner well solve + iterations +
oscillation relaxation + convergence exit) as one lax.while_loop
program — the reference's all-C++ nonlinear loop has no such host
bubble either (SURVEY.md §1 L4). These tests pin the two loops to the
same answers and iteration budgets.

Each test body runs in a FRESH SUBPROCESS: the device-loop program is
the largest executable in the suite, and some jaxlib builds segfault
in executable (de)serialization when the persistent compile cache
handles an entry this size from a process that has already compiled
many programs (observed: SIGSEGV under both put_executable_and_time
and get_executable_and_time mid-suite, never in a fresh process).
Subprocess isolation makes the suite robust to that environment bug
without giving up the cache."""

import os
import subprocess
import sys

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

_IN_CHILD = os.environ.get("OPM_TPU_DEVICE_LOOP_CHILD") == "1"


def _run_in_subprocess(test_name):
    env = dict(os.environ, OPM_TPU_DEVICE_LOOP_CHILD="1")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", __file__ + "::" + test_name,
         "-q", "--no-header"],
        capture_output=True, text=True, env=env, timeout=900)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])


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
    if not _IN_CHILD:
        _run_in_subprocess("test_device_loop_matches_host_loop")
        return
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

    if not _IN_CHILD:
        _run_in_subprocess("test_device_loop_on_chopping_deck")
        return
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


def test_group_deck_hybrid_handoff(tmp_path):
    """Group-controlled decks now reach the device loop too (VERDICT r4
    next #4): host iterations run only while the NUPCOL re-apportioning
    is moving, then the substep remainder executes as one device
    program. The hybrid must (a) actually hand off and (b) agree with
    the pure host loop."""
    if not _IN_CHILD:
        _run_in_subprocess("test_group_deck_hybrid_handoff")
        return
    import opm_autodiff_tpu.solvers.newton as newton_mod

    path = _deck(tmp_path)
    txt = open(path).read()
    # group control ACTIVE: ORAT cap below the well target, wells under
    # GRUP control so apportioning has something to move
    txt = txt.replace("WCONPROD\n 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 /",
                      "GCONPROD\n 'G1' 'ORAT' 12000 /\n/\nWCONPROD\n"
                      " 'PROD' 'OPEN' 'GRUP' 5* 1000 /")
    open(path, "w").write(txt)

    calls = {"n": 0}
    real = newton_mod.newton_solve_device

    def spy(*a, **kw):
        if kw.get("prep") is not None:
            calls["n"] += 1
        return real(*a, **kw)

    sims = {}
    # "always" forces the hybrid on the CPU test backend (under "auto"
    # it engages off-CPU only — the handoff exists for the TPU
    # dispatch bubble and the extra compile is pure cost here)
    for mode in ("always", "never"):
        newton_mod.newton_solve_device = spy if mode == "always" else real
        try:
            sims[mode] = _run(path, mode)
        finally:
            newton_mod.newton_solve_device = real
    dev, host = sims["always"], sims["never"]
    assert calls["n"] > 0, "hybrid handoff never fired on a group deck"
    assert dev.report.total_substeps == host.report.total_substeps
    assert (dev.report.total_newton_iterations
            == host.report.total_newton_iterations)
    np.testing.assert_allclose(np.asarray(dev.u), np.asarray(host.u),
                               rtol=1e-8)
    for k in dev.cum:
        assert dev.cum[k] == pytest.approx(host.cum[k], rel=1e-6,
                                           abs=1e-10)
