"""Linear-solver configuration names + JSON property trees
(reference: setupPropertyTree.cpp:36-120, tests/options_flexiblesolver.json)."""

import json

import pytest

from opm_autodiff_tpu.solvers.config import (apply_to_params,
                                             linear_solver_overrides)
from opm_autodiff_tpu.solvers.newton import NewtonParams


def test_canned_names():
    # "ilu0" resolves per layout in _make_precond (zline on banded
    # grids, Chow-Patel block-ILU0 on the BSR path)
    assert linear_solver_overrides("ilu0") == {"linear_precond": "ilu0"}
    for name in ("cpr", "cpr_quasiimpes", "amg"):
        ov = linear_solver_overrides(name)
        assert ov["linear_precond"] == "cpramg"
        assert ov["linear_maxiter"] == 20
    # true-IMPES variants select the storage-Jacobian weights
    for name in ("cprt", "cpr_trueimpes"):
        ov = linear_solver_overrides(name)
        assert ov["linear_precond"] == "cpramgt"
        assert ov["linear_maxiter"] == 20
    assert linear_solver_overrides("jacobi") == {"linear_precond": "jacobi"}


def test_json_file(tmp_path):
    cfg = {"solver": "gmres", "tol": 5e-3, "maxiter": 123,
           "preconditioner": {"type": "ParOverILU0", "relaxation": 1.0}}
    p = tmp_path / "ls.json"
    p.write_text(json.dumps(cfg))
    ov = linear_solver_overrides(str(p))
    assert ov == {"linear_tol": 5e-3, "linear_maxiter": 123,
                  "linear_method": "fgmres", "linear_precond": "ilu0"}
    params = apply_to_params(NewtonParams(), str(p))
    assert params.linear_maxiter == 123
    assert params.linear_precond == "ilu0"


def test_unknown_rejected():
    with pytest.raises(ValueError):
        linear_solver_overrides("umfpack")


def test_configured_solver_runs(spe1_deck_path, tmp_path):
    """End-to-end: the cpr_quasiimpes canned config solves SPE1's first
    step (bicgstab + CPR with the GMG coarse stage)."""
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

    params = apply_to_params(NewtonParams(), "cpr_quasiimpes")
    sim = Simulator(load_state(spe1_deck_path),
                    SimulatorOptions(newton=params))
    sim.step()
    assert sim.summary.rows[-1]["FOPR"] > 0
