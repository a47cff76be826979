"""Drift compensation (reference: EnableDriftCompensation,
EclProblem::source drift handling eclproblem.hh:1848-1874): the leftover
converged residual re-enters as a source so relaxed tolerances don't
accumulate material-balance drift."""

import jax
import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.blackoil import accumulation
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


def _mb_error(sim):
    """|change of oil in place + cumulative production| / initial."""
    acc = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        sim.fs, sim.u, sim.flag, sim.cells.pore_vol_ref)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        sim.fs, sim.init_u, sim.init_flag, sim.cells.pore_vol_ref)
    d_oil = float(np.asarray(acc[:, 1].sum() - acc0[:, 1].sum()))
    import opm_autodiff_tpu.units as U
    fopt_si = sim.cum["FOPT"]
    return abs(d_oil + fopt_si) / float(np.asarray(acc0[:, 1].sum()))


@pytest.mark.parametrize("drift", [True, False])
def test_runs_with_and_without(spe1_deck_path, drift):
    sim = Simulator(load_state(spe1_deck_path),
                    SimulatorOptions(drift_compensation=drift))
    sim.init_u, sim.init_flag = sim.u, sim.flag
    for _ in range(6):
        sim.step()
    assert sim.summary.rows[-1]["FOPR"] > 0
    # oil balance closes well in both modes at SPE1 scale
    assert _mb_error(sim) < 5e-4
