"""True-IMPES CPR weight tests (reference: getQuasiImpesWeights.hpp:89
getTrueImpesWeights; ISTLSolverEbos.hpp:447 weight selection)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.assembler import assemble_system
from opm_autodiff_tpu.models.blackoil import (PrimaryState, accumulation,
                                              statics_from_geometry)
from opm_autodiff_tpu.models.init import equilibrate
from opm_autodiff_tpu.models.structured import assemble_structured
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.solvers.cpr import trueimpes_weights


@pytest.fixture(scope="module")
def assembled(spe1_deck_path):
    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    init = equilibrate(state, geo, fs)
    cells, topo = statics_from_geometry(geo)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref, cells.regs)
    sys_b = assemble_structured(fs, cells, topo,
                                PrimaryState(init.u, init.flag), acc0,
                                86400.0)
    _, faces = statics_from_geometry(geo, structured="never")
    sys_f = assemble_system(fs, cells, faces,
                            PrimaryState(init.u, init.flag), acc0, 86400.0)
    return fs, init, cells, sys_b, sys_f, acc0


def test_acc_jac_exposed_and_consistent(assembled):
    """Both layouts carry the storage Jacobian, and it matches a direct
    jacfwd of the accumulation term."""
    fs, init, cells, sys_b, sys_f, acc0 = assembled
    assert sys_b.acc_jac is not None and sys_f.acc_jac is not None

    def acc_jac_one(u, f, pv, rg):
        return jax.jacfwd(
            lambda x: accumulation(fs, x, f, pv, rg))(u)

    ref = jax.vmap(acc_jac_one)(init.u, init.flag, cells.pore_vol_ref,
                                cells.regs)
    np.testing.assert_allclose(np.asarray(sys_f.acc_jac), np.asarray(ref),
                               rtol=1e-10)
    # banded path: structured assembly computes it through the packed
    # jets; same storage term, same values
    np.testing.assert_allclose(np.asarray(sys_b.acc_jac), np.asarray(ref),
                               rtol=1e-8, atol=1e-20)


def test_trueimpes_weight_decoupling(assembled):
    """w^T S has (approximately) zero saturation components: the defining
    IMPES property — the weighted equation is pressure-only in the
    storage term. (S e_p scaling makes w^T (S * col_scale) == e_p.)"""
    fs, init, cells, sys_b, sys_f, acc0 = assembled
    s = np.asarray(sys_f.acc_jac)
    w = np.asarray(trueimpes_weights(sys_f.acc_jac))
    scale = np.array([50e5, 1.0, 1.0])
    prod = np.einsum("ni,nij->nj", w, s * scale[None, None, :]) * 1000.0
    # w^T (S scaled) == e_p by construction
    np.testing.assert_allclose(prod[:, 0], 1.0, rtol=1e-8)
    np.testing.assert_allclose(prod[:, 1:], 0.0, atol=1e-10)


def test_cpr_trueimpes_solves(assembled):
    """The cprt/cpramgt preconditioners converge on the SPE1 system."""
    fs, init, cells, sys_b, sys_f, acc0 = assembled
    from opm_autodiff_tpu.solvers.linear import solve_linear

    for sys, name in ((sys_b, "cpramgt"), (sys_f, "cprt")):
        res = solve_linear(sys, tol=1e-4, precond=name)
        assert bool(res.converged), name
        assert int(res.iterations) < 150, name
