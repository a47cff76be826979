"""AMG-grade CPR coarse stage: iteration-count evidence (VERDICT r2 #2).

Done-criterion from the round-2 verdict: on a heterogeneous faulted
corner-point case, (a) CPR with the multilevel coarse stage beats the
fixed-Krylov-coarse CPR measurably, and (b) fault faces do not degrade
it — iteration counts on the faulted grid match the unfaulted
equivalent within ~20%. Reference being matched:
/root/reference/opm/simulators/linalg/amgcpr.hh (the dune-istl AMG
V-cycle as the CPR pressure solve) + PressureTransferPolicy.hpp:47.

Runs in f32 (the production Krylov precision) at the stiff end of the
timestep ladder, where the coarse stage earns its keep.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

NORNE_PVT = "/root/reference/tests/norne_pvt.data"

pytestmark = pytest.mark.skipif(
    not os.path.exists(NORNE_PVT),
    reason="Norne PVT fixture not available")


def _system(fault: bool, dt_days: float):
    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.assembler import assemble_system
    from opm_autodiff_tpu.models.blackoil import (accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.utils.synthetic import norne_class_deck_text

    nx, ny, nz = 24, 25, 30
    path = os.path.join(tempfile.mkdtemp(), "AMGQ.DATA")
    with open(path, "w") as f:
        f.write(norne_class_deck_text(nx, ny, nz,
                                      perm_range=(0.1, 1000.0),
                                      fault=fault))
    state = load_state(path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, faces = statics_from_geometry(geo, structured="never")
    init = equilibrate(state, geo, fs)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref, cells.regs)
    return assemble_system(fs, cells, faces, init, acc0 * 1.01,
                           dt_days * 86400.0)


def _iters(sys_b, precond):
    from opm_autodiff_tpu.solvers.linear import solve_linear

    res = solve_linear(sys_b, tol=1e-2, maxiter=200, precond=precond,
                       dtype=jnp.float32)
    assert bool(res.converged), (precond, int(res.iterations),
                                 float(res.rel_residual))
    return int(res.iterations)


def test_amg_beats_fixed_krylov_and_fault_insensitive():
    sys_f = _system(fault=True, dt_days=365.0)
    it_amg_f = _iters(sys_f, "cpramg")
    it_cpr_f = _iters(sys_f, "cpr")
    it_ilu_f = _iters(sys_f, "ilu0")
    # (a) multilevel coarse beats the fixed-Krylov coarse measurably
    # and the single-level ILU by a wide margin at the stiff dt
    assert it_amg_f <= 0.75 * it_cpr_f, (it_amg_f, it_cpr_f)
    assert it_amg_f <= 0.5 * it_ilu_f, (it_amg_f, it_ilu_f)

    # (b) fault faces ride the hierarchy: same counts as unfaulted
    # within 20% (the COO extras are restricted like the bands)
    sys_u = _system(fault=False, dt_days=365.0)
    it_amg_u = _iters(sys_u, "cpramg")
    assert it_amg_f <= max(1.2 * it_amg_u, it_amg_u + 3), \
        (it_amg_f, it_amg_u)


def test_amg_iters_scale_flat_with_n():
    """O(1)-ish outer iterations as the grid grows (the scalability
    property fixed-iteration Krylov coarse stages lack)."""
    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.assembler import assemble_system
    from opm_autodiff_tpu.models.blackoil import (accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.utils.synthetic import norne_class_deck_text

    counts = []
    for nx, ny, nz in ((12, 13, 15), (24, 25, 30)):
        path = os.path.join(tempfile.mkdtemp(), "SCAL.DATA")
        with open(path, "w") as f:
            f.write(norne_class_deck_text(nx, ny, nz,
                                          perm_range=(0.1, 1000.0)))
        state = load_state(path)
        geo = build_geometry(state)
        fs = FluidSystem.from_state(state)
        cells, faces = statics_from_geometry(geo, structured="never")
        init = equilibrate(state, geo, fs)
        acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0, 0))(
            fs, init.u, init.flag, cells.pore_vol_ref, cells.regs)
        sys_b = assemble_system(fs, cells, faces, init, acc0 * 1.01,
                                365.0 * 86400.0)
        counts.append(_iters(sys_b, "cpramg"))
    # 8x the cells: at most ~2x the iterations (in practice flat)
    assert counts[1] <= 2 * counts[0] + 3, counts
