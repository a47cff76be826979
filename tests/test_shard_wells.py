"""Owner-distributed StandardWell assembly (parallel/shard_wells.py).

Reference parity target: ParallelWellInfo / CommunicateAboveBelow
(opm/simulators/wells/ParallelWellInfo.hpp:40) — a well perforated
across several ranks keeps per-connection work on the cell owner and
reduces only well-sized sums. Here the same locality contract is
expressed with shard_map: the equality tests pin the distributed
assembly to the replicated one, and the HLO test pins the
communication contract (all-reduce of well-sized arrays only, no
all-gather of cell-sized state).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.parallel import make_mesh
from opm_autodiff_tpu.parallel.mesh import cell_sharding
from opm_autodiff_tpu.parallel.shard_wells import (apply_to_residual_dist,
                                                   schur_matvec_dist,
                                                   schur_rhs_dist,
                                                   well4_contributions_dist)
from opm_autodiff_tpu.wells import standard4 as s4

from tests.test_parallel import spanning_well_problem as _span_fix


@pytest.fixture(scope="module")
def span():
    """The test_parallel spanning-well problem (producer perforated in
    all 16 z layers -> every device's slab owns perforations), plus the
    4-DOF well unknowns and the replicated reference assembly."""
    problem = _span_fix.__wrapped__()
    (_state, _geo, fs, cells, _faces, init, ws, _acc0, _pbh) = problem
    xw = s4.init_xw(fs, init.u, init.flag, ws)
    wr_ref = s4.well4_contributions(fs, init.u, init.flag, xw, ws,
                                    regs=cells.regs,
                                    mob_mult=cells.mob_mult)
    return fs, cells, init, ws, xw, wr_ref


def _sharded_state(mesh, init):
    u_sh = jax.device_put(init.u, cell_sharding(mesh, 1))
    flag_sh = jax.device_put(init.flag, cell_sharding(mesh))
    return u_sh, flag_sh


def test_dist_assembly_matches_replicated(span):
    fs, cells, init, ws, xw, wr_ref = span
    assert int(np.asarray(ws.perf_mask).sum(axis=1).max()) == 16
    mesh = make_mesh(8)
    u_sh, flag_sh = _sharded_state(mesh, init)
    regs_sh = jax.device_put(cells.regs, cell_sharding(mesh, 1))
    mob_sh = jax.device_put(cells.mob_mult, cell_sharding(mesh, 1))

    with mesh:
        wr_d = jax.jit(lambda u, f, rg, mm: well4_contributions_dist(
            mesh, fs, u, f, xw, ws, regs=rg, mob_mult=mm))(
            u_sh, flag_sh, regs_sh, mob_sh)
        jax.block_until_ready(wr_d.q_perf)

    np.testing.assert_allclose(np.asarray(wr_d.q_perf),
                               np.asarray(wr_ref.q_perf),
                               rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(np.asarray(wr_d.dq_du),
                               np.asarray(wr_ref.dq_du), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(wr_d.dq_dxw),
                               np.asarray(wr_ref.dq_dxw), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(wr_d.res_well),
                               np.asarray(wr_ref.res_well), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(wr_d.b_blk),
                               np.asarray(wr_ref.b_blk), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(wr_d.d_inv),
                               np.asarray(wr_ref.d_inv), rtol=1e-10)
    # explicit densities agree on REAL perforations (padding perfs are
    # zero in the distributed result, garbage-but-unused replicated)
    m = np.asarray(ws.perf_mask)
    np.testing.assert_allclose(np.asarray(wr_d.rho_conn)[m],
                               np.asarray(wr_ref.rho_conn)[m], rtol=1e-12)


def test_dist_schur_ops_match(span):
    fs, cells, init, ws, xw, wr_ref = span
    mesh = make_mesh(8)
    n = init.u.shape[0]
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((n, 3)))
    res = jnp.asarray(rng.standard_normal((n, 3)))

    y_ref = np.asarray(s4.schur_matvec(wr_ref, ws, x))
    r_ref = np.asarray(s4.apply_to_residual(res, wr_ref, ws))
    c_ref = np.asarray(s4.schur_rhs(res, wr_ref, ws))

    x_sh = jax.device_put(x, cell_sharding(mesh, 1))
    res_sh = jax.device_put(res, cell_sharding(mesh, 1))
    with mesh:
        y_d = jax.jit(lambda v: schur_matvec_dist(mesh, wr_ref, ws, v))(x_sh)
        r_d = jax.jit(lambda v: apply_to_residual_dist(
            mesh, v, wr_ref, ws))(res_sh)
        c_d = jax.jit(lambda v: schur_rhs_dist(mesh, v, wr_ref, ws))(res_sh)
        jax.block_until_ready(y_d)

    np.testing.assert_allclose(np.asarray(y_d), y_ref, rtol=1e-12,
                               atol=1e-18)
    np.testing.assert_allclose(np.asarray(r_d), r_ref, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(c_d), c_ref, rtol=1e-12,
                               atol=1e-18)
    # the distributed outputs stay sharded (no replication round-trip)
    assert len(y_d.sharding.device_set) == 8


def test_newton_iteration_with_dist_wells(span):
    """The full jitted Newton iteration on the 8-device mesh with the
    owner-distributed well coupling active (solvers/newton.py swaps in
    DistWellApi under an active mesh) matches the single-device
    iteration — the same contract as test_parallel's 1-DOF runs, here
    for the 4-DOF flagship path."""
    from opm_autodiff_tpu.parallel import shard_problem
    from opm_autodiff_tpu.parallel.mesh import replicated, use_mesh
    from opm_autodiff_tpu.solvers.newton import (NewtonParams, NewtonState,
                                                 newton_iteration_impl)

    fs, cells, init, ws, xw, _wr = span
    problem = _span_fix.__wrapped__()
    faces, acc0 = problem[4], problem[7]
    params = NewtonParams()
    dt = jnp.asarray(86400.0)

    st = NewtonState(init.u, init.flag, xw[:, 3], ws.ctrl_mode, xw=xw)
    new_st, info, (q1, *_), _ = newton_iteration_impl(
        params, fs, cells, faces, st, ws, acc0, dt)
    u1, cnv1 = np.asarray(new_st.u), np.asarray(info.cnv)

    mesh = make_mesh(8)
    cells_sh, topo_sh, u_sh, flag_sh, acc0_sh = shard_problem(
        mesh, cells, faces, init.u, init.flag, acc0)
    r = replicated(mesh)
    ws_r = jax.tree.map(lambda a: jax.device_put(a, r), ws)
    fs_r = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), r), fs)
    xw_r = jax.device_put(xw, r)
    mode_r = jax.device_put(ws.ctrl_mode, r)

    def fn(u, flag, xw_a, mode, acc0_a):
        st8 = NewtonState(u=u, flag=flag, pbh=xw_a[:, 3],
                          active_mode=mode, xw=xw_a)
        new8, info8, (q, *_), _ = newton_iteration_impl(
            params, fs_r, cells_sh, topo_sh, st8, ws_r, acc0_a, dt)
        return new8.u, q, info8.cnv

    with use_mesh(mesh), mesh:
        u8, q8, cnv8 = jax.jit(fn)(u_sh, flag_sh, xw_r, mode_r, acc0_sh)
        jax.block_until_ready(u8)

    np.testing.assert_allclose(np.asarray(cnv8), cnv1, rtol=1e-5,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(q8), np.asarray(q1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u8), u1, rtol=5e-3)


def test_dist_communication_contract(span):
    """The compiled distributed assembly moves only well-sized
    reductions: all-reduce present (the perf-placement psum), and NO
    all-gather anywhere — cell-sized state never leaves its owner
    (reference: ParallelWellInfo moves per-well vectors, never cell
    fields)."""
    fs, cells, init, ws, xw, wr_ref = span
    mesh = make_mesh(8)
    u_sh, flag_sh = _sharded_state(mesh, init)

    with mesh:
        lowered = jax.jit(lambda u, f: well4_contributions_dist(
            mesh, fs, u, f, xw, ws)).lower(u_sh, flag_sh)
        hlo = lowered.compile().as_text()
    assert "all-reduce" in hlo
    assert "all-gather" not in hlo
    assert "all-to-all" not in hlo
