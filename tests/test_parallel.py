"""Distributed (multi-device) tests on the virtual 8-device CPU mesh.

The reference's analog is multi-rank mpirun on one host (SURVEY.md §4
tier 2); here: shard the full Newton step over a jax Mesh and require the
result to match the single-device run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.parallel import make_mesh, shard_problem
from opm_autodiff_tpu.parallel.mesh import cell_sharding, replicated
from opm_autodiff_tpu.solvers.newton import (NewtonParams, NewtonState,
                                             newton_iteration_impl)


@pytest.fixture(scope="module")
def problem():
    import __graft_entry__

    # nz = 16 -> 2 z-planes per device on the 8-device mesh
    return __graft_entry__._build_problem(nx=6, ny=5, nz=16)


def _run(problem, mesh=None):
    (_state, _geo, fs, cells, faces, init, ws, acc0, pbh) = problem
    params = NewtonParams()
    dt = jnp.asarray(86400.0)

    if mesh is None:
        st = NewtonState(init.u, init.flag, pbh, ws.ctrl_mode)
        new_st, info, (q_tot, _, _qm, _res), _ = newton_iteration_impl(
            params, fs, cells, faces, st, ws, acc0, dt)
        return np.asarray(new_st.u), np.asarray(q_tot), np.asarray(info.cnv)

    cells_sh, topo_sh, u, flag, acc0_sh = shard_problem(
        mesh, cells, faces, init.u, init.flag, acc0)
    r = replicated(mesh)
    ws_r = jax.tree.map(lambda a: jax.device_put(a, r), ws)
    fs_r = jax.tree.map(lambda a: jax.device_put(jnp.asarray(a), r), fs)
    pbh_r = jax.device_put(pbh, r)
    mode_r = jax.device_put(ws.ctrl_mode, r)

    def fn(u, flag, pbh, mode, acc0):
        st = NewtonState(u=u, flag=flag, pbh=pbh, active_mode=mode)
        new_st, info, (q_tot, _, _qm, _res), _ = newton_iteration_impl(
            params, fs_r, cells_sh, topo_sh, st, ws_r, acc0, dt)
        return new_st.u, q_tot, info.cnv

    with mesh:
        u_new, q_tot, cnv = jax.jit(fn)(u, flag, pbh_r, mode_r, acc0_sh)
        jax.block_until_ready(u_new)
    return np.asarray(u_new), np.asarray(q_tot), np.asarray(cnv)


def test_eight_device_matches_single(problem):
    assert len(jax.devices()) >= 8
    u1, q1, cnv1 = _run(problem, mesh=None)
    mesh = make_mesh(8)
    u8, q8, cnv8 = _run(problem, mesh=mesh)
    # The assembled system and convergence metrics must match to f64
    # reduction-reorder tolerance. The *update* may differ more: the f32
    # Krylov solve stops at a 1e-2 relative reduction, and distributed
    # summation order changes which (equally valid) inexact-Newton step
    # is taken — so the state tolerance is the linear solve tolerance.
    np.testing.assert_allclose(cnv8, cnv1, rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(q8, q1, rtol=1e-5)
    np.testing.assert_allclose(u8, u1, rtol=5e-3)


def test_sharding_layout(problem):
    (_state, _geo, fs, cells, faces, init, ws, acc0, pbh) = problem
    mesh = make_mesh(8)
    cells_sh, topo_sh, u, flag, acc0_sh = shard_problem(
        mesh, cells, faces, init.u, init.flag, acc0)
    # cell arrays are split over 8 devices
    assert len(u.sharding.device_set) == 8
    shard_rows = {s.data.shape[0] for s in u.addressable_shards}
    assert shard_rows == {u.shape[0] // 8}
    # structured bands with even z-planes shard too
    assert len(topo_sh.trans_x.sharding.device_set) == 8


@pytest.fixture(scope="module")
def actnum_problem(tmp_path_factory):
    """ACTNUM (embedded banded) problem for the sharded step."""
    import os
    import tempfile

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.blackoil import (accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck
    from opm_autodiff_tpu.wells import build_wellset

    nx, ny, nz = 6, 5, 16
    path = os.path.join(tempfile.mkdtemp(), "SPE1A.DATA")
    write_spe1_deck(path, nx, ny, nz)
    txt = open(path).read()
    act = np.ones(nx * ny * nz, int)
    for i in (7, 33, 150, 151, 152, 400):
        act[i] = 0
    txt = txt.replace("PROPS", "ACTNUM\n " + " ".join(map(str, act))
                      + " /\n\nPROPS", 1)
    open(path, "w").write(txt)
    state = load_state(path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, faces = statics_from_geometry(geo)
    init = equilibrate(state, geo, fs)
    ws = build_wellset(geo, state.schedule.steps[0].wells)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref)
    pbh = init.u[ws.cell[:, 0], 0] + jnp.where(ws.is_injector, 1e5, -1e5)
    return state, geo, fs, cells, faces, init, ws, acc0, pbh


def test_embedded_topology_shards(actnum_problem):
    """The ACTNUM embedded banded path runs sharded over the mesh and
    matches the single-device iteration."""
    from opm_autodiff_tpu.models.structured import EmbeddedTopology

    assert isinstance(actnum_problem[4], EmbeddedTopology)
    u1, q1, cnv1 = _run(actnum_problem, mesh=None)
    u8, q8, cnv8 = _run(actnum_problem, mesh=make_mesh(8))
    np.testing.assert_allclose(cnv8, cnv1, rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(q8, q1, rtol=1e-5)
    np.testing.assert_allclose(u8, u1, rtol=5e-3)


@pytest.fixture(scope="module")
def spanning_well_problem():
    """Producer perforated through ALL 16 z layers — every device's
    z-slab owns some of the well's perforations. The reference needs
    ParallelWellInfo (above_/below_ perf communication,
    ParallelWellInfo.hpp) for this; in the GSPMD single-program design
    the well arrays are replicated and the perf gathers/scatters into
    the sharded cell arrays compile to collectives. This fixture is the
    evidence that the component is genuinely subsumed, not missing."""
    import os
    import tempfile

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.blackoil import (accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck
    from opm_autodiff_tpu.wells import build_wellset

    nx, ny, nz = 6, 5, 16
    path = os.path.join(tempfile.mkdtemp(), "SPE1W.DATA")
    write_spe1_deck(path, nx, ny, nz)
    txt = open(path).read()
    txt = txt.replace(f"'PROD' {nx} {ny} {nz} {nz} 'OPEN'",
                      f"'PROD' {nx} {ny} 1 {nz} 'OPEN'")
    open(path, "w").write(txt)
    state = load_state(path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, faces = statics_from_geometry(geo)
    init = equilibrate(state, geo, fs)
    ws = build_wellset(geo, state.schedule.steps[0].wells)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref)
    pbh = init.u[ws.cell[:, 0], 0] + jnp.where(ws.is_injector, 1e5, -1e5)
    return state, geo, fs, cells, faces, init, ws, acc0, pbh


def test_distributed_well_spans_all_slabs(spanning_well_problem):
    """A well whose perforations live on every device matches the
    single-device answer (ParallelWellInfo subsumption evidence)."""
    ws = spanning_well_problem[6]
    # the producer really is perforated in all 16 layers
    assert int(np.asarray(ws.perf_mask).sum(axis=1).max()) == 16
    u1, q1, cnv1 = _run(spanning_well_problem, mesh=None)
    u8, q8, cnv8 = _run(spanning_well_problem, mesh=make_mesh(8))
    np.testing.assert_allclose(cnv8, cnv1, rtol=1e-5, atol=1e-12)
    np.testing.assert_allclose(q8, q1, rtol=1e-5)
    np.testing.assert_allclose(u8, u1, rtol=5e-3)


def test_ell_matvec_sharded(problem):
    """The gather-only (ELL) BSR SpMV runs under GSPMD sharding and
    matches the single-device result (cross-slab neighbor gathers
    compile to collectives)."""
    import jax

    from opm_autodiff_tpu.models.assembler import (assemble_system,
                                                   bsr_matvec)
    from opm_autodiff_tpu.models.blackoil import (PrimaryState,
                                                  statics_from_geometry)

    (state, geo, fs, cells, _faces, init, _ws, acc0, _pbh) = problem
    _, faces = statics_from_geometry(geo, structured="never")
    assert faces.ell_face is not None
    sys_ = assemble_system(fs, cells, faces,
                           PrimaryState(init.u, init.flag), acc0, 86400.0)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(sys_.residual.shape))
    y_ref = np.asarray(bsr_matvec(sys_, x))

    mesh = make_mesh(8)
    x_sh = jax.device_put(x, cell_sharding(mesh, 1))
    with mesh:
        y_sh = jax.jit(lambda v: bsr_matvec(sys_, v))(x_sh)
        jax.block_until_ready(y_sh)
    np.testing.assert_allclose(np.asarray(y_sh), y_ref, rtol=1e-12)


# ---------------------------------------------------------------------------
# 2-D (z, y) mesh prototype: areal+vertical decomposition (VERDICT r2 #9)
# ---------------------------------------------------------------------------


def test_mesh2_banded_spmv_matches_single():
    """Banded SpMV sharded over a 2-D (z, y) mesh equals the
    single-device result; GSPMD lowers the y/z band shifts to
    collective-permutes on both mesh axes."""
    import __graft_entry__
    from opm_autodiff_tpu.models.blackoil import statics_from_geometry
    from opm_autodiff_tpu.models.structured import (assemble_structured,
                                                    structured_matvec)
    from opm_autodiff_tpu.parallel.mesh import banded_sharding2, make_mesh2

    (_s, _g, fs, cells, topo, init, _ws, acc0, _p) = (
        __graft_entry__._build_problem(nx=6, ny=8, nz=4))
    sys_s = assemble_structured(fs, cells, topo, init, acc0, 86400.0)
    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (init.u.shape[0], 3)))
    y_ref = np.asarray(structured_matvec(sys_s, x))

    mesh = make_mesh2(2, 4)
    nz, ny, nxm = sys_s.x_lr.shape[:3]
    nx = nxm + 1
    sh2 = banded_sharding2(mesh)

    def put_band(a):
        # bands with full z/y planes shard on both axes; the y/z bands
        # have ny-1 / nz-1 leading planes -> replicate those
        if a is None:
            return None
        if a.ndim >= 2 and a.shape[0] % 2 == 0 and a.shape[1] % 4 == 0:
            return jax.device_put(a, banded_sharding2(
                mesh, extra_dims=a.ndim - 3))
        return jax.device_put(a, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec()))

    sys_sh = jax.tree.map(put_band, sys_s)
    x3 = x.reshape(nz, ny, nx, 3)
    x3_sh = jax.device_put(x3, banded_sharding2(mesh, extra_dims=1))

    @jax.jit
    def mv(s, x3v):
        return structured_matvec(s, x3v.reshape(-1, 3))

    with mesh:
        y2 = np.asarray(mv(sys_sh, x3_sh))
    np.testing.assert_allclose(y2, y_ref, rtol=1e-12, atol=1e-12)


def test_weak_scaling_collective_budget():
    """Collective budget at scale (VERDICT r2 #7): a ~100k-cell sharded
    Newton iteration compiles to O(1) halo collective-permutes plus
    O(Krylov-iteration) all-reduces — communication does not grow with
    problem size, only with solver iterations. Executes one real step
    and checks per-slab work balance."""
    import __graft_entry__
    from opm_autodiff_tpu.parallel.mesh import use_mesh

    # 32 x 32 x 96 = 98,304 cells over 8 z-slabs
    (_s, _g, fs, cells, topo, init, ws, acc0, pbh) = (
        __graft_entry__._build_problem(nx=32, ny=32, nz=96))
    mesh = make_mesh(8)
    cells_sh, topo_sh, u, flag, acc0_sh = shard_problem(
        mesh, cells, topo, init.u, init.flag, acc0)
    r = replicated(mesh)
    ws_r = jax.tree.map(lambda a: jax.device_put(a, r), ws)
    pbh_r = jax.device_put(pbh, r)
    mode_r = jax.device_put(ws.ctrl_mode, r)
    params = NewtonParams()

    def fn(u, flag, pbh, mode, acc0):
        st = NewtonState(u=u, flag=flag, pbh=pbh, active_mode=mode)
        new_st, info, _q, _qa = newton_iteration_impl(
            params, fs, cells_sh, topo_sh, st, ws_r, acc0, 86400.0)
        return new_st.u, info.cnv, info.linear_iters

    with use_mesh(None), mesh:  # pure GSPMD path (no shard_map kernels)
        jitted = jax.jit(fn)
        lowered = jitted.lower(u, flag, pbh_r, mode_r, acc0_sh)
        compiled = lowered.compile()
        hlo = compiled.as_text()
        n_cp = hlo.count("collective-permute(")
        n_ar = hlo.count("all-reduce(") + hlo.count("all-reduce-start(")
        # halo exchanges: a fixed handful per iteration (assembly z-shift
        # + SpMV/preconditioner shifts inside the Krylov while-loop body
        # — the loop body appears ONCE in the HLO), never O(cells)
        assert 0 < n_cp < 64, n_cp
        # all-reduces: Krylov dots + convergence norms, a fixed count in
        # the HLO text (the while loop re-executes them, the TEXT stays
        # constant-size)
        assert 0 < n_ar < 96, n_ar
        out_u, cnv, lin_iters = jitted(u, flag, pbh_r, mode_r, acc0_sh)
        assert bool(jnp.all(jnp.isfinite(out_u)))
        assert int(lin_iters) < 200
    # per-slab work balance: fully-active grid, equal slabs
    from opm_autodiff_tpu.parallel.mesh import partition_report

    rep = partition_report(mesh, np.ones(u.shape[0], bool))
    assert "imbalance=1.000" in rep
