"""4-DOF StandardWell tests (reference analog: tests/test_wellmodel.cpp).

Covers: primary-variable init round-trip, perf-rate consistency with the
1-DOF model in plain producing/injecting conditions, Jacobians vs finite
differences, Schur-complement algebra, the inner well solve hitting rate
targets, chopped updates keeping fractions physical, and crossflow
composition (injecting perf of a producer pushes the wellbore mixture).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.init import equilibrate
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.wells import build_wellset
from opm_autodiff_tpu.wells import standard4 as s4
from opm_autodiff_tpu.wells.standard import (CTRL_BHP, CTRL_ORAT, CTRL_RATE,
                                             well_contributions)


@pytest.fixture(scope="module")
def setup(spe1_deck_path):
    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    init = equilibrate(state, geo, fs)
    ws = build_wellset(geo, state.schedule.steps[0].wells)
    names = [w.name for w in state.schedule.steps[0].wells]
    return state, geo, fs, init, ws, names


def test_init_xw_roundtrip(setup):
    state, geo, fs, init, ws, names = setup
    q = jnp.array([[-0.01, -0.02, -2.0],        # producer w/o/g
                   [0.0, 0.0, 0.05]])           # gas injector
    xw = s4.init_xw(fs, init.u, init.flag, ws, q_rates=q)
    back = s4.xw_surface_rates(xw, ws)
    iprod = names.index("PROD")
    iinj = names.index("INJ")
    np.testing.assert_allclose(np.asarray(back)[iprod],
                               np.asarray(q)[iprod], rtol=1e-12)
    np.testing.assert_allclose(np.asarray(back)[iinj],
                               np.asarray(q)[iinj], atol=1e-15)


def test_perf_rates_match_1dof_producer(setup):
    """With the same bhp, the 4-DOF producing-perf rates equal the 1-DOF
    model's (both implement per-phase Darcy + Rs transfer)."""
    state, geo, fs, init, ws, names = setup
    iprod = names.index("PROD")
    pbh = init.u[ws.cell[:, 0], 0] - 50 * U.PSI
    wr1 = well_contributions(fs, init.u, init.flag, pbh, ws)
    xw = s4.init_xw(fs, init.u, init.flag, ws, pbh=pbh)
    wr4 = s4.well4_contributions(fs, init.u, init.flag, xw, ws)
    q1 = np.asarray(wr1.q_perf.sum(axis=1))
    q4 = np.asarray(wr4.q_perf.sum(axis=1))
    # oil+gas rates agree; the 1-DOF model uses per-phase pressures for
    # drawdown while the reference (and std4) uses the oil pressure —
    # identical here because SPE1 has zero capillary pressure
    np.testing.assert_allclose(q4[iprod], q1[iprod], rtol=1e-10)


def test_well_res_jacobian_vs_fd(setup):
    state, geo, fs, init, ws, names = setup
    pbh = init.u[ws.cell[:, 0], 0] - 30 * U.PSI
    xw = s4.init_xw(fs, init.u, init.flag, ws, pbh=pbh)
    dt = 86400.0

    def res_of_xw(xw_flat):
        wr = s4.well4_contributions(fs, init.u, init.flag,
                                    xw_flat.reshape(xw.shape), ws, dt=dt,
                                    f0=jnp.zeros((ws.num_wells, 3)))
        return wr.res_well

    wr = s4.well4_contributions(fs, init.u, init.flag, xw, ws, dt=dt,
                                f0=jnp.zeros((ws.num_wells, 3)))
    # D = d res / d xw: compare the assembled D (recovered via inv) to FD
    d_assembled = np.linalg.inv(np.asarray(wr.d_inv))
    for w in range(ws.num_wells):
        for k in range(4):
            h = max(abs(float(xw[w, k])) * 1e-6, 1e-7)
            xp = xw.at[w, k].add(h)
            xm = xw.at[w, k].add(-h)
            rp = np.asarray(res_of_xw(xp.reshape(-1)))
            rm = np.asarray(res_of_xw(xm.reshape(-1)))
            fd = (rp[w] - rm[w]) / (2 * h)
            # FD roundoff floor: residual entries are O(|res|), central
            # differences carry ~eps*|res|/h of cancellation noise
            noise = 1e-14 * np.abs([rp[w], rm[w]]).max() / h + 1e-12
            np.testing.assert_allclose(d_assembled[w, :, k], fd,
                                       rtol=2e-4, atol=noise)


def test_schur_complement_algebra(setup):
    """Eliminating xw by hand matches schur_matvec/schur_rhs/recover."""
    state, geo, fs, init, ws, names = setup
    pbh = init.u[ws.cell[:, 0], 0] - 30 * U.PSI
    xw = s4.init_xw(fs, init.u, init.flag, ws, pbh=pbh)
    wr = s4.well4_contributions(fs, init.u, init.flag, xw, ws)
    n = init.u.shape[0]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 3)))

    y = np.asarray(s4.schur_matvec(wr, ws, x))
    # hand: per well, y_cells -= C D^-1 B x with C = -dq_dxw scatter
    y_ref = np.zeros((n, 3))
    B = np.asarray(wr.b_blk)
    C = -np.asarray(wr.dq_dxw)
    Dinv = np.asarray(wr.d_inv)
    cells = np.asarray(ws.cell)
    xnp = np.asarray(x)
    for w in range(ws.num_wells):
        bx = np.zeros(4)
        for p in range(ws.max_perfs):
            bx += B[w, p] @ xnp[cells[w, p]]
        coef = Dinv[w] @ bx
        for p in range(ws.max_perfs):
            y_ref[cells[w, p]] -= C[w, p] @ coef
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-18)

    dx = jnp.asarray(rng.normal(size=(n, 3)))
    dxw = np.asarray(s4.recover_xw_update(wr, ws, dx))
    for w in range(ws.num_wells):
        bdx = np.zeros(4)
        for p in range(ws.max_perfs):
            bdx += B[w, p] @ np.asarray(dx)[cells[w, p]]
        ref = -Dinv[w] @ (np.asarray(wr.res_well)[w] + bdx)
        np.testing.assert_allclose(dxw[w], ref, rtol=1e-12)


def test_inner_solve_hits_targets(setup):
    """solve_well_eq drives the producer to its ORAT target and the
    injector to its RATE target with the reservoir frozen."""
    state, geo, fs, init, ws, names = setup
    iprod = names.index("PROD")
    iinj = names.index("INJ")
    xw0 = s4.init_xw(fs, init.u, init.flag, ws)
    xw = s4.solve_well_eq(fs, init.u, init.flag, xw0, ws)
    q = np.asarray(s4.xw_surface_rates(xw, ws))
    wr = s4.well4_contributions(fs, init.u, init.flag, xw, ws)
    # control eqs satisfied
    assert abs(float(wr.res_well[iprod, 3])) < 1e-6 * float(ws.orat[iprod])
    assert abs(float(wr.res_well[iinj, 3])) < 1e-6 * float(ws.inj_rate[iinj])
    # producer oil rate == target (negative into cell)
    assert -q[iprod, 1] == pytest.approx(float(ws.orat[iprod]), rel=1e-5)
    assert q[iinj].sum() == pytest.approx(float(ws.inj_rate[iinj]), rel=1e-5)
    # conservation rows: pvar rates match summed perf rates
    sum_q = np.asarray(wr.q_perf.sum(axis=1))
    np.testing.assert_allclose(sum_q[iprod], q[iprod],
                               rtol=1e-4, atol=1e-10)


def test_chop_keeps_fractions_physical(setup):
    state, geo, fs, init, ws, names = setup
    xw = jnp.array([[-0.05, 0.3, 0.4, 2.0e7],
                    [0.05, 0.0, 1.0, 3.5e7]])
    dxw = jnp.array([[0.1, 0.9, -0.9, 1.0e8],
                     [-0.2, 0.5, 0.5, -5.0e7]])
    out = np.asarray(s4.chop_xw_update(xw, dxw, ws))
    f_w, f_g = out[:, 1], out[:, 2]
    assert (f_w >= -1e-12).all() and (f_g >= -1e-12).all()
    assert (f_w + f_g <= 1.0 + 1e-9).all()
    assert (out[:, 3] >= 1e5).all()


def test_crossflow_injects_wellbore_mixture(setup):
    """A producer perf with bhp above cell pressure injects the wellbore
    surface mixture (cmix from the primary variables), not cell fluid."""
    state, geo, fs, init, ws, names = setup
    iprod = names.index("PROD")
    # raise bhp far above the cell pressure -> injecting perforation
    pbh = init.u[ws.cell[:, 0], 0] + 500 * U.PSI
    xw = s4.init_xw(fs, init.u, init.flag, ws, pbh=pbh,
                    q_rates=jnp.array([[-0.01, -0.01, -1.0],
                                       [0.0, 0.0, 0.05]]))
    wr = s4.well4_contributions(fs, init.u, init.flag, xw, ws)
    q = np.asarray(wr.q_perf.sum(axis=1))
    # all three components flow INTO the cell in the wellbore proportions
    assert q[iprod, 0] > 0 and q[iprod, 1] > 0 and q[iprod, 2] > 0
    cmix = np.asarray(jax.vmap(s4._surface_fractions)(xw[:, 1], xw[:, 2]))
    ratio = q[iprod] / q[iprod].sum()
    np.testing.assert_allclose(ratio, cmix[iprod], rtol=1e-8)


def test_closed_well_pins_system(setup):
    state, geo, fs, init, ws, names = setup
    ws_closed = ws._replace(open_mask=jnp.zeros(ws.num_wells, bool))
    xw = s4.init_xw(fs, init.u, init.flag, ws_closed)
    wr = s4.well4_contributions(fs, init.u, init.flag, xw, ws_closed)
    assert np.asarray(wr.q_perf).max() == 0.0
    # D pinned to identity -> schur contributions vanish
    n = init.u.shape[0]
    x = jnp.ones((n, 3))
    assert float(jnp.abs(s4.schur_matvec(wr, ws_closed, x)).max()) == 0.0


def test_packed_wells_match_intensive_path(setup):
    """well4_contributions_packed (cellpack-plane channels, chain-rule
    Jacobians) matches the intensive-based path to f32 rounding on the
    SPE1 grid (fully-active: active == full-box indices)."""
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp
    from opm_autodiff_tpu.wells.standard import connection_densities

    state, geo, fs, init, ws, names = setup
    nx, ny, nz = geo.cartdims
    from opm_autodiff_tpu.models.blackoil import statics_from_geometry
    cells, faces = statics_from_geometry(geo, structured="always")
    if not pcp.supports(fs, cells):
        pytest.skip("cellpack does not support this fluid system")
    xw = s4.init_xw(fs, init.u, init.flag, ws)
    rho_conn = connection_densities(fs, init.u, init.flag, xw[:, 3], ws,
                                    cells.regs)
    packed = pcp.cellpack_planes(fs, cells, init.u, init.flag,
                                 (nz, ny, nx), interpret=True)
    wr_ref = s4.well4_contributions(fs, init.u, init.flag, xw, ws,
                                    regs=cells.regs,
                                    mob_mult=cells.mob_mult,
                                    eps=cells.eps, rho_conn=rho_conn)
    wr_pk = s4.well4_contributions_packed(packed, xw, ws, ws.cell,
                                          rho_conn=rho_conn)
    np.testing.assert_allclose(np.asarray(wr_pk.q_perf),
                               np.asarray(wr_ref.q_perf),
                               rtol=2e-5, atol=1e-12)
    np.testing.assert_allclose(np.asarray(wr_pk.res_well),
                               np.asarray(wr_ref.res_well),
                               rtol=2e-4, atol=1e-8)
    # atol floor at 2e-3 of the dominant entries: the kernel jets clamp
    # one-sided relperm slopes at table edges (kro' at connate water /
    # zero gas) to 0 where jacfwd returns the inside slope — the same
    # convention difference the banded-assembly equality tests carry;
    # physically the no-flow end-point region
    du_scale = np.abs(np.asarray(wr_ref.dq_du)).max()
    np.testing.assert_allclose(np.asarray(wr_pk.dq_du),
                               np.asarray(wr_ref.dq_du),
                               rtol=2e-3, atol=2e-3 * du_scale)
    dxw_scale = np.abs(np.asarray(wr_ref.dq_dxw)).max()
    np.testing.assert_allclose(np.asarray(wr_pk.dq_dxw),
                               np.asarray(wr_ref.dq_dxw),
                               rtol=2e-3, atol=3e-5 * dxw_scale)


def test_stop_well_zero_surface_rate_with_crossflow(setup):
    """STOP status (reference Well::Status::STOP, test_wellstate.cpp:350
    STOP_well + wells_manager_data_wellSTOP.data): the well is closed at
    the SURFACE — the CTRL_STOP control equation pins WQTotal = 0 — but
    the wellbore stays live, so perforations in a vertically
    disequilibrated column exchange fluid through the well (crossflow),
    balancing per phase across the wellbore. Distinct from SHUT, which
    removes the well entirely (open_mask False, zero perf rates)."""
    from opm_autodiff_tpu.io.state import Completion, WellConfig
    from opm_autodiff_tpu.wells.standard import CTRL_STOP

    state, geo, fs, init, ws, names = setup
    comps = [Completion(i=4, j=4, k=k, open=True, cf=None, diameter=0.5,
                        kh=None, skin=0.0, direction="Z")
             for k in range(3)]
    stop_w = WellConfig(
        name="STOPW", group="G", i=4, j=4, ref_depth=None,
        preferred_phase="OIL", is_injector=False, status="STOP",
        completions=comps, control_mode="ORAT", oil_rate=0.01,
        bhp_limit=1e5)
    ws2 = build_wellset(geo, [stop_w])
    assert bool(np.asarray(ws2.open_mask)[0])          # live, not SHUT
    assert int(np.asarray(ws2.ctrl_mode)[0]) == CTRL_STOP

    # overpressure the top perforated cell: wellbore crossflow moves
    # fluid from the high-pressure layer to the others
    u = np.asarray(init.u).copy()
    top_cell = int(np.asarray(ws2.cell)[0, 0])
    u[top_cell, 0] += 20e5
    u = jnp.asarray(u)

    xw0 = s4.init_xw(fs, u, init.flag, ws2)
    xw = s4.solve_well_eq(fs, u, init.flag, xw0, ws2)
    assert bool(jnp.all(jnp.isfinite(xw)))
    # surface: total rate pinned to ~0 -> every phase surface rate ~0
    q_surf = np.asarray(s4.xw_surface_rates(xw, ws2))[0]
    assert np.abs(q_surf).max() < 1e-10

    wr = s4.well4_contributions(fs, u, init.flag, xw, ws2)
    qp = np.asarray(wr.q_perf)[0]       # [P,3] signed into cells
    per_perf = qp.sum(axis=1)           # net volume per perforation
    # crossflow is live: the overpressured perf feeds the wellbore
    # (negative into its cell), at least one other perf receives
    assert per_perf.min() < -1e-7
    assert per_perf.max() > 1e-7
    # and the well stores nothing: perf rates balance per phase
    np.testing.assert_allclose(qp.sum(axis=0), np.zeros(3), atol=5e-7)


def test_shut_vs_stop_distinction(setup):
    """SHUT wells stay fully dead (no crossflow): open_mask False."""
    from opm_autodiff_tpu.io.state import Completion, WellConfig

    state, geo, fs, init, ws, names = setup
    comps = [Completion(i=4, j=4, k=k, open=True, cf=None, diameter=0.5,
                        kh=None, skin=0.0, direction="Z")
             for k in range(3)]
    shut_w = WellConfig(
        name="SHUTW", group="G", i=4, j=4, ref_depth=None,
        preferred_phase="OIL", is_injector=False, status="SHUT",
        completions=comps, control_mode="ORAT", oil_rate=0.01,
        bhp_limit=1e5)
    ws2 = build_wellset(geo, [shut_w])
    assert not bool(np.asarray(ws2.open_mask)[0])
    xw0 = s4.init_xw(fs, init.u, init.flag, ws2)
    wr = s4.well4_contributions(fs, init.u, init.flag, xw0, ws2)
    np.testing.assert_array_equal(np.asarray(wr.q_perf), 0.0)
