"""Well model tests (reference analog: tests/test_wellmodel.cpp — build
real wells from a parsed deck and check assembly invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.blackoil import statics_from_geometry
from opm_autodiff_tpu.models.init import equilibrate
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.wells import (CTRL_BHP, CTRL_ORAT, CTRL_RATE,
                                    build_wellset, well_contributions)
from opm_autodiff_tpu.wells.standard import (recover_pbh_update, schur_matvec,
                                             schur_rhs)


@pytest.fixture(scope="module")
def setup(spe1_deck_path):
    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    init = equilibrate(state, geo, fs)
    ws = build_wellset(geo, state.schedule.steps[0].wells)
    return state, geo, fs, init, ws


def test_wellset_construction(setup):
    state, geo, fs, init, ws = setup
    assert ws.num_wells == 2
    names = [w.name for w in state.schedule.steps[0].wells]
    iprod = names.index("PROD")
    iinj = names.index("INJ")
    assert not bool(ws.is_injector[iprod])
    assert bool(ws.is_injector[iinj])
    assert int(ws.ctrl_mode[iprod]) == CTRL_ORAT
    assert int(ws.ctrl_mode[iinj]) == CTRL_RATE
    assert float(ws.orat[iprod]) == pytest.approx(20000 * U.STB / U.DAY)
    # producer perforates cell (9,9,2), injector (0,0,0)
    assert int(ws.cell[iprod, 0]) == geo.act_index(9, 9, 2)
    assert int(ws.cell[iinj, 0]) == geo.act_index(0, 0, 0)
    assert float(ws.wi[iprod, 0]) > 0


def test_producer_rates_sign(setup):
    state, geo, fs, init, ws = setup
    names = [w.name for w in state.schedule.steps[0].wells]
    iprod = names.index("PROD")
    # bhp well below cell pressure -> production (negative q into cell)
    pbh = init.u[ws.cell[:, 0], 0] - 50 * U.PSI
    wr = well_contributions(fs, init.u, init.flag, pbh, ws)
    q = np.asarray(wr.q_perf.sum(axis=1))
    assert q[iprod, 1] < 0  # oil produced
    assert q[iprod, 2] < 0  # associated gas
    # produced GOR equals Rs (no free gas in cell)
    assert q[iprod, 2] / q[iprod, 1] == pytest.approx(
        1.27 * U.MSCF / U.STB, rel=1e-6)


def test_injector_rates_sign(setup):
    state, geo, fs, init, ws = setup
    names = [w.name for w in state.schedule.steps[0].wells]
    iinj = names.index("INJ")
    pbh = init.u[ws.cell[:, 0], 0] + 500 * U.PSI
    wr = well_contributions(fs, init.u, init.flag, pbh, ws)
    q = np.asarray(wr.q_perf.sum(axis=1))
    assert q[iinj, 2] > 0       # gas injected
    assert q[iinj, 0] == 0.0    # nothing else
    assert q[iinj, 1] == 0.0


def test_well_jacobian_vs_fd(setup):
    """dq/dpbh and the control-equation derivative vs finite differences."""
    state, geo, fs, init, ws = setup
    pbh = init.u[ws.cell[:, 0], 0] - 30 * U.PSI
    wr = well_contributions(fs, init.u, init.flag, pbh, ws)
    h = 10.0  # Pa
    for iw in range(ws.num_wells):
        e = jnp.zeros_like(pbh).at[iw].set(h)
        wp = well_contributions(fs, init.u, init.flag, pbh + e, ws)
        wm = well_contributions(fs, init.u, init.flag, pbh - e, ws)
        fd_q = (wp.q_perf[iw] - wm.q_perf[iw]) / (2 * h)
        np.testing.assert_allclose(np.asarray(wr.dq_dpbh[iw]),
                                   np.asarray(fd_q), rtol=1e-5, atol=1e-14)
        fd_rw = (wp.res_well[iw] - wm.res_well[iw]) / (2 * h)
        np.testing.assert_allclose(float(wr.d_diag[iw]), float(fd_rw),
                                   rtol=1e-5)


def test_schur_consistency(setup):
    """Schur-reduced solve == full coupled dense solve on the well block."""
    state, geo, fs, init, ws = setup
    rng = np.random.default_rng(0)
    pbh = init.u[ws.cell[:, 0], 0] - 30 * U.PSI
    wr = well_contributions(fs, init.u, init.flag, pbh, ws)
    n = init.u.shape[0]
    x = jnp.asarray(rng.standard_normal((n, 3)))

    # explicit: y = -C D^-1 B x
    c_blk = -np.asarray(wr.dq_dpbh)  # [W,P,3] dR_c/dpbh
    b_blk = np.asarray(wr.b_blk)
    d = np.asarray(wr.d_diag)
    y_ref = np.zeros((n, 3))
    for iw in range(ws.num_wells):
        bx = sum(b_blk[iw, ip] @ np.asarray(x)[int(ws.cell[iw, ip])]
                 for ip in range(ws.max_perfs))
        for ip in range(ws.max_perfs):
            y_ref[int(ws.cell[iw, ip])] -= c_blk[iw, ip] * bx / d[iw]
    y = np.asarray(schur_matvec(wr, ws, x))
    np.testing.assert_allclose(y, y_ref, rtol=1e-12, atol=1e-30)


def test_bhp_control_equation(setup):
    state, geo, fs, init, ws = setup
    # force both wells to BHP control
    mode = jnp.full(ws.num_wells, CTRL_BHP)
    pbh = ws.bhp_target + 7.0
    wr = well_contributions(fs, init.u, init.flag, pbh, ws, mode)
    np.testing.assert_allclose(np.asarray(wr.res_well), 7.0)
    np.testing.assert_allclose(np.asarray(wr.d_diag), 1.0)
    np.testing.assert_allclose(np.asarray(wr.b_blk), 0.0)


def test_welpi_rescales_productivity(tmp_path):
    """WELPI scales the connection factors so the well PI (WI x total
    mobility) hits the target — a larger target must produce more at
    the same BHP limit (reference: WellProdIndexCalculator WELPI)."""
    import os

    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    def run(pi):
        p = os.path.join(str(tmp_path), f"WP{pi}.DATA")
        write_spe1_deck(p, 6, 6, 3, tstep_days="1 2 5")
        txt = open(p).read().replace(
            "WCONPROD\n 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 /",
            "WELPI\n 'PROD' %s /\n/\n"
            "WCONPROD\n 'PROD' 'OPEN' 'BHP' 5* 3500 /" % pi)
        open(p, "w").write(txt)
        sim = Simulator(load_state(p), SimulatorOptions())
        sim.run()
        return sim.summary.rows[0]["WOPR:PROD"]

    lo = run(1.0)
    hi = run(20.0)
    assert hi > 3 * lo


def test_packed_perf_contributions_match(setup):
    """well_perf_contributions_packed (cellpack channels) matches the
    intensive-based path to f32 rounding (cf. test_std4's packed test)."""
    import pytest
    from opm_autodiff_tpu.models.blackoil import statics_from_geometry
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp

    state, geo, fs, init, ws = setup
    nx, ny, nz = geo.cartdims
    cells, _f = statics_from_geometry(geo, structured="always")
    if not pcp.supports(fs, cells):
        pytest.skip("cellpack does not support this fluid system")
    pbh = init.u[ws.cell[:, 0], 0] - 50 * U.PSI
    from opm_autodiff_tpu.wells import standard as wells
    rho_conn = wells.connection_densities(fs, init.u, init.flag, pbh, ws,
                                          cells.regs)
    packed = pcp.cellpack_planes(fs, cells, init.u, init.flag,
                                 (nz, ny, nx), interpret=True)
    pr_ref = wells.well_perf_contributions(fs, init.u, init.flag, pbh,
                                           ws, cells.regs,
                                           cells.mob_mult, cells.eps,
                                           rho_conn)
    pr_pk = wells.well_perf_contributions_packed(packed, pbh, ws,
                                                 ws.cell, rho_conn)
    np.testing.assert_allclose(np.asarray(pr_pk.q_perf),
                               np.asarray(pr_ref.q_perf),
                               rtol=2e-5, atol=1e-12)
    scale = np.abs(np.asarray(pr_ref.dq_du)).max()
    np.testing.assert_allclose(np.asarray(pr_pk.dq_du),
                               np.asarray(pr_ref.dq_du),
                               rtol=2e-3, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(pr_pk.dq_dpbh),
                               np.asarray(pr_ref.dq_dpbh),
                               rtol=2e-3, atol=1e-12)
