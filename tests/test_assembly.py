"""Residual/Jacobian assembly tests: BSR vs dense AD, FD check, no-flow.

Mirrors SURVEY.md §7 stage 5: "Test: FD-check Jacobian; SPE1-sized
residual vs reference values."
"""

import pytest as _pytest

pytestmark = _pytest.mark.smoke


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.assembler import assemble_system, bsr_matvec
from opm_autodiff_tpu.models.blackoil import (FLAG_RS, FLAG_SG, PrimaryState,
                                              accumulation, face_flux,
                                              statics_from_geometry)
from opm_autodiff_tpu.models.init import equilibrate
from opm_autodiff_tpu.props import FluidSystem


@pytest.fixture(scope="module")
def setup(spe1_deck_path):
    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    # these tests exercise the general face-list (BSR) path explicitly;
    # the structured banded path is validated against it in
    # tests/test_structured.py
    cells, faces = statics_from_geometry(geo, structured="never")
    init = equilibrate(state, geo, fs)
    return state, geo, fs, cells, faces, init


def _dense_residual(fs, cells, faces, u_flat, flag, acc0, dt):
    n = acc0.shape[0]
    u = u_flat.reshape(n, 3)
    acc = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, u, flag, cells.pore_vol_ref)
    r = (acc - acc0) / dt
    flux = jax.vmap(face_flux, in_axes=(None, 0, 0, 0, 0, 0, 0))(
        fs, u[faces.left], u[faces.right], flag[faces.left],
        flag[faces.right], faces.trans, faces.gdz)
    r = r.at[faces.left].add(flux)
    r = r.at[faces.right].add(-flux)
    return r.reshape(-1)


def test_equilibrium_state(setup):
    state, geo, fs, cells, faces, init = setup
    u = np.asarray(init.u)
    # SPE1: oil zone everywhere, connate water, no free gas
    assert np.all(np.asarray(init.flag) == FLAG_RS)
    np.testing.assert_allclose(u[:, 1], 0.12)
    # pressure at datum layer (8400 ft) ~ 4800 psia, increasing with depth
    k3 = [geo.act_index(0, 0, k) for k in range(3)]
    p_layers = u[k3, 0] / U.PSI
    assert p_layers[2] == pytest.approx(4800, rel=2e-3)
    assert p_layers[0] < p_layers[1] < p_layers[2]
    # Rs from RSVD: 1.270 Mscf/stb everywhere
    np.testing.assert_allclose(u[:, 2], 1.270 * U.MSCF / U.STB, rtol=1e-10)


def test_no_flow_at_equilibrium(setup):
    """Residual of the equilibrated state with acc0 = acc(u0) ~ 0."""
    state, geo, fs, cells, faces, init = setup
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref)
    dt = 86400.0
    sys = assemble_system(fs, cells, faces, init, acc0, dt)
    r = np.asarray(sys.residual)
    # scale: compare against a typical flux magnitude (trans * mob * 1 psi)
    scale = float(np.median(geo.faces.trans)) * 1e3 / (1e-3) * 0.0
    # fluxes should vanish to equilibration tolerance: use CNV-style norm
    pv = np.asarray(cells.pore_vol_ref)
    cnv = np.abs(r) * dt / pv[:, None]
    assert np.max(cnv) < 2e-4, np.max(cnv)


def test_bsr_matches_dense_jacobian(setup):
    state, geo, fs, cells, faces, init = setup
    # perturb the state so fluxes are nonzero and upwinding is exercised
    rng = np.random.default_rng(0)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.02 * rng.standard_normal(len(u))
    u[:, 1] = np.clip(u[:, 1] + 0.1 * rng.random(len(u)), 0.12, 0.9)
    flag = np.asarray(init.flag).copy()
    # flip some cells to free-gas state
    gas_cells = rng.choice(len(u), 60, replace=False)
    flag[gas_cells] = FLAG_SG
    u[gas_cells, 2] = 0.1 * rng.random(len(gas_cells))
    ps = PrimaryState(u=jnp.asarray(u), flag=jnp.asarray(flag))

    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, ps.u, ps.flag, cells.pore_vol_ref)
    acc0 = acc0 * (1 + 0.01)  # nonzero accumulation residual
    dt = 10 * 86400.0

    sys = assemble_system(fs, cells, faces, ps, acc0, dt)

    # dense jacobian via jacfwd of the straight-line residual
    jac_dense = jax.jacfwd(
        lambda uf: _dense_residual(fs, cells, faces, uf, ps.flag, acc0, dt)
    )(ps.u.reshape(-1))
    n = sys.num_cells

    # residuals must agree exactly
    r_dense = _dense_residual(fs, cells, faces, ps.u.reshape(-1), ps.flag,
                              acc0, dt)
    np.testing.assert_allclose(np.asarray(sys.residual).reshape(-1),
                               np.asarray(r_dense), rtol=1e-12, atol=1e-20)

    # matvec against random vectors must match dense J @ x
    for seed in range(3):
        x = rng.standard_normal((n, 3))
        y_bsr = np.asarray(bsr_matvec(sys, jnp.asarray(x)))
        y_dense = (np.asarray(jac_dense) @ x.reshape(-1)).reshape(n, 3)
        scale = np.abs(y_dense).max()
        np.testing.assert_allclose(y_bsr, y_dense, rtol=1e-10,
                                   atol=1e-12 * scale)


def test_jacobian_vs_finite_difference(setup):
    """Directional derivative of the residual vs central FD.

    The state is perturbed off the equilibrium first: at equilibrium every
    face has dphi ~ 0, so any FD step flips the upwind direction (a true
    kink — AD gives the one-sided derivative there). Likewise saturations
    are moved off table nodes where piecewise-linear interpolation kinks.
    """
    state, geo, fs, cells, faces, init = setup
    rng = np.random.default_rng(1)
    u = np.asarray(init.u).copy()
    n = len(u)
    u[:, 0] *= 1 + 0.03 * rng.standard_normal(n)
    u[:, 1] = 0.2 + 0.4 * rng.random(n)          # off the SWOF nodes
    u[:, 2] *= 0.95 + 0.02 * rng.random(n)       # Rs below saturation
    ps = PrimaryState(u=jnp.asarray(u), flag=init.flag)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, ps.u, ps.flag, cells.pore_vol_ref) * 1.01
    dt = 30 * 86400.0
    sys = assemble_system(fs, cells, faces, ps, acc0, dt)

    # direction scaled per variable magnitude; small eps to stay inside
    # the current piecewise-linear segments
    v = rng.standard_normal((n, 3)) * np.array([1e4, 1e-3, 1e-3])
    eps = 1e-3

    def res(u):
        return _dense_residual(fs, cells, faces, u.reshape(-1), ps.flag,
                               acc0, dt).reshape(n, 3)

    r_plus = res(ps.u + eps * v)
    r_minus = res(ps.u - eps * v)
    fd = (np.asarray(r_plus) - np.asarray(r_minus)) / (2 * eps)
    jv = np.asarray(bsr_matvec(sys, jnp.asarray(v)))
    scale = np.abs(fd).max()
    np.testing.assert_allclose(jv, fd, rtol=5e-5, atol=1e-7 * scale)


def test_mass_conservation_of_flux(setup):
    """Sum of flux-divergence over all cells is zero (interior faces only)."""
    state, geo, fs, cells, faces, init = setup
    rng = np.random.default_rng(2)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.05 * rng.standard_normal(len(u))
    ps = PrimaryState(u=jnp.asarray(u), flag=init.flag)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, ps.u, ps.flag, cells.pore_vol_ref)
    dt = 86400.0
    sys = assemble_system(fs, cells, faces, ps, acc0, dt)
    # (acc-acc0)/dt = 0 here, so residual = flux divergence; must telescope
    total = np.asarray(sys.residual).sum(axis=0)
    flux_scale = np.abs(np.asarray(sys.residual)).max()
    np.testing.assert_allclose(total, 0.0, atol=1e-10 * flux_scale)


def test_ell_matches_scatter(spe1_deck_path):
    """The ELL (gather-only) assembly and SpMV reproduce the scatter
    formulation exactly (same adds, different order -> f64 roundoff)."""
    import jax

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.assembler import (assemble_system,
                                                   bsr_matvec)
    from opm_autodiff_tpu.models.blackoil import (PrimaryState,
                                                  accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.props import FluidSystem

    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, faces = statics_from_geometry(geo, structured="never")
    assert faces.ell_face is not None
    init = equilibrate(state, geo, fs)
    rng = np.random.default_rng(5)
    u = jnp.asarray(np.asarray(init.u)
                    * (1 + 1e-3 * rng.standard_normal(init.u.shape)))
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref)
    ps = PrimaryState(u, init.flag)

    sys_ell = assemble_system(fs, cells, faces, ps, acc0, 86400.0)
    faces_sc = faces._replace(ell_face=None, ell_nbr=None, ell_left=None)
    sys_sc = assemble_system(fs, cells, faces_sc, ps, acc0, 86400.0)

    np.testing.assert_allclose(np.asarray(sys_ell.residual),
                               np.asarray(sys_sc.residual),
                               rtol=1e-12, atol=1e-20)
    np.testing.assert_allclose(np.asarray(sys_ell.diag),
                               np.asarray(sys_sc.diag),
                               rtol=1e-12, atol=1e-20)
    x = jnp.asarray(rng.standard_normal(sys_sc.residual.shape))
    y_ell = bsr_matvec(sys_ell, x)
    y_sc = bsr_matvec(sys_sc, x)
    np.testing.assert_allclose(np.asarray(y_ell), np.asarray(y_sc),
                               rtol=1e-12, atol=1e-18)


def test_packed_matches_per_face_jacfwd(setup):
    """assemble_system (packed per-cell sweep + hand chain rule)
    reproduces the per-face jacfwd reference assembly to roundoff —
    both paths evaluate the same f64 tables, only the derivative
    composition differs."""
    from opm_autodiff_tpu.models.assembler import assemble_system_ref

    state, geo, fs, cells, faces, init = setup
    n = init.u.shape[0]
    rng = np.random.default_rng(23)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.03 * rng.standard_normal(n)
    u[:, 1] = 0.2 + 0.5 * rng.random(n)
    u[:, 2] = np.where(np.asarray(init.flag) == 0,
                       0.011 + 0.3 * rng.random(n),
                       u[:, 2] * (1 + 0.04 * rng.standard_normal(n)))
    u = jnp.asarray(u)
    ps = PrimaryState(u, init.flag)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref)
    dt = 86400.0

    got = assemble_system(fs, cells, faces, ps, acc0, dt)
    want = assemble_system_ref(fs, cells, faces, ps, acc0, dt)
    for nm in ("residual", "diag", "off_lr", "off_rl"):
        a = np.asarray(getattr(want, nm))
        b = np.asarray(getattr(got, nm))
        scale = np.abs(a).max() + 1e-30
        assert np.abs(b - a).max() / scale < 1e-11, nm
