"""PVT + saturation function tests: values vs deck tables, AD vs FD.

The AD test is the rebuild's equivalent of the reference's
tests/not-unit/test_ad.cpp (forward-AD Evaluation sanity check) per
SURVEY.md §4: jax.jvp vs central finite differences.
"""

import pytest as _pytest

pytestmark = _pytest.mark.smoke


import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.props import FluidSystem


@pytest.fixture(scope="module")
def fs(spe1_deck_path):
    return FluidSystem.from_state(load_state(spe1_deck_path))


def test_water_pvt(fs):
    p_ref = 4014.7 * U.PSI
    assert float(fs.water.inv_b(p_ref)) == pytest.approx(1 / 1.029)
    # compressibility: d(1/B)/dp at pref = c / B_ref
    p = jnp.asarray(p_ref)
    d = jax.grad(lambda x: fs.water.inv_b(x))(p)
    assert float(d) == pytest.approx(3.13e-6 / U.PSI / 1.029, rel=1e-6)
    assert float(fs.water.viscosity(p_ref)) == pytest.approx(0.31 * U.CP)


def test_gas_pvt_table_nodes(fs):
    # at table nodes, interpolation must hit exactly
    p = 1014.7 * U.PSI
    bg_si = 3.197 * U.STB / U.MSCF
    assert float(fs.gas.inv_b(p)) == pytest.approx(1 / bg_si)
    assert float(fs.gas.viscosity(p)) == pytest.approx(0.014 * U.CP)
    # monotone decreasing B_g -> increasing inv_b
    ps = jnp.linspace(15 * U.PSI, 9000 * U.PSI, 50)
    assert np.all(np.diff(fs.gas.inv_b(ps)) > 0)


def test_live_oil_saturated(fs):
    p = 4014.7 * U.PSI
    rs = float(fs.rs_sat(p))
    assert rs == pytest.approx(1.270 * U.MSCF / U.STB)
    assert float(fs.oil_inv_b(p, rs)) == pytest.approx(1 / 1.695)
    assert float(fs.oil_viscosity(p, rs)) == pytest.approx(0.51 * U.CP)
    # bubble point roundtrip
    assert float(fs.oil.p_bub(jnp.asarray(rs))) == pytest.approx(p)


def test_live_oil_undersaturated(fs):
    # Rs = 1.270 Mscf/stb branch at p = 9014.7: Bo = 1.579
    rs = 1.270 * U.MSCF / U.STB
    p = 9014.7 * U.PSI
    inv_b = float(fs.oil_inv_b(p, rs))
    # least-squares slope through (5014.7, 1.671), (9014.7, 1.579)
    # won't hit the table exactly; 2% window
    assert inv_b == pytest.approx(1 / 1.579, rel=0.02)
    # undersaturated oil is denser (higher 1/Bo) than saturated at same p
    rs_sat = float(fs.rs_sat(p))
    assert inv_b > 0  # basic
    assert float(fs.oil_viscosity(p, rs)) > float(
        fs.oil_viscosity(fs.oil.p_bub(jnp.asarray(rs)), rs))


def test_oil_density(fs):
    p = 4014.7 * U.PSI
    rs = float(fs.rs_sat(p))
    rho = float(fs.oil_density(p, rs))
    # (rho_o_surf + rs * rho_g_surf)/Bo
    expect = (49.1 * U.LB_PER_FT3 + rs * 0.06054 * U.LB_PER_FT3) / 1.695
    assert rho == pytest.approx(expect)
    # reservoir oil lighter than water, heavier than gas
    assert float(fs.gas_density(p)) < rho < float(fs.water_density(p))


def test_satfunc_values(fs):
    s = fs.sat
    assert float(s.krw(0.12)) == 0.0
    assert float(s.krow(0.12)) == 1.0
    assert float(s.krg(0.2)) == pytest.approx(0.075)
    assert float(s.krog(0.2)) == pytest.approx(0.35)
    # interpolated midpoint
    assert float(s.krg(0.225)) == pytest.approx(0.5 * (0.075 + 0.125))
    # out-of-range clamps
    assert float(s.krg(-0.1)) == 0.0
    assert float(s.krg(1.2)) == pytest.approx(1.0)


def test_three_phase_kro(fs):
    s = fs.sat
    # no gas: kro = krow
    assert float(s.kro(0.5, 0.0)) == pytest.approx(float(s.krow(0.5)))
    # connate water, gas present: kro = krog
    assert float(s.kro(0.12, 0.3)) == pytest.approx(float(s.krog(0.3)))
    # oil-only corner is finite and equals krow(swco)
    assert float(s.kro(0.12, 0.0)) == pytest.approx(1.0)
    # weighted mix in between
    v = float(s.kro(0.3, 0.2))
    assert 0.0 < v < 1.0


def test_ad_vs_fd(fs):
    """jvp == central finite difference for all pressure-dependent props."""
    p0 = 3000 * U.PSI
    rs0 = 0.8 * U.MSCF / U.STB

    funcs = [
        lambda p: fs.water.inv_b(p),
        lambda p: fs.gas.inv_b(p),
        lambda p: fs.oil_inv_b(p, rs0),
        lambda p: fs.rs_sat(p),
        lambda p: fs.rock.mult(p),
    ]
    h = 10.0  # Pa
    for f in funcs:
        _, dd = jax.jvp(f, (jnp.asarray(p0),), (jnp.asarray(1.0),))
        fd = (f(p0 + h) - f(p0 - h)) / (2 * h)
        np.testing.assert_allclose(float(dd), float(fd), rtol=1e-5, atol=1e-18)

    # saturation derivative
    f = lambda s: fs.sat.kro(s, 0.1)
    s0 = jnp.asarray(0.4)
    _, dd = jax.jvp(f, (s0,), (jnp.asarray(1.0),))
    hs = 1e-6
    fd = (f(s0 + hs) - f(s0 - hs)) / (2 * hs)
    np.testing.assert_allclose(float(dd), float(fd), rtol=1e-4)


def test_vmap_batch(fs):
    ps = jnp.linspace(1000 * U.PSI, 8000 * U.PSI, 64)
    rs = fs.rs_sat(ps)
    out = jax.vmap(fs.oil_inv_b)(ps, rs)
    assert out.shape == (64,)
    assert np.all(np.isfinite(out))
