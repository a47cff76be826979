"""Extended black-oil (extbo / zFraction) variant: models/extbo.py
(reference: flow/flow_ebos_extbo.cpp dispatched on Phase::ZFRACTION,
Main.hpp:309; physics from opm-models blackoilextbomodules). The solvent
fraction z is a 4th fully-implicit block equation; PVTSOL tables shift
the oil/gas PVT with composition."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

BASE = """RUNSPEC
DIMENS
 10 1 1 /
OIL
WATER
GAS
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 10*20 /
DY
 10*20 /
DZ
 10*5 /
TOPS
 10*1000 /
PORO
 10*0.25 /
PERMX
 10*500 /
PROPS
PVTW
 200 1.02 4.0E-5 0.5 0 /
PVDO
 100 1.05 2.0
 400 1.02 2.1 /
PVDG
 100 0.0100 0.015
 400 0.0025 0.016 /
ROCK
 200 4E-5 /
SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
SGOF
 0.00 0.00 0.85 0
 0.40 0.35 0.25 0
 0.85 0.90 0.00 0 /
DENSITY
 850 1000 1 /
{props_extra}
SOLUTION
PRESSURE
 10*200 /
SWAT
 10*0.15 /
SGAS
 10*0.10 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'I1' 'G' 1  1 1000 'GAS' /
 'P1' 'G' 10 1 1000 'OIL' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'I1' 'GAS' 'OPEN' 'RATE' 2000 1* 400 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
{sched_extra}
TSTEP
 1 2 5 10 20 /
END
"""

# z=0 branch = the PVDO/PVDG behavior (factors are taken against it, so
# a z=0 run is exactly standard black-oil); at z=1 the oil swells
# (Bo up 15%), thins (mu_o 2.0 -> 0.8), and 40% of the oil stream / 90%
# of the gas stream are solvent at surface.
PVTSOL_PROPS = """PVTSOL
 0.0  100 1.05 0.0100 0.0 0.0 0.00 0.00 2.0 0.015
      400 1.02 0.0025 0.0 0.0 0.00 0.00 2.1 0.016 /
 1.0  100 1.20 0.0100 0.0 0.0 0.40 0.90 0.8 0.015
      400 1.15 0.0025 0.0 0.0 0.40 0.90 0.8 0.016 /
/
"""

# solvent fraction below the table's yv ceiling (0.9 at z=1): a
# 100%-solvent stream would demand a pure-solvent gas phase the table
# cannot represent — the injector then legitimately fails to converge
# and the timestepper force-shuts it (verified behavior)
WSOLVENT_SCHED = """WSOLVENT
 'I1' 0.8 /
"""


def _run(tmp_path, name, props_extra="", sched_extra=""):
    deck = BASE.format(props_extra=props_extra, sched_extra=sched_extra)
    p = tmp_path / f"{name}.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)))
    sim.run()
    return sim


def test_z0_reduces_to_blackoil(tmp_path):
    """Without solvent injection z stays 0 and the extbo system
    reproduces the plain black-oil run (factors vs the z=0 branch are
    exactly 1)."""
    plain = _run(tmp_path, "PLAIN")
    ex = _run(tmp_path, "EXTBO0", props_extra=PVTSOL_PROPS)
    assert ex.extbo is not None and plain.extbo is None
    z = np.asarray(ex.u[:, 3])
    np.testing.assert_allclose(z, 0.0, atol=1e-12)
    # same physics, different system (4x4 blocks + the z row): the two
    # runs converge along different Newton paths, so they agree to the
    # nonlinear tolerance, not bitwise
    np.testing.assert_allclose(np.asarray(ex.u[:, 0]),
                               np.asarray(plain.u[:, 0]), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(ex.u[:, 1]),
                               np.asarray(plain.u[:, 1]), rtol=0,
                               atol=2e-3)


def test_solvent_injection_transports_z(tmp_path):
    """WSOLVENT 1.0 on the gas injector: z rises near the injector and
    decays toward the producer; z stays within the table span."""
    ex = _run(tmp_path, "EXTBO1", props_extra=PVTSOL_PROPS,
              sched_extra=WSOLVENT_SCHED)
    z = np.asarray(ex.u[:, 3])
    assert z[0] > 0.05, z
    assert z[0] > z[5] >= z[9] - 1e-12, z
    assert np.all(z >= 0.0) and np.all(z <= 1.0)


def test_solvent_changes_oil_recovery(tmp_path):
    """The solvent-thinned oil (mu_o 2.0 -> 0.8 at z=1) produces more
    oil than plain gas injection over the same schedule."""
    plain = _run(tmp_path, "GASINJ", props_extra=PVTSOL_PROPS)
    solv = _run(tmp_path, "SOLVINJ", props_extra=PVTSOL_PROPS,
                sched_extra=WSOLVENT_SCHED)
    assert solv.cum["FOPT"] > plain.cum["FOPT"] * 1.0005, \
        (solv.cum["FOPT"], plain.cum["FOPT"])


def test_pvtsol_parse_units(tmp_path):
    deck = BASE.format(props_extra=PVTSOL_PROPS, sched_extra="")
    p = tmp_path / "PARSE.DATA"
    p.write_text(deck)
    st = load_state(str(p))
    assert "EXTBO" in st.runspec.extensions
    regs = st.components["PVTSOL"]
    assert len(regs) == 1
    r = regs[0]
    np.testing.assert_allclose(r["z"], [0.0, 1.0])
    p0, bo0 = r["branches"][0][0], r["branches"][0][1]
    np.testing.assert_allclose(p0, [100e5, 400e5])  # METRIC bar -> Pa
    np.testing.assert_allclose(bo0, [1.05, 1.02])
    # xvol/yvol dimensionless
    np.testing.assert_allclose(r["branches"][1][5], [0.40, 0.40])
    np.testing.assert_allclose(r["branches"][1][6], [0.90, 0.90])


def test_extbo_jacobian_fd(tmp_path):
    """The 4x4 extbo BSR assembly is FD-consistent in all four unknowns
    (po, sw, x3, z) at a state with free gas and z in (0.1, 0.7)."""
    import jax.numpy as jnp

    from opm_autodiff_tpu.models import extbo as ex_mod
    from opm_autodiff_tpu.models.blackoil import PrimaryState

    deck = BASE.format(props_extra=PVTSOL_PROPS, sched_extra="")
    p = tmp_path / "EXTFD.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)))
    ex, fs, cells, faces = sim.extbo, sim.fs, sim.cells, sim.facelist
    n = sim.u.shape[0]
    rng = np.random.default_rng(3)
    u = np.asarray(sim.u).copy()
    u[:, 0] *= 1 + 0.02 * rng.standard_normal(n)
    u[:, 1] = 0.2 + 0.4 * rng.random(n)
    u[:, 2] = 0.05 + 0.2 * rng.random(n)
    u[:, 3] = 0.1 + 0.6 * rng.random(n)
    u = jnp.asarray(u)
    flag = sim.flag
    acc0 = sim._compute_acc0(u, flag)
    dt = 86400.0

    def resid(uu):
        return ex_mod.assemble_system4(fs, ex, cells, faces,
                                       PrimaryState(uu, flag), acc0, dt)

    sys0 = resid(u)
    res0 = np.asarray(sys0.residual)
    lf, rt = np.asarray(sys0.left), np.asarray(sys0.right)
    for cell in (0, 4, 9):
        for d in range(4):
            h = max(1e-6 * abs(float(u[cell, d])), 1e-8)
            res1 = np.asarray(resid(u.at[cell, d].add(h)).residual)
            fd_col = (res1 - res0) / h
            ana = np.zeros_like(fd_col)
            ana[cell] = np.asarray(sys0.diag[cell, :, d])
            for f, (le, ri) in enumerate(zip(lf, rt)):
                if le == cell:
                    ana[ri] += np.asarray(sys0.off_rl[f][:, d])
                if ri == cell:
                    ana[le] += np.asarray(sys0.off_lr[f][:, d])
            scale = np.abs(fd_col).max() + 1e-20
            assert np.abs(fd_col - ana).max() / scale < 5e-4, (cell, d)
