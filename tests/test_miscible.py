"""Miscible-solvent model: MISCIBLE + MISC/PMISC/SSFN
(reference: opm-material blackoilsolventmodules isMiscible() path;
flow's SPE5-class solvent regression family)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

from tests.test_solvent_thermal import SOLVENT_DECK

MISC_PROPS = """MISC
 0.0 0.0
 0.5 0.5
 1.0 1.0 /
PMISC
 100 0.0
 250 1.0
 400 1.0 /
SSFN
 0.0 1.0 0.0
 1.0 0.0 1.0 /
"""


def _misc_deck(tmp_path, props=MISC_PROPS):
    text = SOLVENT_DECK.replace("\nSOLVENT\n", "\nSOLVENT\nMISCIBLE\n/\n")
    text = text.replace("ROCK\n", props + "ROCK\n")
    p = tmp_path / "M.DATA"
    p.write_text(text)
    return str(p)


def test_parse_misc_tables(tmp_path):
    state = load_state(_misc_deck(tmp_path))
    assert "MISCIBLE" in state.runspec.extensions
    comp = state.components
    assert np.asarray(comp["MISC"][0]).shape == (3, 2)
    pm = np.asarray(comp["PMISC"][0])
    assert pm[1, 0] == pytest.approx(250e5)  # METRIC barsa -> Pa
    assert np.asarray(comp["SSFN"][0]).shape == (2, 3)


def test_miscibility_scales_mixing(tmp_path):
    """With MISC/PMISC active, low solvent fraction means little mixing:
    the gas mobility multiplier stays near the immiscible value, while
    at full solvent strength it approaches mu_g/mu_s like the fully-
    miscible run. Short schedule: with consistent transport fluxes the
    front fully sweeps the 8-cell line in 17 days, flattening the
    profile the downstream assertions probe."""
    path = _misc_deck(tmp_path)
    text = open(path).read().replace("TSTEP\n 2 5 10 /", "TSTEP\n 1 2 3 /")
    open(path, "w").write(text)
    sim = Simulator(load_state(path), SimulatorOptions())
    sim.run()
    assert sim.components.has_misc
    assert sim.components.misc_tab is not None
    c = np.asarray(sim.components.c_solv)
    mm = np.asarray(sim.cells.mob_mult)
    # solvent front advances; thin solvent still raises gas mobility
    assert c[0] > 0.5
    assert mm[0, 2] > 1.2
    # downstream (less solvent) the multiplier decays
    assert mm[-1, 2] < mm[0, 2]
    # miscible oil mixing is wired: the thinner mixed oil raises the oil
    # mobility, strongest at the injector where solvent is undiluted
    assert (mm[:, 1] >= 1.0 - 1e-9).all()
    assert mm[0, 1] > 1.05
    assert mm[-1, 1] < mm[0, 1]


def test_immiscible_run_unchanged(tmp_path):
    """Without MISCIBLE the solvent still runs Todd-Longstaff — by
    default as the fully-implicit 4th equation (the TL feedback lives
    in the Jacobian, not in cells.mob_mult); the split fallback keeps
    the lagged multiplier behavior."""
    from opm_autodiff_tpu.models.transport4 import tl_factor

    p = tmp_path / "S.DATA"
    p.write_text(SOLVENT_DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim._trans4_kind == "solvent"
    sim.run()
    assert not sim.components.has_misc
    f0 = float(tl_factor(sim.fs, sim.trans4.tl, float(sim.u[0, 3]),
                         float(sim.u[0, 0])))
    assert f0 > 1.2
    # and the split fallback still carries the multiplier channel
    sim_s = Simulator(load_state(str(p)),
                      SimulatorOptions(solvent_implicit=False))
    sim_s.run()
    mm = np.asarray(sim_s.cells.mob_mult)
    assert mm[0, 2] > 1.2
    # no oil mixing outside the miscible model
    np.testing.assert_allclose(mm[:, 1], 1.0)


MISC_EP_PROPS = MISC_PROPS + """SORWMIS
 0.0 0.02
 1.0 0.02 /
SGCWMIS
 0.0 0.05
 1.0 0.05 /
"""


def test_sorwmis_sgcwmis_shift_endpoints(tmp_path):
    """Miscibility interpolates the residual-oil / critical-gas
    endpoints toward the SORWMIS/SGCWMIS values through the cells' EPS
    channels (reference: blackoilsolventmodules miscible residuals)."""
    sim = Simulator(load_state(_misc_deck(tmp_path, props=MISC_EP_PROPS)),
                    SimulatorOptions())
    assert sim.cells.eps is not None  # channel array auto-created
    sim.run()
    eps = np.asarray(sim.cells.eps)
    # immiscible base: krow vanishes at sw=0.85 (sor=0.15), sgcr=0.
    # near the injector the solvent is at full strength -> residual oil
    # shrinks toward 0.02, so the krow-vanishing sw rises above 0.85
    assert eps[0, 3] > 0.87  # above the 0.85 immiscible endpoint
    assert eps[0, 3] <= 0.99
    # critical gas rises from 0 toward 0.05 with miscibility
    assert 0.0 < eps[0, 4] <= 0.05 + 1e-9
    # the shift decays downstream with the solvent fraction
    assert eps[-1, 3] <= eps[0, 3] + 1e-12


def test_msfn_relperm_split(tmp_path):
    """MSFN replaces the immiscible gas/oil relperms with splits of the
    hydrocarbon relperm under miscibility: boosting the gas split raises
    the gas mobility multiplier beyond the pure viscosity effect."""
    msfn = """MSFN
 0.0 0.0 1.0
 1.0 1.0 0.0 /
"""
    sim_plain = Simulator(load_state(_misc_deck(tmp_path)),
                          SimulatorOptions())
    sim_plain.run()
    p2 = tmp_path / "m2"
    p2.mkdir()
    sim_msfn = Simulator(
        load_state(_misc_deck(p2, props=MISC_PROPS + msfn)),
        SimulatorOptions())
    assert sim_msfn.components.msfn_tab is not None
    sim_msfn.run()
    mm_a = np.asarray(sim_plain.cells.mob_mult)
    mm_b = np.asarray(sim_msfn.cells.mob_mult)
    # both runs complete with positive, finite multipliers (columns 3/4
    # are the DRSDT/DRVDT caps, +inf when inactive)
    assert np.isfinite(mm_b[:, :3]).all()
    assert (mm_b[:, 2] > 0).all()
    # the MSFN split changes the mobilities (different physics applied)
    assert not np.allclose(mm_a[:, 2], mm_b[:, 2])
