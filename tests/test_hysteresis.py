"""Killough gas-relperm hysteresis (reference: opm-material
EclHysteresisTwoPhaseLaw + EclHysteresisConfig, EHYSTR/IMBNUM)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

DECK = """RUNSPEC
DIMENS
 5 1 1 /
OIL
WATER
GAS
METRIC
EHYSTR
 0.1 2 /
TABDIMS
 2 1 /
START
 1 'JAN' 2020 /
GRID
DX
 5*20 /
DY
 5*20 /
DZ
 5*5 /
TOPS
 5*1000 /
PORO
 5*0.25 /
PERMX
 5*500 /
REGIONS
SATNUM
 5*1 /
IMBNUM
 5*2 /
PROPS
PVTW
 200 1.02 4.0E-5 0.5 0 /
PVDO
 100 1.05 2.0
 400 1.02 2.0 /
PVDG
 100 0.012 0.012
 400 0.003 0.016 /
ROCK
 200 4E-5 /
SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
SGOF
-- drainage: critical gas 0.02
 0.00 0.00 0.90 0
 0.02 0.00 0.80 0
 0.40 0.35 0.20 0
 0.85 0.90 0.0  0 /
-- imbibition: trapped gas up to 0.25
 0.00 0.00 0.90 0
 0.25 0.00 0.50 0
 0.50 0.30 0.10 0
 0.85 0.90 0.0  0 /
DENSITY
 850 1000 1 /
SOLUTION
PRESSURE
 5*200 /
SWAT
 5*0.15 /
SGAS
 5*0.0 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'GI' 'G' 1 1 1000 'GAS' /
 'P1' 'G' 5 1 1000 'OIL' /
/
COMPDAT
 'GI' 1 1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 5 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'GI' 'GAS' 'OPEN' 'RATE' 3000 1* 400 /
/
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
TSTEP
 2 5 /
END
"""


def _satfunc(tmp_path):
    p = tmp_path / "H.DATA"
    p.write_text(DECK)
    state = load_state(str(p))
    return FluidSystem.from_state(state).sat, state


def _eps(sg_max, imb=1):
    e = np.full(14, np.nan)
    e[12] = sg_max
    e[13] = imb
    return jnp.asarray(e)


def test_killough_scanning_curve(tmp_path):
    sat, _ = _satfunc(tmp_path)
    # on the drainage curve while sg == sg_max
    kd = float(sat.krg(0.40, 0))
    assert kd == pytest.approx(0.35)
    assert float(sat.krg(0.40, 0, _eps(0.40))) == pytest.approx(kd, rel=1e-9)
    # decreasing sg from sg_max=0.4: scanning value below drainage
    ks = float(sat.krg(0.30, 0, _eps(0.40)))
    kd30 = float(sat.krg(0.30, 0))
    assert 0.0 <= ks < kd30
    # below the trapped-gas saturation the scanning curve hits zero
    # (Land: sgtr between sgcr_d=0.02 and sgcr_i=0.25)
    assert float(sat.krg(0.05, 0, _eps(0.40))) == pytest.approx(0.0, abs=1e-9)
    # with no gas history there is no hysteresis
    assert float(sat.krg(0.30, 0, _eps(0.0))) == pytest.approx(kd30)


def test_hysteresis_end_to_end(tmp_path):
    p = tmp_path / "H.DATA"
    p.write_text(DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.cells.eps is not None and sim.cells.eps.shape[1] == 15
    sim.run()
    eps = np.asarray(sim.cells.eps)
    # gas invaded near the injector: sg_max tracked above zero
    assert eps[0, 12] > 0.01
    # the oil/water scanning state tracks the historical minimum Sw
    assert np.all(eps[:, 14] <= 0.15 + 1e-12)


# ---------------------------------------------------------------------------
# Water/oil (non-wetting oil) Killough hysteresis — VERDICT r2 missing #7
# ---------------------------------------------------------------------------

# drainage SWOF (region 1): residual oil 1 - 0.85 = 0.15
# imbibition SWOF (region 2): krow -> 0 at sw = 0.65 -> trapped oil 0.35
OW_DECK = DECK.replace(
    """SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /""",
    """SWOF
 0.15 0.00  0.90 0.9
 0.50 0.20  0.30 0.4
 0.85 0.60  0.0  0.1
 1.00 1.00  0.0  0.0 /
 0.15 0.00  0.80 0.7
 0.40 0.15  0.40 0.3
 0.65 0.45  0.0  0.05
 1.00 1.00  0.0  0.0 /""")


def _ow_satfunc(tmp_path, model=2):
    p = tmp_path / "OW.DATA"
    p.write_text(OW_DECK.replace("EHYSTR\n 0.1 2 /",
                                 f"EHYSTR\n 0.1 {model} /"))
    state = load_state(str(p))
    return FluidSystem.from_state(state).sat, state


def _eps_ow(sw_min, imb=1):
    e = np.full(15, np.nan)
    e[13] = imb
    e[14] = sw_min
    return jnp.asarray(e)


def test_killough_ow_scanning_curve(tmp_path):
    """Oil-phase scanning on rising Sw: trapped oil per Land's relation
    between the drainage (So_r=0.15) and imbibition (So_r=0.35) curves
    (EclHysteresisTwoPhaseLaw applied to the oil/water system)."""
    sat, _ = _ow_satfunc(tmp_path)
    # on the drainage curve while sw == sw_min (still draining)
    kd = float(sat.krow(0.50, 0))
    assert kd == pytest.approx(0.30)
    assert float(sat.krow(0.50, 0, _eps_ow(0.50))) == pytest.approx(
        kd, rel=1e-9)
    # rising sw from sw_min=0.3 (so_max=0.7): scanning below drainage
    ks = float(sat.krow(0.55, 0, _eps_ow(0.30)))
    kd55 = float(sat.krow(0.55, 0))
    assert 0.0 <= ks < kd55
    # at the trapped-oil saturation the oil is immobile: Land between
    # socr_d=0.15 and socr_i=0.35 with so_max=0.7 gives so_tr ~ 0.30
    so_tr_expected = 0.15 + 0.55 / (1.0 + (1 / 0.2 - 1 / 0.85) * 0.55)
    sw_at_trap = 1.0 - so_tr_expected + 0.02
    assert float(sat.krow(sw_at_trap, 0, _eps_ow(0.30))) == pytest.approx(
        0.0, abs=1e-9)
    # no water history -> pure drainage
    assert float(sat.krow(0.55, 0, _eps_ow(np.nan)))== pytest.approx(kd55)


def test_killough_ow_pc_scanning(tmp_path):
    """EHYSTR model 1 adds Killough Pc scanning between the drainage
    and imbibition capillary curves; model 2 leaves Pc on drainage."""
    sat1, _ = _ow_satfunc(tmp_path, model=1)
    sat2, _ = _ow_satfunc(tmp_path, model=2)
    assert sat1.hyst_pc_curv is not None
    assert sat2.hyst_pc_curv is None
    sw_min = 0.30
    # at the reversal point the scanning curve starts on drainage
    pc_rev = float(sat1.pcow(sw_min, 0, _eps_ow(sw_min)))
    assert pc_rev == pytest.approx(float(sat1.pcow(sw_min, 0)), rel=1e-9)
    # rising sw: scanning moves from the drainage toward the (lower)
    # imbibition curve, staying between them
    for sw in (0.45, 0.55, 0.62):
        pc_d = float(sat1.pcow(sw, 0))
        e = _eps_ow(sw_min)
        pc_i = float(sat1._pcow_raw(jnp.asarray(sw), 0, e,
                                    imb_row=jnp.asarray(1)))
        pc_s = float(sat1.pcow(sw, 0, e))
        lo, hi = min(pc_d, pc_i), max(pc_d, pc_i)
        assert lo - 1e-12 <= pc_s <= hi + 1e-12
    # model 2: drainage everywhere
    assert float(sat2.pcow(0.55, 0, _eps_ow(sw_min))) == pytest.approx(
        float(sat2.pcow(0.55, 0)), rel=1e-9)
