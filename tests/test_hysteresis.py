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
    assert sim.cells.eps is not None and sim.cells.eps.shape[1] == 14
    sim.run()
    eps = np.asarray(sim.cells.eps)
    # gas invaded near the injector: sg_max tracked above zero
    assert eps[0, 12] > 0.01
