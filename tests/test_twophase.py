"""Two-phase model variants: oil-water (waterflood) and gas-oil.

Reference analog: the per-phase-set flow variant binaries
(flow/flow_ebos_oilwater.cpp, flow_ebos_gasoil.cpp, SURVEY.md §2.1);
here the same 3-equation trace with statically pinned inactive phases.
"""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

OW_DECK = """RUNSPEC
DIMENS
 20 1 1 /
OIL
WATER
FIELD
START
 1 'JAN' 2020 /
GRID
DX
 20*50 /
DY
 20*50 /
DZ
 20*20 /
TOPS
 20*4000 /
PORO
 20*0.25 /
PERMX
 20*300 /
PROPS
PVTW
 4000 1.01 3.0E-6 0.4 0 /
PVDO
 400  1.06 2.0
 4000 1.04 2.0
 8000 1.02 2.0 /
ROCK
 4000 4E-6 /
SWOF
 0.20 0.00  0.95 0
 0.30 0.02  0.70 0
 0.40 0.06  0.45 0
 0.50 0.12  0.25 0
 0.60 0.20  0.11 0
 0.70 0.32  0.028 0
 0.80 0.50  0.0  0
 1.00 1.00  0.0  0 /
DENSITY
 52 64 0.06 /
SOLUTION
PRESSURE
 20*4000 /
SWAT
 20*0.2 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'INJ'  'G' 1  1 4010 'WATER' /
 'PROD' 'G' 20 1 4010 'OIL' /
/
COMPDAT
 'INJ'  1  1 1 1 'OPEN' 1* 1* 0.5 /
 'PROD' 20 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONINJE
 'INJ' 'WATER' 'OPEN' 'RATE' 1000 1* 8000 /
/
WCONPROD
 'PROD' 'OPEN' 'LRAT' 2* 1* 1000 1* 1500 /
/
TSTEP
 1 2 5 10 20 30 30 50 50 60 60 /
END
"""

GO_DECK = """RUNSPEC
DIMENS
 10 1 1 /
OIL
GAS
DISGAS
FIELD
START
 1 'JAN' 2020 /
GRID
DX
 10*100 /
DY
 10*100 /
DZ
 10*30 /
TOPS
 10*6000 /
PORO
 10*0.2 /
PERMX
 10*200 /
PROPS
PVDG
 14.7     200.0   0.010
 1014.7   3.1     0.014
 3014.7   1.05    0.022
 6014.7   0.52    0.030 /
PVTO
 0.2    1014.7  1.15  0.9 /
 0.5    3014.7  1.25  0.7
        6014.7  1.22  0.8 /
 0.8    6014.7  1.35  0.6 /
/
ROCK
 14.7 3E-6 /
SGOF
 0.0  0.0   1.0   0
 0.1  0.01  0.70  0
 0.2  0.06  0.45  0
 0.4  0.25  0.12  0
 0.6  0.55  0.01  0
 0.8  0.95  0.0   0 /
DENSITY
 53 64 0.06 /
SOLUTION
PRESSURE
 10*3500 /
SWAT
 10*0.0 /
RS
 10*0.5 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'GINJ' 'G' 1  1 6015 'GAS' /
 'PROD' 'G' 10 1 6015 'OIL' /
/
COMPDAT
 'GINJ' 1  1 1 1 'OPEN' 1* 1* 0.5 /
 'PROD' 10 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONINJE
 'GINJ' 'GAS' 'OPEN' 'RATE' 2000 1* 7000 /
/
WCONPROD
 'PROD' 'OPEN' 'ORAT' 800 4* 1000 /
/
TSTEP
 1 2 5 10 20 30 60 60 /
END
"""


@pytest.fixture(scope="module")
def ow_sim(tmp_path_factory):
    p = tmp_path_factory.mktemp("ow") / "OW.DATA"
    p.write_text(OW_DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_oilwater_phase_config(ow_sim):
    assert not ow_sim.opts.newton.has_gas
    assert ow_sim.opts.newton.has_water
    # x3 (gas variable) frozen at 0, flags never switch
    u = np.asarray(ow_sim.u)
    np.testing.assert_allclose(u[:, 2], 0.0, atol=1e-12)
    sats = ow_sim.get_saturations()
    np.testing.assert_allclose(sats["SGAS"], 0.0, atol=1e-12)


def test_oilwater_waterflood_front(ow_sim):
    sats = ow_sim.get_saturations()
    sw = sats["SWAT"]
    # water bank near injector, front decreasing toward producer
    assert sw[0] > 0.6
    assert sw[0] > sw[10] >= sw[19] - 1e-9
    assert np.all(sw >= 0.2 - 1e-9)
    # material balance: injected water == water accumulated + produced
    assert ow_sim.cum["FWIT"] > 0
    dwat = ow_sim.cum["FWIT"] - ow_sim.cum["FWPT"]
    assert dwat > 0


def test_oilwater_production(ow_sim):
    rows = ow_sim.summary.rows
    # early: producer BHP-limited at its 1500 psia floor (injector
    # support has not arrived), liquid below the LRAT target
    r0 = rows[0]
    assert r0["WBHP:PROD"] == pytest.approx(1500, rel=1e-3)
    assert r0["WOPR:PROD"] + r0["WWPR:PROD"] < 1000
    # after voidage support arrives: LRAT control at 1000 stb/d
    r_mid = rows[5]
    liquid = r_mid["WOPR:PROD"] + r_mid["WWPR:PROD"]
    assert liquid == pytest.approx(1000, rel=1e-2)
    assert r_mid["WBHP:PROD"] > 1500 * 1.01
    # water cut rises to ~1 after breakthrough
    r_end = rows[-1]
    wct_end = r_end["WWPR:PROD"] / (r_end["WWPR:PROD"] + r_end["WOPR:PROD"])
    assert wct_end > 0.9
    assert r_end["FGPR"] == 0.0  # no gas anywhere


@pytest.fixture(scope="module")
def go_sim(tmp_path_factory):
    p = tmp_path_factory.mktemp("go") / "GO.DATA"
    p.write_text(GO_DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_gasoil_phase_config(go_sim):
    assert not go_sim.opts.newton.has_water
    assert go_sim.opts.newton.has_gas
    u = np.asarray(go_sim.u)
    np.testing.assert_allclose(u[:, 1], 0.0, atol=1e-12)  # sw frozen


def test_gasoil_gasflood(go_sim):
    sats = go_sim.get_saturations()
    sg = sats["SGAS"]
    # free gas appears near the injector (pressure above bubble point
    # initially; injection creates a gas bank)
    assert sg[0] > 0.05
    assert sg[0] >= sg[-1]
    rows = go_sim.summary.rows
    assert rows[0]["WOPR:PROD"] == pytest.approx(800, rel=1e-2)
    assert rows[0]["FWPR"] == 0.0
    # gas material balance within 1%
    import jax

    from opm_autodiff_tpu.models.blackoil import accumulation
    from opm_autodiff_tpu.models.init import explicit_init
    init = explicit_init(go_sim.state, go_sim.geo)
    acc0 = np.asarray(jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        go_sim.fs, init.u, init.flag, go_sim.cells.pore_vol_ref))
    acc1 = np.asarray(go_sim.acc0)
    dgas = (acc1 - acc0)[:, 2].sum()
    net = go_sim.cum["FGIT"] - go_sim.cum["FGPT"]
    assert dgas == pytest.approx(net, rel=1e-2)
