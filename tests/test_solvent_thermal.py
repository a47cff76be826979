"""Solvent (Todd-Longstaff) and thermal (energy) model variants
(reference: flow/flow_ebos_solvent.cpp, flow_ebos_energy.cpp; opm-models
blackoilsolventmodules/blackoilenergymodules)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

SOLVENT_DECK = """RUNSPEC
DIMENS
 8 1 1 /
OIL
WATER
GAS
SOLVENT
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 8*20 /
DY
 8*20 /
DZ
 8*5 /
TOPS
 8*1000 /
PORO
 8*0.25 /
PERMX
 8*500 /
PROPS
PVTW
 200 1.02 4.0E-5 0.5 0 /
PVDO
 100 1.05 2.0
 400 1.02 2.0 /
PVDG
 100 0.012 0.015
 400 0.003 0.018 /
PVDS
-- solvent: much thinner than gas
 100 0.010 0.002
 400 0.0025 0.003 /
TLMIXPAR
 0.8 /
ROCK
 200 4E-5 /
SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
SGOF
 0.0  0.0  0.90 0
 0.5  0.4  0.20 0
 0.85 0.9  0.0  0 /
DENSITY
 850 1000 1 /
SOLUTION
PRESSURE
 8*200 /
SWAT
 8*0.15 /
SGAS
 8*0.0 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'GI' 'G' 1 1 1000 'GAS' /
 'P1' 'G' 8 1 1000 'OIL' /
/
COMPDAT
 'GI' 1 1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 8 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'GI' 'GAS' 'OPEN' 'RATE' 4000 1* 400 /
/
WSOLVENT
 'GI' 1.0 /
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
TSTEP
 2 5 10 /
END
"""


def test_solvent_transport_and_mixing(tmp_path):
    """Operator-split fallback (solvent_implicit=False): the lagged
    Todd-Longstaff feedback of models/components.py."""
    p = tmp_path / "S.DATA"
    # short schedule: with consistent transport fluxes the front fully
    # sweeps the 8-cell line in 17 days; keep it in transit
    p.write_text(SOLVENT_DECK.replace("TSTEP\n 2 5 10 /",
                                      "TSTEP\n 1 2 3 /"))
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(solvent_implicit=False))
    assert sim.trans4 is None
    sim.run()
    assert sim.components.has_solvent
    c = np.asarray(sim.components.c_solv)
    # solvent front: full strength at the injector, dropping downstream
    assert c[0] > 0.5
    assert c[-1] < c[0]
    # thinner mixed gas -> gas mobility multiplier > 1 near the injector
    mm = np.asarray(sim.cells.mob_mult)
    assert mm[0, 2] > 1.2
    assert mm[-1, 2] < mm[0, 2]


def test_solvent_implicit(tmp_path):
    """Fully-implicit immiscible Todd-Longstaff solvent (the default;
    reference flow_ebos_solvent's 4-equation block system): the solvent
    fraction of the gas stream is the 4th primary variable and the TL
    mobility coupling sits in the Jacobian (models/transport4.py)."""
    from opm_autodiff_tpu.models.transport4 import tl_factor

    p = tmp_path / "SI.DATA"
    # shorter schedule: keep the front in transit (the coupled front
    # runs ahead of the split one — 17 days fully sweeps the line)
    p.write_text(SOLVENT_DECK.replace("TSTEP\n 2 5 10 /",
                                      "TSTEP\n 1 2 3 /"))
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.trans4 is not None and sim._trans4_kind == "solvent"
    assert not sim.components.has_solvent  # split path disabled
    assert sim.u.shape[1] == 4
    sim.run()
    c = np.asarray(sim.u[:, 3])
    # solvent front: full strength at the injector, dropping downstream
    assert c[0] > 0.5
    assert c[-1] < c[0]
    assert np.all(c >= 0.0) and np.all(c <= 1.1)
    # thinner mixed gas -> TL gas-stream mobility multiplier > 1 at the
    # injector's (c, p)
    f0 = float(tl_factor(sim.fs, sim.trans4.tl, float(c[0]),
                         float(sim.u[0, 0])))
    assert f0 > 1.2
    assert np.asarray(sim.trans4.phase_mask).tolist() == [0.0, 0.0, 1.0]


def test_solvent_implicit_matches_split_at_small_dt(tmp_path):
    """At resolved timesteps the implicit and split answers agree on a
    genuine advection front: pre-existing gas (Sg=0.10) everywhere, the
    injected solvent fraction displacing it. (With zero initial gas the
    fraction field is degenerate — every molecule of in-domain gas IS
    injected solvent, the implicit answer snaps to 1 and the split one
    lags on near-zero carrier mass; that regime is covered by
    test_solvent_implicit.) The split model's one-substep mobility lag
    vanishes as dt -> 0."""
    deck = SOLVENT_DECK.replace("TSTEP\n 2 5 10 /", "TSTEP\n 10*0.5 /")
    deck = deck.replace("SGAS\n 8*0.0 /", "SGAS\n 8*0.10 /")
    deck = deck.replace("SWAT\n 8*0.15 /", "SWAT\n 8*0.15 /")
    p = tmp_path / "SC.DATA"
    p.write_text(deck)
    sim_i = Simulator(load_state(str(p)), SimulatorOptions())
    sim_i.run()
    sim_s = Simulator(load_state(str(p)),
                      SimulatorOptions(solvent_implicit=False))
    sim_s.run()
    c_i = np.asarray(sim_i.u[:, 3])
    c_s = np.asarray(sim_s.components.c_solv)
    np.testing.assert_allclose(c_i, c_s, atol=0.12)
    # both fronts in transit: injector-side cells solvent-rich, far
    # cells still dilute
    assert c_i[0] > 0.8 and c_i[-1] < 0.5
    np.testing.assert_allclose(np.asarray(sim_i.u[:, 0]),
                               np.asarray(sim_s.u[:, 0]), rtol=2e-2)


def test_miscible_solvent_stays_split(tmp_path):
    """MISCIBLE decks keep the operator-split model (it owns the
    MISC/PMISC/MSFN machinery) even with solvent_implicit=True."""
    deck = SOLVENT_DECK.replace("SOLVENT\n", "SOLVENT\nMISCIBLE\n")
    deck = deck.replace("TLMIXPAR\n 0.8 /\n", """TLMIXPAR
 0.8 /
MISC
 0.0 0.0
 1.0 1.0 /
""")
    p = tmp_path / "SM.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.trans4 is None
    assert sim.components.has_solvent and sim.components.has_misc


THERMAL_DECK = """RUNSPEC
DIMENS
 8 1 1 /
OIL
WATER
THERMAL
METRIC
START
 1 'JAN' 2020 /
GRID
DX
 8*20 /
DY
 8*20 /
DZ
 8*5 /
TOPS
 8*1000 /
PORO
 8*0.25 /
PERMX
 8*500 /
PROPS
PVTW
 200 1.02 4.0E-5 0.5 0 /
PVDO
 100 1.05 10.0
 400 1.02 10.0 /
ROCK
 200 4E-5 /
SWOF
 0.15 0.00  0.90 0
 0.50 0.20  0.30 0
 0.85 0.60  0.0  0
 1.00 1.00  0.0  0 /
DENSITY
 850 1000 1 /
SPECROCK
 0   2000
 300 2000 /
SPECHEAT
 0   2.0 4.2 2.2
 300 2.0 4.2 2.2 /
OILVISCT
-- heavy oil thins strongly with temperature
 20  10.0
 150 1.0 /
WATVISCT
 20  0.5
 150 0.2 /
SOLUTION
PRESSURE
 8*200 /
SWAT
 8*0.15 /
TEMPI
 8*20 /
SUMMARY
FOPR
SCHEDULE
WELSPECS
 'I1' 'G' 1 1 1000 'WATER' /
 'P1' 'G' 8 1 1000 'OIL' /
/
COMPDAT
 'I1' 1 1 1 1 'OPEN' 1* 1* 0.2 /
 'P1' 8 1 1 1 'OPEN' 1* 1* 0.2 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 60 1* 400 /
/
WTEMP
 'I1' 140 /
WCONPROD
 'P1' 'OPEN' 'BHP' 5* 150 /
/
TSTEP
 2 5 10 20 /
END
"""


def test_hot_waterflood_split(tmp_path):
    """Operator-split fallback (SimulatorOptions.energy_implicit=False):
    the original post-step transport with lagged viscosity feedback."""
    p = tmp_path / "T.DATA"
    p.write_text(THERMAL_DECK)
    sim = Simulator(load_state(str(p)),
                    SimulatorOptions(energy_implicit=False))
    assert sim.thermal.active and sim.energy is None
    T0 = np.asarray(sim.thermal.T).copy()
    assert T0[0] == pytest.approx(293.15, abs=0.1)  # TEMPI 20 C
    sim.run()
    T = np.asarray(sim.thermal.T)
    # hot front near the injector, cold far end
    assert T[0] > 350.0
    assert T[-1] < T[0]
    assert T.max() < 413.2 + 1.0  # never above injection temp (140 C)
    # thinned oil near the heat front: oil mobility multiplier > 1
    mm = np.asarray(sim.cells.mob_mult)
    assert mm[0, 1] > 2.0
    assert mm[-1, 1] == pytest.approx(1.0, abs=0.2)


def test_hot_waterflood_implicit(tmp_path):
    """Fully-implicit energy (the default; reference
    flow_ebos_energy's 4-equation block system): temperature is the 4th
    primary variable, the viscosity(T) coupling sits in the Jacobian."""
    from opm_autodiff_tpu.models.structured import StructuredTopology

    p = tmp_path / "TI.DATA"
    p.write_text(THERMAL_DECK)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.energy is not None
    assert not sim.thermal.active  # split transport disabled
    assert sim.u.shape[1] == 4
    # fully-active cartesian grid -> the 4-eq system rides the banded
    # fast path with conduction bands (assemble_structured4 fdata)
    assert isinstance(sim.faces, StructuredTopology)
    assert sim.energy.cond_bands is not None
    T0 = np.asarray(sim.u[:, 3]).copy()
    assert T0[0] == pytest.approx(293.15, abs=0.1)  # TEMPI 20 C
    sim.run()
    T = np.asarray(sim.u[:, 3])
    assert T[0] > 350.0
    assert T[-1] < T[0]
    assert T.max() < 413.2 + 1.0  # never above injection temp (140 C)


def test_implicit_matches_split_at_small_dt(tmp_path):
    """At resolved timesteps the implicit and split answers agree
    (VERDICT r2 #4 comparison half): the split model's lagged coupling
    error vanishes as dt -> 0, so both must land on the same
    temperature field."""
    deck = THERMAL_DECK.replace("TSTEP\n 2 5 10 20 /",
                                "TSTEP\n 8*0.5 /")
    p = tmp_path / "TC.DATA"
    p.write_text(deck)
    sim_i = Simulator(load_state(str(p)), SimulatorOptions())
    sim_i.run()
    sim_s = Simulator(load_state(str(p)),
                      SimulatorOptions(energy_implicit=False))
    sim_s.run()
    T_i = np.asarray(sim_i.u[:, 3])
    T_s = np.asarray(sim_s.thermal.T)
    np.testing.assert_allclose(T_i, T_s, atol=6.0)  # K
    # and the flow answers stay consistent too
    np.testing.assert_allclose(np.asarray(sim_i.u[:, 0]),
                               np.asarray(sim_s.u[:, 0]), rtol=2e-2)


def test_tempvd_initial_temperature(tmp_path):
    """TEMPVD: initial temperature from the depth table (reference:
    EclThermal initial conditions) — feeds both the split model and the
    implicit temperature column."""
    deck = THERMAL_DECK.replace(
        "TEMPI\n 8*20 /",
        "TEMPVD\n 900 120\n 1100 180 /\n/")
    p = tmp_path / "TV.DATA"
    p.write_text(deck)
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    assert sim.energy is not None
    T = np.asarray(sim.u[:, 3])
    d = np.asarray(sim.geo.depth)
    expect_c = 120 + (180 - 120) * (d - 900) / 200.0
    np.testing.assert_allclose(T, expect_c + 273.15, rtol=1e-6)
