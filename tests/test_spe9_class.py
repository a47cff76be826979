"""SPE9-class synthetic case: 24x25x15 cells, 25 producers + 1 injector.

The real SPE9 deck's permeability field is external data; this synthetic
twin reproduces its *shape*: same dims, layered heterogeneity via
EQUALS, a 25-producer/1-injector pattern under field group control
(reference regression family: spe9/spe9group, SURVEY.md §4).
Exercises: batched wells at scale, group apportioning, BOX operations,
the structured fast path at 9000 cells.
"""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

NX, NY, NZ = 24, 25, 15
LAYER_PERMS = [150, 60, 40, 20, 300, 500, 80, 30, 250, 100,
               70, 200, 15, 120, 90]


def _deck():
    n = NX * NY * NZ
    eq = "EQUALS\n"
    for k, kx in enumerate(LAYER_PERMS):
        eq += f" 'PERMX' {kx} 1 {NX} 1 {NY} {k+1} {k+1} /\n"
    eq += "/\nCOPY\n 'PERMX' 'PERMY' /\n/\nEQUALS\n"
    for k, kx in enumerate(LAYER_PERMS):
        eq += f" 'PERMZ' {kx / 10} 1 {NX} 1 {NY} {k+1} {k+1} /\n"
    eq += "/\n"

    wells_spec, compdat, conprod = "", "", ""
    wnames = []
    idx = 0
    for jw in range(5):
        for iw in range(5):
            name = f"P{idx+1}"
            wnames.append(name)
            i = 2 + iw * 5
            j = 2 + jw * 5
            wells_spec += f" '{name}' 'PLAT' {i} {j} 9120 'OIL' /\n"
            compdat += f" '{name}' {i} {j} 12 15 'OPEN' 1* 1* 0.5 /\n"
            conprod += f" '{name}' 'OPEN' 'GRUP' 5* 1000 /\n"
            idx += 1
    wells_spec += f" 'INJ1' 'G2' 24 25 9110 'WATER' /\n"
    compdat += f" 'INJ1' 24 25 10 15 'OPEN' 1* 1* 0.5 /\n"

    return f"""RUNSPEC
DIMENS
 {NX} {NY} {NZ} /
OIL
WATER
GAS
DISGAS
FIELD
WELLDIMS
 26 15 2 26 /
START
 1 'JAN' 2015 /
GRID
DX
 {n}*300 /
DY
 {n}*300 /
DZ
 {n}*20 /
TOPS
 {NX*NY}*9000 /
PORO
 {n}*0.13 /
{eq}PROPS
PVTW
 3600 1.0034 1E-6 0.96 0 /
ROCK
 3600 1E-6 /
SWOF
 0.15 0.0    1.0   0
 0.30 0.02   0.58  0
 0.45 0.08   0.25  0
 0.60 0.19   0.08  0
 0.75 0.36   0.01  0
 0.90 0.59   0.0   0
 1.00 0.80   0.0   0 /
SGOF
 0.0  0.0    1.0   0
 0.1  0.01   0.60  0
 0.2  0.07   0.30  0
 0.35 0.22   0.10  0
 0.5  0.42   0.02  0
 0.7  0.80   0.0   0 /
DENSITY
 44.98 63.0 0.0702 /
PVDG
 14.7   178.08  0.0125
 1014.7 2.55    0.0140
 2514.7 1.05    0.0180
 4014.7 0.66    0.0225 /
PVTO
 0.18  1014.7 1.10  1.14 /
 0.50  2514.7 1.24  0.85
       4014.7 1.21  0.95 /
 0.80  4014.7 1.38  0.64 /
/
SOLUTION
EQUIL
 9035 3600 9950 0 8800 0 1 0 0 /
RSVD
 8800 0.50
 9950 0.50 /
SUMMARY
FOPR
SCHEDULE
GRUPTREE
 'PLAT' 'FIELD' /
/
WELSPECS
{wells_spec}/
COMPDAT
{compdat}/
GCONPROD
 'PLAT' 'ORAT' 12000 /
/
WCONPROD
{conprod}/
WCONINJE
 'INJ1' 'WATER' 'OPEN' 'RATE' 5000 1* 6000 /
/
TSTEP
 1 4 10 15 30 30 /
END
"""


@pytest.fixture(scope="module")
def sim(tmp_path_factory):
    p = tmp_path_factory.mktemp("spe9") / "SPE9C.DATA"
    p.write_text(_deck())
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_scale_and_paths(sim):
    from opm_autodiff_tpu.models.structured import StructuredTopology

    assert sim.geo.num_active == NX * NY * NZ
    assert isinstance(sim.faces, StructuredTopology)
    # heterogeneity survived the BOX operations
    k0 = sim.geo.act_index(0, 0, 0)
    k5 = sim.geo.act_index(0, 0, 5)
    assert sim.geo.permx[k5] / sim.geo.permx[k0] == pytest.approx(500 / 150)


def test_group_target_met(sim):
    r0 = sim.summary.rows[0]
    total = sum(r0[f"WOPR:P{i+1}"] for i in range(25))
    assert total == pytest.approx(12000, rel=1e-2)
    assert r0["FOPR"] == pytest.approx(12000, rel=1e-2)
    # all 25 producers contribute
    assert all(r0[f"WOPR:P{i+1}"] > 50 for i in range(25))
    assert r0["WWIR:INJ1"] == pytest.approx(5000, rel=1e-2)


def test_run_health(sim):
    rep = sim.report
    assert rep.total_substeps < 40
    assert rep.total_newton_iterations / rep.total_substeps < 10
    # field pressure stays physical
    fpr = sim.summary.series("FPR")
    assert np.all((1000 < fpr) & (fpr < 6000))
