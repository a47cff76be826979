"""Analytic aquifer tests (reference analog: ctaquifer_2d / fetkovich_2d
regression families, SURVEY.md §4)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.aquifer import (CarterTracyAquifer,
                                             FetkovichAquifer, _veh_pd)
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


def _aquifer_deck(tmp_path, kind: str):
    """Depletion case (producer only) with an edge aquifer on I-."""
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(6, 6, 3, tstep_days="5 10 20 30 30 60 90")
    if kind == "fetkovich":
        aq = ("AQUFETP\n"
              "-- id depth  p0    v0      ct     pi\n"
              " 1 8400 4800 5.0E9 3E-6 500 /\n/\n")
    else:
        aq = ("AQUCT\n"
              "-- id depth  p0   perm poro  ct    r0    h  angle\n"
              " 1 8400 4800 200 0.3 3E-6 3000 100 1.0 /\n/\n")
    aq += ("AQUANCON\n"
           "-- id i1 i2 j1 j2 k1 k2 face\n"
           " 1 1 1 1 6 1 3 'I-' /\n/\n")
    text = text.replace("SCHEDULE\n", "SCHEDULE\n" + aq, 1)
    # drop the injector: pure depletion supported by the aquifer
    text = text.replace(" 'INJ'  'G1' 1  1  8335 'GAS' /\n", "")
    text = text.replace(" 'INJ'  1  1  1 1 'OPEN' 1* 1* 0.5 /\n", "")
    text = text.replace(
        "WCONINJE\n 'INJ' 'GAS' 'OPEN' 'RATE' 100000 1* 9014 /\n/\n", "")
    p = tmp_path / f"AQ_{kind}.DATA"
    p.write_text(text)
    return str(p)


def test_veh_influence_table():
    pd1, dpd1 = _veh_pd(1.0)
    assert pd1 == pytest.approx(0.802, abs=1e-3)
    # long-time log approximation continuous-ish with the table end
    pd_tab, _ = _veh_pd(99.9)
    pd_log, _ = _veh_pd(100.1)
    assert abs(pd_tab - pd_log) < 0.02
    assert _veh_pd(1e4)[0] == pytest.approx(0.5 * (np.log(1e4) + 0.80907))


@pytest.mark.parametrize("kind", ["fetkovich", "ct"])
def test_aquifer_pressure_support(tmp_path, kind):
    """Depletion with aquifer keeps pressure higher and water influx > 0."""
    deck_aq = _aquifer_deck(tmp_path, kind)
    sim_aq = Simulator(load_state(deck_aq), SimulatorOptions())
    assert sim_aq.aquifers is not None and sim_aq.aquifers.active
    sim_aq.run()

    # same deck without the aquifer keywords
    text = open(deck_aq).read()
    for kw in ("AQUFETP", "AQUCT", "AQUANCON"):
        while kw in text:
            start = text.index(kw)
            end = text.index("/\n/\n", start) + 4
            text = text[:start] + text[end:]
    deck_no = tmp_path / "NOAQ.DATA"
    deck_no.write_text(text)
    sim_no = Simulator(load_state(str(deck_no)), SimulatorOptions())
    assert sim_no.aquifers is None
    sim_no.run()

    faqt = sim_aq.cum["FAQT"]
    assert faqt > 0.0, "aquifer must flow in during depletion"
    fpr_aq = sim_aq.summary.series("FPR")[-1]
    fpr_no = sim_no.summary.series("FPR")[-1]
    assert fpr_aq > fpr_no + 1.0, (fpr_aq, fpr_no)
    # influx bounded by total voidage
    voidage = sim_aq.cum["FOPT"] * 2  # loose reservoir-volume bound
    assert faqt < max(voidage, 1e9)


def test_fetkovich_material_balance():
    aq = FetkovichAquifer(1, 2560.0, 3.3e7, 5e8, 4.4e-10, 1e-6)
    # deplete in steps against a fixed boundary pressure below p0
    p_wb = 3.0e7
    dt = 10 * 86400.0
    w_prev = 0.0
    for _ in range(50):
        c1, c2 = aq.coefficients(dt, 3e-4)
        q = c1 - c2 * p_wb
        assert q >= -1e-12
        aq.commit(q, dt, 3e-4)
        assert aq.w_flux >= w_prev - 1e-6  # roundoff once equilibrated
        w_prev = aq.w_flux
    # aquifer pressure declines toward the boundary pressure, never below
    pa = aq.aquifer_pressure()
    assert p_wb - 1e4 < pa < 3.3e7


def test_carter_tracy_monotone_influx():
    aq = CarterTracyAquifer(1, 2560.0, 3.3e7, 2e-13, 0.3, 4.4e-10,
                            900.0, 30.0, 1.0)
    p_wb = 3.1e7
    dt = 30 * 86400.0
    rates = []
    for _ in range(20):
        c1, c2 = aq.coefficients(dt, 3e-4)
        q = c1 - c2 * p_wb
        rates.append(q)
        aq.commit(q, dt, 3e-4)
    rates = np.asarray(rates)
    assert np.all(rates > 0)
    # constant-drawdown CT influx rate decays with time
    assert rates[-1] < rates[0]
    assert aq.w_flux == pytest.approx(rates.sum() * dt, rel=1e-12)
