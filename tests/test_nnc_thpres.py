"""NNC (explicit connections) and THPRES (threshold pressure) tests.

Reference analogs: ecltransmissibility.cc:487 NNC application;
eclthresholdpressure.hh + eclfluxmodule.hh:327 deadband.
"""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


_counter = [0]


def _deck(tmp_path, extra_grid="", extra_sol="", regions=""):
    from opm_autodiff_tpu.utils.synthetic import spe1_deck_text

    text = spe1_deck_text(6, 1, 1, tstep_days="1 5 10 30")
    text = text.replace("PROPS\n", extra_grid + "PROPS\n", 1)
    text = text.replace("SOLUTION\n", regions + "SOLUTION\n", 1)
    text = text.replace("SUMMARY\n", extra_sol + "SUMMARY\n", 1)
    _counter[0] += 1
    p = tmp_path / f"NT{_counter[0]}.DATA"
    p.write_text(text)
    return str(p)


def test_nnc_adds_faces(tmp_path):
    nnc = "NNC\n 1 1 1 6 1 1 5.0 /\n/\n"
    deck = _deck(tmp_path, extra_grid=nnc)
    geo = build_geometry(load_state(deck))
    f = geo.faces
    assert (f.axis == 3).sum() == 1
    i = np.nonzero(f.axis == 3)[0][0]
    assert f.left[i] == geo.act_index(0, 0, 0)
    assert f.right[i] == geo.act_index(5, 0, 0)
    assert f.trans[i] == pytest.approx(5.0 * U.FIELD.transmissibility)
    # NNC leaves the plain banded path but rides the embedded path's
    # COO extras (models/structured.py EmbeddedTopology)
    from opm_autodiff_tpu.models.blackoil import statics_from_geometry
    from opm_autodiff_tpu.models.structured import (EmbeddedTopology,
                                                    structured_ok)
    assert not structured_ok(geo)
    _, topo = statics_from_geometry(geo)
    assert isinstance(topo, EmbeddedTopology)
    assert topo.ex_left is not None and topo.ex_left.shape[0] == 1
    assert float(topo.ex_trans[0]) == pytest.approx(
        5.0 * U.FIELD.transmissibility)


def test_nnc_carries_flow(tmp_path):
    """A huge NNC between the two ends of a 1D bar equalizes pressure
    much faster than the plain bar."""
    nnc = "NNC\n 1 1 1 6 1 1 500.0 /\n/\n"
    d_plain = _deck(tmp_path, extra_grid="")
    d_nnc = _deck(tmp_path, extra_grid=nnc)

    def drawdown_spread(path):
        sim = Simulator(load_state(path), SimulatorOptions())
        sim.step()
        p = np.asarray(sim.u[:, 0])
        # injector at cell 0 raises pressure; NNC shorts it to cell 5
        return p[5] - p[3]

    assert drawdown_spread(d_nnc) > drawdown_spread(d_plain) + 1.0


def test_thpres_blocks_small_gradient(tmp_path):
    """A large threshold between region 1 and 2 blocks cross-flow."""
    eql = "REGIONS\nEQLNUM\n 3*1 3*2 /\n"
    thp = "THPRES\n 1 2 2000 /\n/\n"
    deck_open = _deck(tmp_path)
    deck_blocked = _deck(tmp_path, extra_grid="", extra_sol=thp,
                         regions=eql)

    geo_b = build_geometry(load_state(deck_blocked))
    f = geo_b.faces
    # the region boundary face (between cells 2 and 3) carries 2000 psi
    i = np.nonzero((f.left == 2) & (f.right == 3))[0][0]
    assert f.thpres[i] == pytest.approx(2000 * U.PSI)

    def influx_reach(path):
        sim = Simulator(load_state(path), SimulatorOptions())
        sim.step()
        sim.step()
        p = np.asarray(sim.u[:, 0])
        return p[4] - 4800 * U.PSI  # pressure rise past the boundary

    rise_open = influx_reach(deck_open)
    rise_blocked = influx_reach(deck_blocked)
    # injection at cell 0 pressurizes region 1; the threshold damps what
    # crosses into region 2
    assert rise_blocked < rise_open - 1.0


def test_thpres_defaulted_from_equilibration(tmp_path):
    """A THPRES record with the threshold defaulted gets the maximum
    initial phase-potential difference across the region boundary
    (reference: eclthresholdpressure.hh:183
    computeDefaultThresholdPressures_), so two-region equilibration
    offsets do not drive spurious flow."""
    eql = "REGIONS\nEQLNUM\n 3*1 3*2 /\n"
    thp = "THPRES\n 1 2 /\n/\n"
    path = _deck(tmp_path, extra_sol=thp, regions=eql)
    # second EQUIL record: region 2 sits 100 psi higher at datum
    text = open(path).read().replace(
        "EQUIL\n 8400 4800 8500 0 8200 0 1 0 0 /",
        "EQUIL\n 8400 4800 8500 0 8200 0 1 0 0 /\n"
        " 8400 4900 8500 0 8200 0 1 0 0 /")
    open(path, "w").write(text)

    sim = Simulator(load_state(path), SimulatorOptions())
    f = sim.geo.faces
    i = np.nonzero((f.left == 2) & (f.right == 3))[0][0]
    # flat single-layer grid: the max potential difference is the datum
    # offset (plus small capillary/density detail)
    assert f.thpres[i] == pytest.approx(100 * U.PSI, rel=0.15)
    # the device statics carry the filled threshold too
    import jax.numpy as jnp
    emb = sim.faces
    thr = (np.asarray(emb.ex_thpres)
           if hasattr(emb, "ex_thpres") and emb.ex_thpres is not None
           else np.asarray(sim.facelist.thpres))
    assert np.max(thr) == pytest.approx(f.thpres[i], rel=1e-12)


def test_editnnc_scales_nnc_trans(tmp_path):
    """EDITNNC multiplies the transmissibility of the named NNC
    (reference: ecltransmissibility.cc applyEditNncToGridTrans_);
    repeated records accumulate multiplicatively."""
    nnc = ("NNC\n 1 1 1 6 1 1 5.0 /\n/\n"
           "EDITNNC\n 1 1 1 6 1 1 0.5 /\n 1 1 1 6 1 1 0.4 /\n/\n")
    deck = _deck(tmp_path, extra_grid=nnc)
    geo = build_geometry(load_state(deck))
    f = geo.faces
    i = np.nonzero(f.axis == 3)[0][0]
    assert f.trans[i] == pytest.approx(
        5.0 * 0.5 * 0.4 * U.FIELD.transmissibility)
