"""Embedded banded path for ACTNUM grids (models/structured.py
EmbeddedTopology): the compressed active state embeds into the full
cartesian box with identity rows, so inactive-cell decks keep the
banded TPU fast path instead of falling back to gathered BSR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.grid import build_geometry
from opm_autodiff_tpu.io.state import load_state
from opm_autodiff_tpu.models.assembler import assemble_system, bsr_matvec
from opm_autodiff_tpu.models.blackoil import (PrimaryState, accumulation,
                                              statics_from_geometry)
from opm_autodiff_tpu.models.init import equilibrate
from opm_autodiff_tpu.models.structured import (EmbeddedTopology,
                                                assemble_structured,
                                                embed_cells, embedded_ok,
                                                pin_inactive,
                                                structured_matvec)
from opm_autodiff_tpu.props import FluidSystem
from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions


@pytest.fixture(scope="module")
def actnum_deck(tmp_path_factory, spe1_deck_path):
    """SPE1 with a handful of inactive cells."""
    text = open(spe1_deck_path).read()
    actnum = ["1"] * 300
    for i in (5, 55, 98, 150, 151, 152, 290):
        actnum[i] = "0"
    text = text.replace("PROPS",
                        "ACTNUM\n " + " ".join(actnum) + " /\n\nPROPS", 1)
    p = tmp_path_factory.mktemp("emb") / "A.DATA"
    p.write_text(text)
    return str(p)


@pytest.fixture(scope="module")
def setup(actnum_deck):
    state = load_state(actnum_deck)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, emb = statics_from_geometry(geo)
    _, facelist = statics_from_geometry(geo, structured="never")
    init = equilibrate(state, geo, fs)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref) * 1.01
    return geo, fs, cells, emb, facelist, init, acc0


def test_embedded_selected(setup):
    geo, fs, cells, emb, facelist, init, acc0 = setup
    assert embedded_ok(geo)
    assert isinstance(emb, EmbeddedTopology)
    assert int(emb.mask.sum()) == geo.num_active
    assert emb.topo.trans_x.shape == (3, 10, 9)


def test_embedded_assembly_matches_bsr(setup):
    """Residual/Jacobian action on active rows must match the face-list
    assembly exactly (same physics, different layout)."""
    geo, fs, cells, emb, facelist, init, acc0 = setup
    dt = 86400.0
    rng = np.random.default_rng(0)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.02 * rng.standard_normal(len(u))
    u[:, 1] = 0.2 + 0.4 * rng.random(len(u))
    ps = PrimaryState(jnp.asarray(u), init.flag)

    sys_b = assemble_system(fs, cells, facelist, ps, acc0, dt)

    u_f = ps.u[emb.fill]
    flag_f = ps.flag[emb.fill]
    acc0_f = jnp.zeros((emb.mask.shape[0], 3)).at[emb.act].set(acc0)
    sys_e = assemble_structured(fs, embed_cells(emb, cells), emb.topo,
                                PrimaryState(u_f, flag_f), acc0_f, dt)
    sys_e = pin_inactive(sys_e, emb.mask)

    act = np.asarray(emb.act)
    np.testing.assert_allclose(np.asarray(sys_e.residual)[act],
                               np.asarray(sys_b.residual), rtol=1e-12)
    # inactive rows are exact identity equations
    inact = ~np.asarray(emb.mask)
    np.testing.assert_allclose(np.asarray(sys_e.residual)[inact], 0.0)
    np.testing.assert_allclose(np.asarray(sys_e.diag)[inact],
                               np.broadcast_to(np.eye(3),
                                               (inact.sum(), 3, 3)))

    # matvec equivalence through the embedding
    x_act = rng.standard_normal((geo.num_active, 3))
    x_full = np.zeros((emb.mask.shape[0], 3))
    x_full[act] = x_act
    y_full = np.asarray(structured_matvec(sys_e, jnp.asarray(x_full)))
    y_act = np.asarray(bsr_matvec(sys_b, jnp.asarray(x_act)))
    np.testing.assert_allclose(y_full[act], y_act, rtol=1e-11,
                               atol=1e-9 * np.abs(y_act).max() + 1e-300)
    # identity rows act as identity
    np.testing.assert_allclose(y_full[inact], x_full[inact])


def test_actnum_deck_runs_end_to_end(actnum_deck):
    sim = Simulator(load_state(actnum_deck), SimulatorOptions())
    assert isinstance(sim.faces, EmbeddedTopology)
    for _ in range(4):
        sim.step()
    rows = sim.summary.rows
    assert rows[-1]["FOPR"] > 0
    # field pressure stays physical (SPE1 init ~4800 psia)
    assert 2.0e7 < rows[-1]["FPR"] * 6894.757 < 5.0e7
