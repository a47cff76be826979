"""Structured (banded) fast path vs the general face-list path."""

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
from opm_autodiff_tpu.models.structured import (StructuredTopology,
                                                assemble_structured,
                                                structured_matvec,
                                                structured_ok)
from opm_autodiff_tpu.props import FluidSystem


@pytest.fixture(scope="module")
def setup(spe1_deck_path):
    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, topo = statics_from_geometry(geo)
    _, facelist = statics_from_geometry(geo, structured="never")
    init = equilibrate(state, geo, fs)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref) * 1.01
    return geo, fs, cells, topo, facelist, init, acc0


def test_auto_selects_structured(setup):
    geo, fs, cells, topo, facelist, init, acc0 = setup
    assert structured_ok(geo)
    assert isinstance(topo, StructuredTopology)


def test_assembly_equivalence(setup):
    geo, fs, cells, topo, facelist, init, acc0 = setup
    rng = np.random.default_rng(0)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.03 * rng.standard_normal(len(u))
    u[:, 1] = 0.2 + 0.4 * rng.random(len(u))
    ps = PrimaryState(jnp.asarray(u), init.flag)
    dt = 86400.0
    sys_b = assemble_system(fs, cells, facelist, ps, acc0, dt)
    sys_s = assemble_structured(fs, cells, topo, ps, acc0, dt)
    np.testing.assert_allclose(np.asarray(sys_s.residual),
                               np.asarray(sys_b.residual), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sys_s.diag),
                               np.asarray(sys_b.diag), rtol=1e-12)
    x = jnp.asarray(rng.standard_normal((len(u), 3)))
    yb = np.asarray(bsr_matvec(sys_b, x))
    ys = np.asarray(structured_matvec(sys_s, x))
    np.testing.assert_allclose(ys, yb, rtol=1e-11,
                               atol=1e-9 * np.abs(yb).max())


def test_inactive_grid_falls_back(tmp_path, spe1_deck_path):
    text = open(spe1_deck_path).read()
    actnum = ["1"] * 300
    actnum[55] = "0"
    text = text.replace("PROPS",
                        "ACTNUM\n " + " ".join(actnum) + " /\n\nPROPS", 1)
    p = tmp_path / "A.DATA"
    p.write_text(text)
    geo = build_geometry(load_state(str(p)))
    assert not structured_ok(geo)
    cells, faces = statics_from_geometry(geo)
    assert not isinstance(faces, StructuredTopology)


def test_banded_cpr_solves(setup):
    """CPR on the banded layout reduces the residual like the BSR CPR."""
    import jax.numpy as jnp

    from opm_autodiff_tpu.solvers.linear import solve_linear

    geo, fs, cells, topo, facelist, init, acc0 = setup
    sys_s = assemble_structured(fs, cells, topo, init, acc0, 86400.0)
    res = solve_linear(sys_s, tol=1e-3, maxiter=150, precond="cpr",
                       method="fgmres")
    assert bool(res.converged)
    # solution satisfies the f64 system to the requested reduction
    b = -sys_s.residual
    r = b - structured_matvec(sys_s, res.x)
    rel = float(jnp.linalg.norm(r.reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    assert rel < 2e-3


def test_packed_assembly_matches_reference_path(spe1_deck_path):
    """The packed-quantity fast assembly must reproduce the direct
    per-face jacfwd assembly exactly (same math, chain rule applied
    by hand)."""
    import jax
    import jax.numpy as jnp

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.models.blackoil import statics_from_geometry
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.models.structured import (assemble_structured,
                                                    assemble_structured_ref)
    from opm_autodiff_tpu.props import FluidSystem

    from opm_autodiff_tpu.io.state import load_state as _ls
    state = _ls(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, topo = statics_from_geometry(geo)
    init = equilibrate(state, geo, fs)
    import numpy as np
    rng = np.random.default_rng(0)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1.0 + 0.01 * rng.standard_normal(len(u))
    u[:, 1] = np.clip(u[:, 1] + 0.05 * rng.standard_normal(len(u)),
                      0.12, 0.9)
    u = jnp.asarray(u)
    from opm_autodiff_tpu.models.blackoil import PrimaryState, accumulation
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref, cells.regs)
    st = PrimaryState(u, init.flag)
    dt = jnp.asarray(86400.0)
    a = assemble_structured(fs, cells, topo, st, acc0, dt)
    b = assemble_structured_ref(fs, cells, topo, st, acc0, dt)
    for name in a._fields:
        vb_raw = getattr(b, name)
        if vb_raw is None:  # inv_b is a fast-path-only extra
            continue
        va, vb = np.asarray(getattr(a, name)), np.asarray(vb_raw)
        scale = np.abs(vb).max() + 1e-30
        assert np.abs(va - vb).max() / scale < 1e-12, name
