"""y-blocked flux_bands (ops/pallas_flux._flux_bands_yblocked — the
scoped-VMEM guard for wide planes; the 56x46 norne-class plane blew the
16MB limit on v5e unblocked) vs the unblocked kernel: identical outputs
including ragged last blocks (ny % by != 0)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.ops import pallas_cellpack as pcp
from opm_autodiff_tpu.ops import pallas_flux


@pytest.fixture(scope="module")
def problem():
    import __graft_entry__

    # ny = 20: with OPM_TPU_FLUX_BY=8 -> blocks of 8, ragged last (4)
    return __graft_entry__._build_problem(6, 20, 4)


def _bands(problem, u, flag, acc0, topo):
    nx, ny, nz = topo.dims
    (_s, _g, fs, cells, *_r) = problem
    q5, dq5 = pcp.cellpack_planes(fs, cells, u, flag, (nz, ny, nx),
                                  interpret=True)
    return pallas_flux.flux_bands(q5, dq5, acc0, topo,
                                  jnp.asarray(86400.0), interpret=True)


def test_yblocked_matches_full(problem):
    (_s, _g, fs, cells, topo, init, _ws, acc0, _p) = problem
    n = init.u.shape[0]
    rng = np.random.default_rng(5)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.03 * rng.standard_normal(n)
    u[:, 1] = 0.2 + 0.5 * rng.random(n)
    u = jnp.asarray(u)

    full = _bands(problem, u, init.flag, acc0, topo)
    os.environ["OPM_TPU_FLUX_BY"] = "8"
    try:
        blocked = _bands(problem, u, init.flag, acc0, topo)
    finally:
        del os.environ["OPM_TPU_FLUX_BY"]
    names = ("res", "diag", "x_lr", "x_rl", "y_lr", "y_rl", "z_lr",
             "z_rl")
    for nm, a, b in zip(names, full, blocked):
        # near-exact: XLA fma contraction may differ by 1 ulp between
        # block shapes (observed on 3/4320 diag elements, CPU backend)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-6, atol=0, err_msg=nm)


def test_extras_packed_matches_jacfwd(monkeypatch, tmp_path):
    """add_extra_faces_packed (the fast path's one-gather extras — no
    PVT re-evaluation) reproduces the per-face jacfwd extras on a
    faulted norne-class box within f32 tolerance."""
    import functools

    import jax

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models import structured as S
    from opm_autodiff_tpu.models.blackoil import (PrimaryState,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.props.eps import build_eps
    from opm_autodiff_tpu.utils.synthetic import write_norne_class_deck

    p = str(tmp_path / "NC.DATA")
    write_norne_class_deck(p, 10, 8, 6)
    state = load_state(p)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, emb = statics_from_geometry(geo)
    eps = build_eps(state, geo, fs)
    if eps is not None:
        cells = cells._replace(eps=jnp.asarray(eps))
    assert isinstance(emb, S.EmbeddedTopology)
    assert emb.ex_left is not None and len(emb.ex_left) > 0

    from opm_autodiff_tpu.models.init import equilibrate
    init = equilibrate(state, geo, fs)
    n = init.u.shape[0]
    rng = np.random.default_rng(17)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.02 * rng.standard_normal(n)
    u[:, 1] = 0.2 + 0.4 * rng.random(n)
    # x3 strictly OFF table nodes (equilibrated Sg sits exactly at the
    # krg node 0, where one-sided derivatives legitimately differ
    # between the kernel and XLA — see test_pallas_cellpack's
    # _perturbed_state note)
    u[:, 2] = np.where(np.asarray(init.flag) == 0,
                       0.013 + 0.25 * rng.random(n),
                       u[:, 2] * (1 + 0.05 * rng.standard_normal(n)))
    u = jnp.asarray(u)

    from opm_autodiff_tpu.models.blackoil import accumulation
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref, cells.regs, cells.eps)
    dt = jnp.asarray(86400.0)

    u_f = u[emb.fill]
    flag_f = init.flag[emb.fill]
    cells_f = S.embed_cells(emb, cells)
    acc0_f = jnp.zeros((emb.mask.shape[0], 3),
                       acc0.dtype).at[emb.act].set(acc0)

    # force the fused fast path in interpret mode on CPU
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp
    from opm_autodiff_tpu.ops import pallas_flux
    monkeypatch.setenv("OPM_TPU_PALLAS_ASSEMBLY", "1")
    monkeypatch.setattr(pcp, "cellpack_planes",
                        functools.partial(pcp.cellpack_planes,
                                          interpret=True))
    monkeypatch.setattr(pallas_flux, "flux_bands",
                        functools.partial(pallas_flux.flux_bands,
                                          interpret=True))
    ps = PrimaryState(u_f, flag_f)
    sys_fast, packed = S.assemble_structured(fs, cells_f, emb.topo, ps,
                                             acc0_f, dt,
                                             want_packed=True)
    assert packed is not None
    got = S.add_extra_faces_packed(sys_fast, packed, emb)
    want = S.add_extra_faces(sys_fast, fs, cells_f, emb, u_f, flag_f)
    # The packed planes carry the cellpack kernel's f32 values and
    # derivative jets, whose accepted tolerance vs the f64 XLA reference
    # is 2e-3 scale-relative (test_pallas_cellpack dQ bound) — the same
    # bound applies here; residual (value) channels are tight.
    packed64 = jax.tree.map(lambda a: a.astype(jnp.float64), packed)
    got64 = S.add_extra_faces_packed(sys_fast, packed64, emb)

    for nm in ("residual", "diag", "ex_lr", "ex_rl"):
        a = np.asarray(getattr(want, nm))
        scale = np.abs(a).max() + 1e-30
        b64 = np.asarray(getattr(got64, nm))
        tol = 1e-4 if nm == "residual" else 5e-3
        assert np.abs(b64 - a).max() / scale < tol, ("f64", nm)
        b = np.asarray(getattr(got, nm))
        assert np.abs(b - a).max() / scale < tol, ("f32", nm)
