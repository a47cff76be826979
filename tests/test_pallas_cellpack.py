"""Fused per-cell property-pack kernel (ops/pallas_cellpack.py) vs the
XLA vmap(jacfwd) reference (interpret mode on CPU; on the TPU the
kernel lifted the bench from 8.7M to 13.3M cell-updates/s)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.models import structured as S
from opm_autodiff_tpu.ops.pallas_cellpack import cellpack, supports


@pytest.fixture(scope="module")
def problem():
    import __graft_entry__

    return __graft_entry__._build_problem(6, 5, 4)


def _perturbed_state(init, n, seed=0):
    """Random state strictly OFF table nodes (at exact nodes the
    piecewise-linear derivative is one-sided; the kernel takes the
    searchsorted-side-right branch while XLA's clip-at-tie takes half —
    both defensible, so tests compare away from the measure-zero set)."""
    rng = np.random.default_rng(seed)
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1 + 0.043 * rng.standard_normal(n)
    u[:, 1] = 0.21 + 0.5 * rng.random(n)
    u[:, 2] = np.where(np.asarray(init.flag) == 0,
                       0.017 + 0.3 * rng.random(n),
                       u[:, 2] * (1 + 0.093 * rng.standard_normal(n)))
    return jnp.asarray(u)


def test_supports_gating(problem):
    (_s, _g, fs, cells, *_rest) = problem
    assert supports(fs, cells)
    assert not supports(fs, cells._replace(eps=jnp.zeros((120, 12))))


def test_matches_xla_pack(problem):
    (_s, _geo, fs, cells, faces, init, _ws, acc0, _pbh) = problem
    n = init.u.shape[0]
    u = _perturbed_state(init, n)
    flag = init.flag

    def one_cell(uu, ff, pv, rg, mm):
        def f(x):
            q = S._pack_cell(fs, x, ff, pv, rg, mm, None)
            return q, q

        jac, val = jax.jacfwd(f, has_aux=True)(uu)
        return val, jac

    Qr, dQr = jax.vmap(one_cell, in_axes=(0, 0, 0, 0, 0))(
        u, flag, cells.pore_vol_ref, cells.regs, cells.mob_mult)
    Qp, dQp = cellpack(fs, cells, u, flag, (4, 5, 6), interpret=True)
    Qr = np.asarray(Qr)
    dQr = np.asarray(dQr)
    scale_q = np.abs(Qr).max(axis=0) + 1e-30
    np.testing.assert_array_less(
        np.abs(np.asarray(Qp) - Qr).max(axis=0) / scale_q, 2e-5)
    scale_d = np.abs(dQr).max(axis=(0, 2))[:, None] + 1e-30
    np.testing.assert_array_less(
        np.abs(np.asarray(dQp) - dQr).max(axis=0) / scale_d, 2e-3)


def test_assembly_with_kernel_matches(problem, monkeypatch):
    """assemble_structured with the kernel forced on (interpret mode)
    reproduces the XLA assembly within f32 tolerance."""
    from opm_autodiff_tpu.models.blackoil import PrimaryState
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp

    (_s, _geo, fs, cells, faces, init, _ws, acc0, _pbh) = problem
    u = _perturbed_state(init, init.u.shape[0], seed=3)
    ps = PrimaryState(u, init.flag)
    dt = 86400.0

    sys_ref = S.assemble_structured(fs, cells, faces, ps, acc0, dt)

    from opm_autodiff_tpu.ops import pallas_flux

    monkeypatch.setenv("OPM_TPU_PALLAS_ASSEMBLY", "1")
    monkeypatch.setattr(pcp, "cellpack_planes",
                        functools.partial(pcp.cellpack_planes,
                                          interpret=True))
    monkeypatch.setattr(pallas_flux, "flux_bands",
                        functools.partial(pallas_flux.flux_bands,
                                          interpret=True))
    sys_pal = S.assemble_structured(fs, cells, faces, ps, acc0, dt)

    r_ref = np.asarray(sys_ref.residual)
    r_pal = np.asarray(sys_pal.residual)
    scale = np.abs(r_ref).max(axis=0) + 1e-30
    np.testing.assert_array_less(np.abs(r_pal - r_ref).max(axis=0) / scale,
                                 5e-5)
    d_ref = np.asarray(sys_ref.diag)
    d_pal = np.asarray(sys_pal.diag)
    dscale = np.abs(d_ref).max() + 1e-30
    assert np.abs(d_pal - d_ref).max() / dscale < 2e-3
