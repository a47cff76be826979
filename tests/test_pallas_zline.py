"""Pallas block-Thomas z-line kernel vs the XLA scan (interpret mode on
CPU; on TPU the kernel measured 4.6x the XLA factorization AND avoids
the bf16 rounding XLA's f32 einsums take through the MXU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.models.structured import assemble_structured
from opm_autodiff_tpu.ops.pallas_spmv import prepare_banded
from opm_autodiff_tpu.ops.pallas_zline import (prepare_zline,
                                               zline_apply_pallas)
from opm_autodiff_tpu.solvers.linear import build_zline, zline_apply


@pytest.mark.parametrize("dims", [(6, 5, 7), (4, 1, 3), (1, 1, 5)])
def test_matches_xla_zline(dims):
    import __graft_entry__

    nx, ny, nz = dims
    (_s, _geo, fs, cells, faces, init, _ws, acc0,
     _pbh) = __graft_entry__._build_problem(nx, ny, nz)
    sys_ = assemble_structured(fs, cells, faces, init, acc0, 86400.0)
    sys32 = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        sys_)
    r = jnp.asarray(np.random.default_rng(0).standard_normal(
        (sys32.num_cells, 3)), jnp.float32)
    x_ref = np.asarray(zline_apply(build_zline(sys32), r))
    fact = prepare_zline(prepare_banded(sys32), interpret=True)
    x_pal = np.asarray(zline_apply_pallas(fact, r, interpret=True))
    np.testing.assert_allclose(x_pal, x_ref, rtol=2e-5,
                               atol=1e-5 * np.abs(x_ref).max())


def test_solve_linear_uses_pallas_zline(monkeypatch):
    """With the kernel force-enabled (interpret mode on CPU),
    solve_linear's zline path still solves to the requested reduction."""
    import functools

    import __graft_entry__
    from opm_autodiff_tpu.models.structured import structured_matvec
    from opm_autodiff_tpu.ops import pallas_spmv, pallas_zline
    from opm_autodiff_tpu.solvers import linear as linmod

    monkeypatch.setenv("OPM_TPU_PALLAS_SPMV", "1")
    orig_spmv = pallas_spmv.banded_spmv_pallas
    orig_apply = pallas_zline.zline_apply_pallas
    orig_prep = pallas_zline.prepare_zline
    monkeypatch.setattr(pallas_spmv, "banded_spmv_pallas",
                        functools.partial(orig_spmv, interpret=True))
    monkeypatch.setattr(pallas_zline, "zline_apply_pallas",
                        functools.partial(orig_apply, interpret=True))
    monkeypatch.setattr(pallas_zline, "prepare_zline",
                        functools.partial(orig_prep, interpret=True))

    (_s, _geo, fs, cells, faces, init, _ws, acc0,
     _pbh) = __graft_entry__._build_problem(8, 6, 5)
    sys_ = assemble_structured(fs, cells, faces, init, acc0, 86400.0)
    res = linmod.solve_linear(sys_, tol=1e-3, maxiter=200, precond="zline")
    assert bool(res.converged)
    b = -sys_.residual
    rres = b - structured_matvec(sys_, res.x)
    rel = float(jnp.linalg.norm(rres.reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    assert rel < 2e-3
