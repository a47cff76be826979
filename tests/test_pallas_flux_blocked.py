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
