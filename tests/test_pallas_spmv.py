"""Pallas banded SpMV kernel vs the XLA matvec (interpret mode on CPU;
the same kernel measured 1.66x the XLA version on the TPU v5e)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.models.structured import (assemble_structured,
                                                structured_matvec)
from opm_autodiff_tpu.ops.pallas_spmv import (banded_spmv_pallas, enabled,
                                              prepare_banded)


@pytest.fixture(scope="module")
def sys32():
    import __graft_entry__

    (_s, _geo, fs, cells, faces, init, _ws, acc0,
     _pbh) = __graft_entry__._build_problem(8, 6, 5)
    sys_ = assemble_structured(fs, cells, faces, init, acc0, 86400.0)
    return jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        sys_)


def test_matches_xla_matvec(sys32):
    rng = np.random.default_rng(0)
    prep = prepare_banded(sys32)
    for seed in range(3):
        x = jnp.asarray(rng.standard_normal((sys32.num_cells, 3)),
                        jnp.float32)
        y_ref = np.asarray(structured_matvec(sys32, x))
        y_pal = np.asarray(banded_spmv_pallas(prep, x, interpret=True))
        np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5,
                                   atol=1e-6 * np.abs(y_ref).max())


def test_disabled_on_cpu_by_default():
    assert jax.default_backend() == "cpu"
    assert not enabled()


@pytest.mark.parametrize("dims", [(8, 1, 1), (1, 6, 1), (1, 1, 5),
                                  (4, 3, 1)])
def test_singleton_dimensions(dims):
    """1D/2D grids have zero-width bands; the kernel must statically skip
    them instead of emitting zero-size vector ops (crashes Mosaic)."""
    import __graft_entry__

    nx, ny, nz = dims
    (_s, _geo, fs, cells, faces, init, _ws, acc0,
     _pbh) = __graft_entry__._build_problem(nx, ny, nz)
    sys_ = assemble_structured(fs, cells, faces, init, acc0, 86400.0)
    sys32 = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        sys_)
    prep = prepare_banded(sys32)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (sys32.num_cells, 3)), jnp.float32)
    y_ref = np.asarray(structured_matvec(sys32, x))
    y_pal = np.asarray(banded_spmv_pallas(prep, x, interpret=True))
    np.testing.assert_allclose(y_pal, y_ref, rtol=1e-5,
                               atol=1e-6 * np.abs(y_ref).max())
