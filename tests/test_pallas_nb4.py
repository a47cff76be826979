"""Block-size-generic (4x4) Pallas kernels and CPR.

The implicit extension systems (polymer/brine/foam/solvent/energy —
models/transport4.py) carry 4x4 blocks. The Pallas SpMV / z-line
kernels unroll the block algebra from the operand shapes and the CPR
pressure stage builds its quasi-IMPES weights with the 4x4 bordered-
Schur block inverse, so the extension systems ride the same fast paths
as the 3-equation flagship (reference: flow_ebos_polymer/_brine run
numEq=4 blocks through the identical ISTL CPR/ILU stack).

Kernels run in interpret mode on CPU; a synthetic diagonally-dominant
banded system stands in for physics (layout, not fluid behavior, is
under test — the physics equivalence is tests/test_banded4.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.models.structured import (StructuredSystem,
                                                structured_matvec)
from opm_autodiff_tpu.ops.pallas_spmv import (banded_spmv_pallas,
                                              prepare_banded)
from opm_autodiff_tpu.ops.pallas_zline import (prepare_zline,
                                               zline_apply_pallas)
from opm_autodiff_tpu.solvers.linear import build_zline, zline_apply


def _random_system4(nx, ny, nz, seed=0, dtype=jnp.float64):
    """Diagonally-dominant random 4x4 banded system (+ acc_jac)."""
    rng = np.random.default_rng(seed)
    n = nx * ny * nz

    def band(shape):
        return jnp.asarray(rng.standard_normal(shape + (4, 4)), dtype)

    x_lr = band((nz, ny, nx - 1))
    x_rl = band((nz, ny, nx - 1))
    y_lr = band((nz, ny - 1, nx))
    y_rl = band((nz, ny - 1, nx))
    z_lr = band((nz - 1, ny, nx))
    z_rl = band((nz - 1, ny, nx))
    diag = jnp.asarray(rng.standard_normal((n, 4, 4)), dtype)
    # dominance: |diag_ii| > sum of everything else in the row
    diag = diag + 60.0 * jnp.eye(4, dtype=dtype)[None]
    res = jnp.asarray(rng.standard_normal((n, 4)), dtype)
    acc = diag + jnp.asarray(0.1 * rng.standard_normal((n, 4, 4)), dtype)
    return StructuredSystem(residual=res, diag=diag, x_lr=x_lr, x_rl=x_rl,
                            y_lr=y_lr, y_rl=y_rl, z_lr=z_lr, z_rl=z_rl,
                            acc_jac=acc)


@pytest.mark.parametrize("dims", [(5, 4, 6), (1, 1, 7)])
def test_spmv4_matches_xla(dims):
    nx, ny, nz = dims
    sys_ = jax.tree.map(lambda a: a.astype(jnp.float32),
                        _random_system4(nx, ny, nz, seed=1))
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (sys_.num_cells, 4)), jnp.float32)
    y_ref = np.asarray(structured_matvec(sys_, x))
    y_pal = np.asarray(banded_spmv_pallas(prepare_banded(sys_), x,
                                          interpret=True))
    np.testing.assert_allclose(y_pal, y_ref, rtol=2e-5,
                               atol=1e-5 * np.abs(y_ref).max())


@pytest.mark.parametrize("dims", [(5, 4, 6), (1, 1, 7)])
def test_zline4_matches_xla(dims):
    nx, ny, nz = dims
    sys_ = jax.tree.map(lambda a: a.astype(jnp.float32),
                        _random_system4(nx, ny, nz, seed=3))
    r = jnp.asarray(np.random.default_rng(4).standard_normal(
        (sys_.num_cells, 4)), jnp.float32)
    x_ref = np.asarray(zline_apply(build_zline(sys_), r))
    fact = prepare_zline(prepare_banded(sys_), interpret=True)
    x_pal = np.asarray(zline_apply_pallas(fact, r, interpret=True))
    np.testing.assert_allclose(x_pal, x_ref, rtol=3e-5,
                               atol=2e-5 * np.abs(x_ref).max())


def test_zline4_exact_on_column():
    """On a single column the 4x4 block-Thomas IS the direct solve."""
    sys_ = _random_system4(1, 1, 9, seed=5)
    r = jnp.asarray(np.random.default_rng(6).standard_normal((9, 4)))
    x = zline_apply(build_zline(sys_), r)
    np.testing.assert_allclose(np.asarray(structured_matvec(sys_, x)),
                               np.asarray(r), rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("precond", ["cpr", "cpramg", "cpramgt"])
def test_cpr4_converges(precond):
    """solve_linear's CPR variants accept the 4x4 banded system (the
    gate opened with the bordered-Schur quasi-IMPES weights) and reduce
    the true residual to the requested tolerance."""
    from opm_autodiff_tpu.solvers import linear as linmod

    sys_ = _random_system4(6, 5, 4, seed=7)
    res = linmod.solve_linear(sys_, tol=1e-4, maxiter=300, precond=precond)
    assert bool(res.converged)
    b = -sys_.residual
    rres = b - structured_matvec(sys_, res.x)
    rel = float(jnp.linalg.norm(rres.reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    assert rel < 5e-4


def test_cpr4_weights_unit_pressure_row():
    """Quasi-IMPES on 4x4 blocks keeps the defining identity
    w . diag[:, :, p] == 1 (w = D^-T e_p)."""
    from opm_autodiff_tpu.solvers.cpr import _weights

    sys_ = _random_system4(3, 3, 3, seed=8)
    w = _weights(sys_, 0, "quasiimpes")
    assert w.shape == (27, 4)
    lhs = jnp.einsum("ni,ni->n", w, sys_.diag[:, :, 0])
    np.testing.assert_allclose(np.asarray(lhs), 1.0, rtol=1e-9)


def test_sharded_spmv4_equality():
    """The shard_mapped 4x4 banded SpMV equals the single-device matvec
    on the virtual 8-device CPU mesh (halo exchange carries the 4-wide
    block columns unchanged)."""
    from jax.sharding import Mesh

    from opm_autodiff_tpu.parallel import shard_kernels as sk

    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = Mesh(np.array(devs[:8]), ("z",))
    sys_ = jax.tree.map(lambda a: a.astype(jnp.float32),
                        _random_system4(4, 3, 16, seed=9))
    x = jnp.asarray(np.random.default_rng(10).standard_normal(
        (sys_.num_cells, 4)), jnp.float32)
    y_ref = np.asarray(structured_matvec(sys_, x))
    prep = sk.prepare_banded_sharded(mesh, sys_, interpret=True)
    y_sh = np.asarray(sk.banded_spmv_sharded(mesh, prep, x))
    np.testing.assert_allclose(y_sh, y_ref, rtol=2e-5,
                               atol=1e-5 * np.abs(y_ref).max())
