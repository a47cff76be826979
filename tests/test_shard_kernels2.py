"""2-D (z, y)-mesh shard_mapped Pallas kernels (VERDICT r4 next #7).

The 1-D z-slab wrappers bound the mesh at nz devices; these tests pin
the (z, y)-tiled variants — y-halo exchange mirroring the z recipe —
to the single-device kernel and XLA answers on the virtual 8-device
CPU mesh arranged 4x2 (and 1x2 for the pure-y split).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.parallel import shard_kernels as sk
from opm_autodiff_tpu.parallel.mesh import make_mesh2, use_mesh

from tests.test_shard_kernels import (_assemble, _assemble_single_pallas,
                                      _close, _perturbed)


@pytest.fixture(scope="module")
def problem():
    import __graft_entry__

    # nz=16 (4 planes/tile on the z axis), ny=6 (3 rows/tile on y)
    return __graft_entry__._build_problem(nx=6, ny=6, nz=16)


def _assemble2(problem, mesh, u):
    (_s, _g, fs, cells, topo, init, _ws, acc0, _p) = problem
    dt = jnp.asarray(86400.0)
    with use_mesh(mesh), mesh:
        def fn(u, flag, acc0):
            return sk.assemble_fast_sharded2(mesh, fs, cells, topo, u,
                                             flag, acc0, dt)

        sys = jax.jit(fn)(u, init.flag, acc0)
        jax.block_until_ready(sys.residual)
    return sys


def test_assembly2_matches_single_kernel(problem):
    assert len(jax.devices()) >= 8
    u = _perturbed(problem)
    ref = _assemble_single_pallas(problem, u)
    sh = _assemble2(problem, make_mesh2(4, 2), u)
    _close(sh.residual, ref.residual)
    _close(sh.inv_b, ref.inv_b)
    _close(sh.diag, ref.diag)
    _close(sh.acc_jac, ref.acc_jac)
    for band in ("x_lr", "x_rl", "y_lr", "y_rl", "z_lr", "z_rl"):
        _close(getattr(sh, band), getattr(ref, band))


def test_assembly2_matches_xla(problem):
    u = _perturbed(problem)
    ref = _assemble(problem, u=u)  # XLA f64, no mesh
    sh = _assemble2(problem, make_mesh2(4, 2), u)
    _close(sh.residual, ref.residual, tol=3e-4)
    # Jacobian tolerance loose for the same reason as the 1-D test
    # (test_shard_kernels.test_sharded_assembly_matches_xla): an f32-
    # rounded saturation across a table node takes the adjacent
    # segment's slope. The 2-D decomposition itself is EXACT — pinned
    # at 1e-6 against the single-device kernel above.
    _close(sh.diag, ref.diag, tol=5e-2)
    for band in ("x_lr", "x_rl", "y_lr", "y_rl", "z_lr", "z_rl"):
        _close(getattr(sh, band), getattr(ref, band), tol=5e-2)


def test_spmv2_matches(problem):
    from opm_autodiff_tpu.solvers.linear import system_matvec

    mesh = make_mesh2(4, 2)
    sys = _assemble(problem)  # single-device XLA f64 system
    n = sys.residual.shape[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, 3)))
    y_ref = np.asarray(system_matvec(sys, x))

    with use_mesh(mesh), mesh:
        def fn(x):
            prep = sk.prepare_banded_sharded2(mesh, sys)
            return sk.banded_spmv_sharded2(mesh, prep, x)

        y = np.asarray(jax.jit(fn)(x))
    scale = np.abs(y_ref).max() + 1e-30
    np.testing.assert_array_less(np.abs(y - y_ref).max() / scale, 1e-12)


def test_zline2_y_split_is_exact(problem):
    """The z-line solve never couples across y, so a pure-y (1, 2) mesh
    must reproduce the single-device block-Thomas apply exactly."""
    from opm_autodiff_tpu.ops import pallas_spmv, pallas_zline

    mesh = make_mesh2(1, 2)
    sys = _assemble(problem)
    n = sys.residual.shape[0]
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.standard_normal((n, 3)))

    prep = pallas_spmv.prepare_banded(sys)
    fact1 = pallas_zline.prepare_zline(prep, interpret=True)
    x_ref = np.asarray(pallas_zline.zline_apply_pallas(fact1, r, True))

    with use_mesh(mesh), mesh:
        def fn(r):
            fact = sk.prepare_zline_sharded2(mesh, sys)
            return sk.zline_apply_sharded2(mesh, fact, r)

        x = np.asarray(jax.jit(fn)(r))
    scale = np.abs(x_ref).max() + 1e-30
    np.testing.assert_array_less(np.abs(x - x_ref).max() / scale, 1e-12)


def test_zline2_schwarz_solves_per_tile(problem):
    """(4, 2) mesh: apply then matvec with the z-cut system reproduces
    r (the 1-D Schwarz contract, now per (z, y) tile)."""
    from opm_autodiff_tpu.solvers.linear import system_matvec

    mesh = make_mesh2(4, 2)
    sys = _assemble(problem)
    n = sys.residual.shape[0]
    nz = sys.z_lr.shape[0] + 1
    nzl = nz // 4
    rng = np.random.default_rng(9)
    r = jnp.asarray(rng.standard_normal((n, 3)))

    with use_mesh(mesh), mesh:
        def fn(r):
            fact = sk.prepare_zline_sharded2(mesh, sys)
            return sk.zline_apply_sharded2(mesh, fact, r)

        x = np.asarray(jax.jit(fn)(r))

    cut = [k for k in range(nz - 1) if (k + 1) % nzl == 0]
    z_lr = np.array(sys.z_lr)
    z_rl = np.array(sys.z_rl)
    z_lr[cut] = 0.0
    z_rl[cut] = 0.0
    dec = sys._replace(
        z_lr=jnp.asarray(z_lr), z_rl=jnp.asarray(z_rl),
        x_lr=jnp.zeros_like(sys.x_lr), x_rl=jnp.zeros_like(sys.x_rl),
        y_lr=jnp.zeros_like(sys.y_lr), y_rl=jnp.zeros_like(sys.y_rl))
    rr = np.asarray(system_matvec(dec, jnp.asarray(x)))
    scale = np.abs(np.asarray(r)).max()
    np.testing.assert_array_less(np.abs(rr - np.asarray(r)).max() / scale,
                                 1e-10)
