"""shard_mapped Pallas kernels on the virtual 8-device CPU mesh.

VERDICT.md round-1 #3: the sharded (multi-chip) path must keep the
hand-written kernels. Each test forces the sharded fast path on
(OPM_TPU_PALLAS_SHARDED=1; interpret mode on CPU) and compares against
the plain XLA single-device answer.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.parallel import make_mesh, shard_problem
from opm_autodiff_tpu.parallel import shard_kernels as sk
from opm_autodiff_tpu.parallel.mesh import use_mesh


@pytest.fixture(scope="module")
def problem():
    import __graft_entry__

    # nz = 16 -> 2 z-planes per device on the 8-device mesh
    return __graft_entry__._build_problem(nx=6, ny=5, nz=16)


def _perturbed(problem, seed=11):
    """Off-equilibrium state so residual/bands are O(1) in their own
    scale (at equilibrium the f32 kernel noise dominates a comparison)."""
    (_s, _g, _fs, _cells, _topo, init, _ws, _acc0, _p) = problem
    rng = np.random.default_rng(seed)
    n = init.u.shape[0]
    u = np.asarray(init.u).copy()
    u[:, 0] *= 1.0 + 0.02 * rng.standard_normal(n)
    u[:, 1] = np.clip(u[:, 1] + 0.05 * rng.standard_normal(n), 0.05, 0.9)
    u[:, 2] = np.where(np.asarray(init.flag) == 0,
                       np.clip(u[:, 2] + 0.03 * rng.random(n), 0.0, 0.6),
                       u[:, 2] * (1.0 + 0.01 * rng.standard_normal(n)))
    return jnp.asarray(u)


def _assemble_single_pallas(problem, u):
    """Single-device Pallas fast path (interpret mode), the reference
    for the sharded kernels: identical f32 math, no mesh."""
    from opm_autodiff_tpu.models.blackoil import PrimaryState
    from opm_autodiff_tpu.models.structured import StructuredSystem
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp
    from opm_autodiff_tpu.ops import pallas_flux

    (_s, _g, fs, cells, topo, init, _ws, acc0, _p) = problem
    nx, ny, nz = topo.dims
    dt = jnp.asarray(86400.0)
    q5, dq5 = pcp.cellpack_planes(fs, cells, u, init.flag,
                                  (nz, ny, nx), interpret=True)
    (res, diag, x_lr, x_rl, y_lr, y_rl, z_lr, z_rl) = \
        pallas_flux.flux_bands(q5, dq5, acc0, topo, dt, interpret=True)
    f64 = u.dtype
    inv_b = jnp.transpose(q5[:, 3:6], (0, 2, 3, 1)).reshape(
        nz * ny * nx, 3).astype(f64)
    acc_jac = jnp.transpose(dq5[:, 14:17], (0, 3, 4, 1, 2)).reshape(
        nz * ny * nx, 3, 3).astype(f64)
    return StructuredSystem(
        residual=res.astype(f64), diag=diag.astype(f64),
        x_lr=x_lr.astype(f64), x_rl=x_rl.astype(f64),
        y_lr=y_lr.astype(f64), y_rl=y_rl.astype(f64),
        z_lr=z_lr.astype(f64), z_rl=z_rl.astype(f64),
        inv_b=inv_b, acc_jac=acc_jac)


def _assemble(problem, mesh=None, u=None, force_sharded=False):
    from opm_autodiff_tpu.models.blackoil import PrimaryState
    from opm_autodiff_tpu.models.structured import assemble_structured

    (_s, _g, fs, cells, topo, init, _ws, acc0, _p) = problem
    if u is None:
        u = init.u
    dt = jnp.asarray(86400.0)
    if mesh is None:
        return assemble_structured(fs, cells, topo,
                                   PrimaryState(u, init.flag),
                                   acc0, dt)
    os.environ["OPM_TPU_PALLAS_SHARDED"] = "1" if force_sharded else "0"
    try:
        with use_mesh(mesh):
            cells_sh, topo_sh, u_sh, flag, acc0_sh = shard_problem(
                mesh, cells, topo, u, init.flag, acc0)

            def fn(u, flag, acc0):
                return assemble_structured(
                    fs, cells_sh, topo_sh, PrimaryState(u, flag),
                    acc0, dt)

            with mesh:
                sys = jax.jit(fn)(u_sh, flag, acc0_sh)
                jax.block_until_ready(sys.residual)
            return sys
    finally:
        del os.environ["OPM_TPU_PALLAS_SHARDED"]


def _close(a, b, tol=1e-6):
    """Scaled comparison: same f32 math, different slab decomposition."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = np.abs(b).max() + 1e-30
    np.testing.assert_array_less(np.abs(a - b).max() / scale, tol)


def test_sharded_assembly_matches_single_kernel(problem):
    assert len(jax.devices()) >= 8
    u = _perturbed(problem)
    ref = _assemble_single_pallas(problem, u)
    mesh = make_mesh(8)
    sh = _assemble(problem, mesh, u=u, force_sharded=True)
    _close(sh.residual, ref.residual)
    _close(sh.inv_b, ref.inv_b)
    _close(sh.diag, ref.diag)
    _close(sh.acc_jac, ref.acc_jac)
    for band in ("x_lr", "x_rl", "y_lr", "y_rl", "z_lr", "z_rl"):
        _close(getattr(sh, band), getattr(ref, band))


def test_sharded_assembly_matches_xla(problem):
    """Sharded Pallas vs the f64 XLA assembly on a perturbed state:
    f32-kernel tolerances (the single-device analog is
    test_pallas_cellpack's kernel-vs-XLA contract)."""
    u = _perturbed(problem)
    ref = _assemble(problem, u=u)  # XLA f64, no mesh
    mesh = make_mesh(8)
    sh = _assemble(problem, mesh, u=u, force_sharded=True)
    _close(sh.residual, ref.residual, tol=3e-4)
    # Jacobian tolerance is loose: a cell whose f32-rounded saturation
    # lands across a table node from its f64 value takes the adjacent
    # segment's slope — an O(local-curvature) derivative delta that the
    # single-device kernel shows identically (Newton is robust to it;
    # the residual agreement above is what convergence depends on)
    _close(sh.diag, ref.diag, tol=2e-2)
    for band in ("x_lr", "x_rl", "y_lr", "y_rl", "z_lr", "z_rl"):
        _close(getattr(sh, band), getattr(ref, band), tol=2e-2)


def test_sharded_spmv_matches(problem):
    from opm_autodiff_tpu.solvers.linear import system_matvec

    mesh = make_mesh(8)
    sys = _assemble(problem, mesh, force_sharded=True)
    n = sys.residual.shape[0]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((n, 3)))
    y_ref = np.asarray(system_matvec(sys, x))

    with use_mesh(mesh), mesh:
        def fn(x):
            prep = sk.prepare_banded_sharded(mesh, sys)
            return sk.banded_spmv_sharded(mesh, prep, x)

        y = np.asarray(jax.jit(fn)(x))
    scale = np.abs(y_ref).max() + 1e-30
    np.testing.assert_array_less(np.abs(y - y_ref).max() / scale, 1e-12)


def test_sharded_zline_solves_per_slab(problem):
    """The Schwarz z-line is an EXACT solve of the slab-decoupled
    block tridiagonal: apply then matvec with the decoupled system
    must reproduce r."""
    mesh = make_mesh(8)
    sys = _assemble(problem, mesh, force_sharded=True)
    n = sys.residual.shape[0]
    nz = sys.z_lr.shape[0] + 1
    nzl = nz // 8
    rng = np.random.default_rng(7)
    r = jnp.asarray(rng.standard_normal((n, 3)))

    with use_mesh(mesh), mesh:
        def fn(r):
            fact = sk.prepare_zline_sharded(mesh, sys)
            return sk.zline_apply_sharded(mesh, fact, r)

        x = np.asarray(jax.jit(fn)(r))

    # decoupled reference: zero the inter-slab z couplings, then matvec
    cut = [k for k in range(nz - 1) if (k + 1) % nzl == 0]
    z_lr = np.array(sys.z_lr)
    z_rl = np.array(sys.z_rl)
    z_lr[cut] = 0.0
    z_rl[[k for k in cut]] = 0.0
    dec = sys._replace(
        z_lr=jnp.asarray(z_lr), z_rl=jnp.asarray(z_rl),
        x_lr=jnp.zeros_like(sys.x_lr), x_rl=jnp.zeros_like(sys.x_rl),
        y_lr=jnp.zeros_like(sys.y_lr), y_rl=jnp.zeros_like(sys.y_rl))
    from opm_autodiff_tpu.solvers.linear import system_matvec

    rr = np.asarray(system_matvec(dec, jnp.asarray(x)))
    scale = np.abs(np.asarray(r)).max()
    np.testing.assert_array_less(np.abs(rr - np.asarray(r)).max() / scale,
                                 1e-10)


def test_full_step_sharded_kernels(problem):
    """One full Newton iteration with every sharded kernel on vs the
    single-device XLA answer (the test_parallel contract, now through
    the Pallas path)."""
    from tests.test_parallel import _run

    u1, q1, cnv1 = _run(problem, mesh=None)
    # 2 devices -> 8-plane slabs: the Schwarz z-line is then close to
    # the full-column solve and the inexact-Newton step is comparable.
    # (On 2-plane slabs the weaker preconditioner yields a DIFFERENT
    # valid inexact step — assembly/SpMV/z-line exactness at 8 devices
    # is pinned by the dedicated tests above.)
    mesh = make_mesh(2)
    os.environ["OPM_TPU_PALLAS_SHARDED"] = "1"
    try:
        with use_mesh(mesh):
            u8, q8, cnv8 = _run(problem, mesh=mesh)
    finally:
        del os.environ["OPM_TPU_PALLAS_SHARDED"]
    # f32 assembly: the starting state is equilibrated so CNV is tiny
    # (1e-5-ish) and kernel roundoff shows as a few percent of it —
    # what matters is both paths report (equally) converged metrics
    np.testing.assert_allclose(cnv8, cnv1, rtol=5e-2, atol=1e-7)
    assert np.max(cnv8) < 1e-3
    np.testing.assert_allclose(q8, q1, rtol=1e-3)
    np.testing.assert_allclose(u8, u1, rtol=2e-2, atol=1e-9)
