"""Geometric multigrid for the CPR pressure stage (solvers/gmg.py).

The reference's analog is the AMG V-cycle inside CPR
(OwningTwoLevelPreconditioner/amgcpr.hh, SURVEY.md §2.6); correctness
contracts tested here: Galerkin coarse operators, V-cycle contraction on
heterogeneous TPFA-like problems, and the full CPR+GMG preconditioner
inside BiCGStab on an assembled SPE1 system.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.solvers.gmg import (GmgLevel, _coarsen, _factor_zlines,
                                          _prolong, _restrict, _zline_solve,
                                          build_hierarchy, level_matvec,
                                          vcycle)


def _poisson_level(nx, ny, nz, seed=0, aniso_z=10.0):
    """Heterogeneous 7-point TPFA-like scalar system (SPD, lognormal
    trans, strong vertical coupling like a layered reservoir)."""
    rng = np.random.default_rng(seed)

    def tr(shape, scale):
        return scale * np.exp(rng.standard_normal(shape))

    tx = tr((nz, ny, nx - 1), 1.0) if nx > 1 else np.zeros((nz, ny, 0))
    ty = tr((nz, ny - 1, nx), 1.0) if ny > 1 else np.zeros((nz, 0, nx))
    tz = tr((nz - 1, ny, nx), aniso_z) if nz > 1 else np.zeros((0, ny, nx))
    diag = 0.05 * np.ones((nz, ny, nx))  # small accumulation term
    diag[:, :, :-1] += tx
    diag[:, :, 1:] += tx
    diag[:, :-1, :] += ty
    diag[:, 1:, :] += ty
    diag[:-1] += tz
    diag[1:] += tz
    inv_d, cp, _ = _factor_zlines(jnp.asarray(diag), jnp.asarray(-tz),
                                  jnp.asarray(-tz))
    return GmgLevel(diag=jnp.asarray(diag),
                    px_lr=jnp.asarray(-tx), px_rl=jnp.asarray(-tx),
                    py_lr=jnp.asarray(-ty), py_rl=jnp.asarray(-ty),
                    pz_lr=jnp.asarray(-tz), pz_rl=jnp.asarray(-tz),
                    inv_d=inv_d, cp=cp)


def test_zline_solve_is_exact_tridiagonal():
    lvl = _poisson_level(1, 1, 12, seed=2)
    r = jnp.asarray(np.random.default_rng(3).standard_normal((12, 1, 1)))
    x = _zline_solve(lvl, r)
    np.testing.assert_allclose(np.asarray(level_matvec(lvl, x)),
                               np.asarray(r), rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("dims", [(8, 8, 4), (7, 5, 3), (9, 1, 6)])
def test_galerkin_coarse_operator(dims):
    """A_c x_c == R (A (P x_c)) for piecewise-constant transfer —
    validates the band sums including odd-dimension padding."""
    nx, ny, nz = dims
    lvl = _poisson_level(nx, ny, nz, seed=5)
    lc = _coarsen(lvl)
    nzc, nyc, nxc = lc.diag.shape
    xc = jnp.asarray(
        np.random.default_rng(7).standard_normal((nzc, nyc, nxc)))
    lhs = level_matvec(lc, xc)
    rhs = _restrict(level_matvec(lvl, _prolong(xc, ny, nx)), nyc, nxc)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-9, atol=1e-9)


def test_vcycle_contracts():
    """V-cycles reduce the residual by a solid factor per sweep on a
    heterogeneous anisotropic problem."""
    lvl0 = _poisson_level(16, 12, 8, seed=1)
    levels = build_hierarchy(lvl0.diag, lvl0.px_lr, lvl0.px_rl,
                             lvl0.py_lr, lvl0.py_rl, lvl0.pz_lr, lvl0.pz_rl)
    assert levels[-1].diag.shape[1:] == (1, 1)
    b = jnp.asarray(np.random.default_rng(4).standard_normal((8, 12, 16)))
    x = jnp.zeros_like(b)
    norms = [float(jnp.linalg.norm(b))]
    for _ in range(6):
        r = b - level_matvec(levels[0], x)
        x = x + vcycle(levels, r)
        norms.append(float(jnp.linalg.norm(b - level_matvec(levels[0], x))))
    # average contraction factor well below 1
    factor = (norms[-1] / norms[0]) ** (1 / 6)
    assert factor < 0.55, norms


def test_cpramg_solves_spe1_system(spe1_deck_path):
    """CPR with the GMG coarse stage converges BiCGStab on the real
    assembled SPE1 Jacobian, at least as fast as block-Jacobi."""
    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.blackoil import (accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.models.structured import (assemble_structured,
                                                    structured_matvec)
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.solvers.linear import solve_linear

    state = load_state(spe1_deck_path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, topo = statics_from_geometry(geo)
    init = equilibrate(state, geo, fs)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref) * 1.01
    sys_s = assemble_structured(fs, cells, topo, init, acc0, 86400.0)

    res = solve_linear(sys_s, tol=1e-3, maxiter=150, precond="cpramg")
    assert bool(res.converged)
    b = -sys_s.residual
    r = b - structured_matvec(sys_s, res.x)
    rel = float(jnp.linalg.norm(r.reshape(-1))
                / jnp.linalg.norm(b.reshape(-1)))
    assert rel < 2e-3

    res_j = solve_linear(sys_s, tol=1e-3, maxiter=150, precond="jacobi")
    assert int(res.iterations) <= int(res_j.iterations)


# ---------------------------------------------------------------------------
# Fault (COO extras) handling: VERDICT r2 #2 — the coarse operator must
# see the non-band connections
# ---------------------------------------------------------------------------


def _with_fault(lvl, i0, t_scale=1.0, seed=9):
    """Sever the conforming x band at plane i0 and reconnect with
    cross-layer COO extras (k,j,i0) <-> (k+1,j,i0+1): the stair-case
    fault shape the corner-point builder produces."""
    nz, ny, nx = lvl.diag.shape
    rng = np.random.default_rng(seed)
    tx = -np.asarray(lvl.px_lr).copy()
    diag = np.asarray(lvl.diag).copy()
    sever = tx[:, :, i0].copy()
    diag[:, :, i0] -= sever
    diag[:, :, i0 + 1] -= sever
    tx[:, :, i0] = 0.0
    t = t_scale * np.exp(rng.standard_normal((nz - 1, ny)))
    k, j = np.meshgrid(np.arange(nz - 1), np.arange(ny), indexing="ij")
    left = ((k * ny + j) * nx + i0).reshape(-1)
    right = (((k + 1) * ny + j) * nx + i0 + 1).reshape(-1)
    tv = t.reshape(-1)
    np.add.at(diag.reshape(-1), left, tv)
    np.add.at(diag.reshape(-1), right, tv)
    inv_d, cp, _ = _factor_zlines(jnp.asarray(diag), lvl.pz_lr, lvl.pz_rl)
    return lvl._replace(
        diag=jnp.asarray(diag), px_lr=jnp.asarray(-tx),
        px_rl=jnp.asarray(-tx), inv_d=inv_d, cp=cp,
        ex_left=jnp.asarray(left, jnp.int32),
        ex_right=jnp.asarray(right, jnp.int32),
        ex_lr=jnp.asarray(-tv), ex_rl=jnp.asarray(-tv))


@pytest.mark.parametrize("i0", [3, 4])
def test_galerkin_coarse_with_extras(i0):
    """A_c x_c == R (A (P x_c)) with fault extras in the operator —
    validates the extras restriction incl. diag / z-band folding (i0
    even folds into z bands at the first coarse level, i0 odd keeps
    COO entries alive)."""
    lvl = _with_fault(_poisson_level(8, 6, 5, seed=11), i0)
    lc = _coarsen(lvl)
    nzc, nyc, nxc = lc.diag.shape
    xc = jnp.asarray(
        np.random.default_rng(13).standard_normal((nzc, nyc, nxc)))
    lhs = level_matvec(lc, xc)
    rhs = _restrict(level_matvec(lvl, _prolong(xc, 6, 8)), nyc, nxc)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-9, atol=1e-9)


def test_galerkin_two_levels_with_extras():
    """Same identity one level deeper (extras survive re-restriction)."""
    lvl = _with_fault(_poisson_level(9, 7, 4, seed=17), 3)
    l1 = _coarsen(lvl)
    l2 = _coarsen(l1)
    ny1, nx1 = l1.diag.shape[1:]
    nz2, ny2, nx2 = l2.diag.shape
    xc = jnp.asarray(
        np.random.default_rng(19).standard_normal((nz2, ny2, nx2)))
    lhs = level_matvec(l2, xc)
    rhs = _restrict(level_matvec(l1, _prolong(xc, ny1, nx1)), ny2, nx2)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-9, atol=1e-9)


def test_vcycle_fault_aware_beats_fault_blind():
    """On a strongly faulted problem, the hierarchy that restricts the
    extras converges the Krylov loop at least as fast as one that drops
    them (and contracts on its own)."""
    from opm_autodiff_tpu.solvers.linear import bicgstab

    lvl = _with_fault(_poisson_level(16, 12, 8, seed=21), 7, t_scale=3.0)
    aware = build_hierarchy(lvl.diag, lvl.px_lr, lvl.px_rl, lvl.py_lr,
                            lvl.py_rl, lvl.pz_lr, lvl.pz_rl,
                            ex_left=lvl.ex_left, ex_right=lvl.ex_right,
                            ex_lr=lvl.ex_lr, ex_rl=lvl.ex_rl)
    blind = build_hierarchy(lvl.diag, lvl.px_lr, lvl.px_rl, lvl.py_lr,
                            lvl.py_rl, lvl.pz_lr, lvl.pz_rl)
    b = jnp.asarray(np.random.default_rng(23).standard_normal((8, 12, 16)))

    def mv(x):
        return level_matvec(lvl, x)

    # the V-cycle contracts on the faulted operator
    x = jnp.zeros_like(b)
    n0 = float(jnp.linalg.norm(b))
    for _ in range(6):
        x = x + vcycle(aware, b - mv(x))
    assert float(jnp.linalg.norm(b - mv(x))) / n0 < 0.1

    res_a = bicgstab(mv, lambda r: vcycle(aware, r), b, tol=1e-8,
                     maxiter=100)
    res_b = bicgstab(mv, lambda r: vcycle(blind, r), b, tol=1e-8,
                     maxiter=100)
    assert bool(res_a.converged)
    assert int(res_a.iterations) <= int(res_b.iterations)
