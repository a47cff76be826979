"""Chow-Patel block-ILU0 tests (reference analogs: test_milu.cpp /
bda BILU0 + ChowPatelIlu).

Checks: (a) the fixed-point factorization converges to the exact
sequential block-ILU0 on a triangle-free TPFA graph, (b) the Jacobi
triangular sweeps solve L/U systems, (c) BiCGStab with ilu0 beats
block-Jacobi on a stiff heterogeneous BSR system (the VERDICT.md #4
acceptance: BSR-path iteration counts drop from block-Jacobi's level).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.models.assembler import BsrSystem, bsr_matvec
from opm_autodiff_tpu.solvers.ilu import build_cpilu0, cpilu0_apply
from opm_autodiff_tpu.solvers.linear import bicgstab, block_jacobi_apply, \
    invert_blocks


def _grid_system(nx, ny, trans_fn, seed=0):
    """2-D TPFA-like block system on an nx*ny grid: SPD-ish with
    per-face transmissibility from trans_fn(i,j,axis)."""
    rng = np.random.default_rng(seed)
    n = nx * ny
    left, right, tl = [], [], []
    for j in range(ny):
        for i in range(nx):
            c = j * nx + i
            if i + 1 < nx:
                left.append(c); right.append(c + 1)
                tl.append(trans_fn(i, j, 0))
            if j + 1 < ny:
                left.append(c); right.append(c + nx)
                tl.append(trans_fn(i, j, 1))
    f = len(left)
    base = rng.normal(size=(f, 3, 3)) * 0.1 + np.eye(3)
    off_lr = -np.asarray(tl)[:, None, None] * base
    off_rl = -np.asarray(tl)[:, None, None] * np.transpose(base, (0, 2, 1))
    diag = np.tile(np.eye(3), (n, 1, 1)) * 0.5
    for k in range(f):
        diag[left[k]] -= off_lr[k]
        diag[right[k]] -= off_rl[k]
    return BsrSystem(
        residual=jnp.zeros((n, 3)),
        diag=jnp.asarray(diag),
        off_lr=jnp.asarray(off_lr), off_rl=jnp.asarray(off_rl),
        left=jnp.asarray(left, jnp.int32),
        right=jnp.asarray(right, jnp.int32))


def _dense(sys):
    n = sys.num_cells
    a = np.zeros((n * 3, n * 3))
    d = np.asarray(sys.diag)
    for i in range(n):
        a[i * 3:(i + 1) * 3, i * 3:(i + 1) * 3] = d[i]
    for k in range(len(sys.left)):
        l, r = int(sys.left[k]), int(sys.right[k])
        a[l * 3:(l + 1) * 3, r * 3:(r + 1) * 3] = np.asarray(sys.off_lr[k])
        a[r * 3:(r + 1) * 3, l * 3:(l + 1) * 3] = np.asarray(sys.off_rl[k])
    return a


def _exact_bilu0(sys):
    """Sequential block-ILU0 (the reference ParOverILU0 algorithm) on
    the BSR pattern, in plain numpy."""
    n = sys.num_cells
    d = np.asarray(sys.diag).copy()
    nbrs = {i: {} for i in range(n)}  # row -> {col: block}
    for k in range(len(sys.left)):
        l, r = int(sys.left[k]), int(sys.right[k])
        nbrs[l][r] = np.asarray(sys.off_lr[k]).copy()
        nbrs[r][l] = np.asarray(sys.off_rl[k]).copy()
    L = {}
    Uii = np.zeros_like(d)
    for i in range(n):
        Uii[i] = d[i]
        for k in sorted(c for c in nbrs[i] if c < i):
            lik = nbrs[i][k] @ np.linalg.inv(Uii[k])
            L[(i, k)] = lik
            # triangle-free: the only entry updated in row i with
            # col >= i reachable through k is the diagonal (U_ki)
            Uii[i] = Uii[i] - lik @ nbrs[k][i]
    return L, Uii


def test_factorization_matches_sequential_ilu0():
    sys = _grid_system(5, 4, lambda i, j, a: 1.0 + 0.5 * i + 0.2 * j)
    fact = build_cpilu0(sys, n_sweeps=12)  # many sweeps -> exact
    L_ref, Uii_ref = _exact_bilu0(sys)
    uii = np.linalg.inv(np.asarray(fact.uii_inv))
    np.testing.assert_allclose(uii, Uii_ref, rtol=1e-8, atol=1e-12)
    lr = np.asarray(fact.low_row)
    lc = np.asarray(fact.low_col)
    lb = np.asarray(fact.l_blk)
    for k in range(len(lr)):
        np.testing.assert_allclose(lb[k], L_ref[(int(lr[k]), int(lc[k]))],
                                   rtol=1e-8, atol=1e-12)


def test_triangular_sweeps_solve_lu():
    sys = _grid_system(6, 5, lambda i, j, a: 1.0)
    fact = build_cpilu0(sys, n_sweeps=10)
    rng = np.random.default_rng(3)
    r = jnp.asarray(rng.normal(size=(sys.num_cells, 3)))
    x = cpilu0_apply(fact, r, n_sweeps=40)  # many sweeps -> exact solve
    # reconstruct LU densely and check LU x == r
    n = sys.num_cells
    L = np.eye(n * 3)
    U = np.zeros((n * 3, n * 3))
    uii = np.linalg.inv(np.asarray(fact.uii_inv))
    for i in range(n):
        U[i * 3:(i + 1) * 3, i * 3:(i + 1) * 3] = uii[i]
    for k in range(len(fact.low_row)):
        i, j = int(fact.low_row[k]), int(fact.low_col[k])
        L[i * 3:(i + 1) * 3, j * 3:(j + 1) * 3] = np.asarray(fact.l_blk[k])
        U[j * 3:(j + 1) * 3, i * 3:(i + 1) * 3] = np.asarray(fact.u_blk[k])
    lhs = L @ U @ np.asarray(x).reshape(-1)
    np.testing.assert_allclose(lhs, np.asarray(r).reshape(-1),
                               rtol=1e-6, atol=1e-8)


def test_ilu0_beats_jacobi_on_stiff_system():
    """Strongly heterogeneous transmissibilities (6 orders of magnitude):
    the VERDICT #4 acceptance shape."""
    rng = np.random.default_rng(7)
    logt = rng.uniform(-3, 3, size=(30, 30, 2))
    sys = _grid_system(30, 30, lambda i, j, a: 10.0 ** logt[i, j, a])
    b = jnp.asarray(rng.normal(size=(sys.num_cells, 3)))

    def mv(x):
        return bsr_matvec(sys, x)

    inv_diag = invert_blocks(sys.diag)
    res_j = bicgstab(mv, lambda r: block_jacobi_apply(inv_diag, r), b,
                     tol=1e-8, maxiter=400)
    fact = build_cpilu0(sys)
    res_i = bicgstab(mv, lambda r: cpilu0_apply(fact, r), b,
                     tol=1e-8, maxiter=400)
    assert bool(res_i.converged)
    it_i, it_j = int(res_i.iterations), int(res_j.iterations)
    # ilu0 must solve in well under half of jacobi's iterations
    assert it_i * 2 < max(it_j, 400 if not bool(res_j.converged) else it_j)
    # and the answer is right
    x = res_i.x
    np.testing.assert_allclose(np.asarray(mv(x)), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
