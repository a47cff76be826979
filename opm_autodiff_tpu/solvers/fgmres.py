"""FGMRES: flexible restarted GMRES (right-preconditioned).

The CPR coarse stage runs a fixed-iteration inner Krylov solve, which is
a (mildly) *nonlinear* operator — BiCGStab assumes a fixed linear
preconditioner and degrades. FGMRES (Saad 1993) stores the preconditioned
vectors Z_j explicitly, so any preconditioner is admissible. The
reference reaches the same robustness through dune-istl's RestartedGMRes
option of FlexibleSolver (FlexibleSolver_impl.hpp:145-180).

Fully jit-compatible: fixed restart length (each cycle runs all
``restart`` Arnoldi steps with masked Gram-Schmidt and Givens rotations),
one XLA computation for the whole solve.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.solvers.linear import LinearSolveResult


def fgmres(matvec: Callable, precond: Callable, b: jnp.ndarray,
           tol: float = 1e-2, max_cycles: int = 10,
           restart: int = 15) -> LinearSolveResult:
    shape = b.shape
    dtype = b.dtype
    n = b.size
    bf = b.reshape(-1)
    m = restart

    bnorm = jnp.linalg.norm(bf)
    # absolute floor like solvers/linear.bicgstab: a ~zero equilibrated
    # rhs means dx = 0 is the converged answer; iterating underflows f32
    target = jnp.maximum(tol * jnp.where(bnorm > 0, bnorm, 1.0),
                         jnp.asarray(1e-25, bf.dtype))

    def mv(x):
        return matvec(x.reshape(shape)).reshape(-1)

    def pc(x):
        return precond(x.reshape(shape)).reshape(-1)

    def cycle(carry):
        x, ncycles, _res, nit = carry
        r = bf - mv(x)
        beta = jnp.linalg.norm(r)
        inv_beta = jnp.where(beta > 0, 1.0 / jnp.where(beta > 0, beta, 1.0), 0.0)

        V = jnp.zeros((m + 1, n), dtype).at[0].set(r * inv_beta)
        Z = jnp.zeros((m, n), dtype)
        R = jnp.zeros((m + 1, m), dtype)   # rotated (triangular) H
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(beta)

        # Arnoldi as a while_loop with a true early EXIT: |g[j]| is the
        # residual estimate after j rotations — once it clears the
        # target, the cycle is done. A fori_loop over all m slots with a
        # frozen lax.cond still pays the conditional's carry traffic
        # (~230us/slot at 50k cells: the V/Z Krylov basis is ~20MB) on
        # every slot; the while_loop runs only the slots that do work,
        # so an easy 1-iteration solve costs one matvec+precond.
        def arnoldi_cond(st):
            j = st[0]
            g = st[6]
            return jnp.logical_and(j < m, jnp.abs(g[j]) > target)

        def arnoldi_step(st):
            j, V, Z, R, cs, sn, g, nit = st
            z = pc(V[j])
            w = mv(z)

            # classical Gram-Schmidt as two [m+1, n] matmuls (masked to
            # the filled basis rows) instead of m+1 sequential dots: the
            # fori_loop form cost ~178us per dynamic-slice+reduce at 50k
            # cells (2.8ms per Arnoldi step); one matmul pair is ~2
            # passes over the basis. A second CGS pass (CGS2) restores
            # the orthogonality modified GS had — f32 single-pass CGS
            # drifts enough to stall the restart decision's true
            # residual on hard systems. V.conj() keeps the projection
            # coefficients <v_i, w> correct for complex dtypes too
            # (real f32/f64 systems: a no-op XLA elides).
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            hcol = mask * (V.conj() @ w)
            w = w - hcol @ V
            corr = mask * (V.conj() @ w)
            w = w - corr @ V
            hcol = hcol + corr
            hj1 = jnp.linalg.norm(w)
            inv_h = jnp.where(hj1 > 0,
                              1.0 / jnp.where(hj1 > 0, hj1, 1.0), 0.0)
            V = V.at[j + 1].set(w * inv_h)
            Z = Z.at[j].set(z)
            hcol = hcol.at[j + 1].set(hj1)

            def prev_giv(i, col):
                ci = jnp.where(i < j, cs[i], 1.0)
                si = jnp.where(i < j, sn[i], 0.0)
                t1 = ci * col[i] + si * col[i + 1]
                t2 = -si * col[i] + ci * col[i + 1]
                return col.at[i].set(t1).at[i + 1].set(t2)

            # unrolled: m tiny [m+1]-vector updates — as a while-op this
            # is m sequential dispatches per Arnoldi step on TPU
            hcol = jax.lax.fori_loop(0, m, prev_giv, hcol, unroll=True)

            denom = jnp.sqrt(hcol[j] ** 2 + hcol[j + 1] ** 2)
            ok = denom > 0
            cj = jnp.where(ok, hcol[j] / jnp.where(ok, denom, 1.0),
                           1.0)
            sj = jnp.where(ok, hcol[j + 1] / jnp.where(ok, denom, 1.0),
                           0.0)
            hcol = hcol.at[j].set(denom).at[j + 1].set(0.0)
            cs = cs.at[j].set(cj)
            sn = sn.at[j].set(sj)
            gj = g[j]
            g = g.at[j].set(cj * gj).at[j + 1].set(-sj * gj)
            R = R.at[:, j].set(hcol)
            return (j + 1, V, Z, R, cs, sn, g, nit + 1)

        _j, V, Z, R, cs, sn, g, nit = jax.lax.while_loop(
            arnoldi_cond, arnoldi_step,
            (jnp.asarray(0), V, Z, R, cs, sn, g, nit))

        # back-substitution R[:m,:m] y = g[:m] with breakdown guards
        Rm = R[:m, :m]
        diag = jnp.diagonal(Rm)
        bad = jnp.abs(diag) < 1e-30
        Rm = Rm + jnp.diag(jnp.where(bad, 1.0, 0.0))
        gm = jnp.where(bad, 0.0, g[:m])
        y = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        x = x + Z.T @ y
        # TRUE residual for the restart decision, not the Givens
        # estimate |g[m]|: f32 Arnoldi loses orthogonality and the
        # estimate drifts optimistic — it exited cycles at 1.8x the
        # true reduction on a 2k-cell f32 CPR solve. One extra matvec
        # per m=15 inner iterations.
        return (x, ncycles + 1, jnp.linalg.norm(bf - mv(x)), nit)

    def cond(carry):
        _x, ncycles, res, _nit = carry
        return jnp.logical_and(res > target, ncycles < max_cycles)

    x0 = jnp.zeros_like(bf)
    init = (x0, jnp.asarray(0), jnp.asarray(jnp.inf, dtype),
            jnp.asarray(0))
    x, ncycles, res, nit = jax.lax.while_loop(cond, cycle, init)
    # report true residual (masked-step arithmetic can drift g slightly)
    true_res = jnp.linalg.norm(bf - mv(x))
    rel = true_res / jnp.where(bnorm > 0, bnorm, 1.0)
    return LinearSolveResult(x=x.reshape(shape),
                             iterations=nit,
                             rel_residual=rel,
                             converged=rel <= tol)
