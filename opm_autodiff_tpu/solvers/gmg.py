"""Geometric multigrid for the CPR pressure stage (structured grids).

The reference's CPR coarse stage is one AMG V-cycle on the scalar
pressure system (OwningTwoLevelPreconditioner + amgcpr.hh, SURVEY.md
§2.6). Algebraic aggregation/strength-of-connection setup is pointer-
chasing and hostile to XLA; on structured grids the same hierarchy can
be built *geometrically* with nothing but reshapes and sums, so that is
what this module does — the reservoir-simulation classic:

  * smoother: **z-line relaxation** — one exact scalar Thomas solve down
    every vertical column (the gravity direction, where layered
    reservoirs are stiffest). Columns batch perfectly on the VPU: the
    scan runs nz sequential steps of [ny*nx] elementwise math.
  * coarsening: **2x2 areal (x,y) aggregation** — semi-coarsening, the
    standard pairing with line relaxation: the smoother is exact in z,
    so the hierarchy only needs to reduce the horizontal error modes.
    Transfer operators are piecewise-constant (restrict = 2x2 sum,
    prolong = repeat); the Galerkin coarse operator then collapses to
    band sums — all static slicing.
  * coarsest level (nx == ny == 1): a single column, where the z-line
    smoother IS a direct solve.

Everything is shape-static and jit-compatible; the V-cycle recursion
unrolls over a Python list of levels whose depth is fixed by the grid
dims at trace time.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GmgLevel(NamedTuple):
    diag: jnp.ndarray    # [nz, ny, nx]
    px_lr: jnp.ndarray   # [nz, ny, nx-1]  row (k,j,i) -> col (k,j,i+1)
    px_rl: jnp.ndarray   # [nz, ny, nx-1]  row (k,j,i+1) -> col (k,j,i)
    py_lr: jnp.ndarray   # [nz, ny-1, nx]
    py_rl: jnp.ndarray
    pz_lr: jnp.ndarray   # [nz-1, ny, nx]
    pz_rl: jnp.ndarray
    # z-line (tridiagonal Thomas) factorization of (diag, pz_lr, pz_rl):
    inv_d: jnp.ndarray   # [nz, ny, nx] inverse pivot
    cp: jnp.ndarray      # [nz, ny, nx] eliminated upper band (last row 0)


def _factor_zlines(diag, pz_lr, pz_rl):
    """Batched scalar Thomas factorization along z for every column."""
    nz, ny, nx = diag.shape
    zero = jnp.zeros((1, ny, nx), diag.dtype)
    a = jnp.concatenate([zero, pz_rl], axis=0)   # lower: row k <- col k-1
    c = jnp.concatenate([pz_lr, zero], axis=0)   # upper: row k <- col k+1
    b = jnp.where(jnp.abs(diag) > 0, diag, 1.0)

    def step(cprev, inp):
        bk, ak, ck = inp
        den = bk - ak * cprev
        den = jnp.where(jnp.abs(den) > 1e-30, den, 1.0)
        inv = 1.0 / den
        ck = ck * inv
        return ck, (inv, ck)

    c0 = jnp.zeros((ny, nx), diag.dtype)
    _, (inv_d, cp) = jax.lax.scan(step, c0, (b, a, c))
    return inv_d, cp, a


def _zline_solve(lvl: GmgLevel, r):
    """x = T^-1 r where T is the per-column z tridiagonal of the level."""
    nz, ny, nx = lvl.diag.shape
    zero = jnp.zeros((1, ny, nx), lvl.diag.dtype)
    a = jnp.concatenate([zero, lvl.pz_rl], axis=0)

    def fwd(yprev, inp):
        inv, ak, rk = inp
        yk = (rk - ak * yprev) * inv
        return yk, yk

    y0 = jnp.zeros((ny, nx), r.dtype)
    _, y = jax.lax.scan(fwd, y0, (lvl.inv_d, a, r))

    def bwd(xnext, inp):
        yk, ck = inp
        xk = yk - ck * xnext
        return xk, xk

    _, x = jax.lax.scan(bwd, jnp.zeros((ny, nx), r.dtype), (y, lvl.cp),
                        reverse=True)
    return x


def level_matvec(lvl: GmgLevel, x):
    y = lvl.diag * x
    y = y.at[:, :, :-1].add(lvl.px_lr * x[:, :, 1:])
    y = y.at[:, :, 1:].add(lvl.px_rl * x[:, :, :-1])
    y = y.at[:, :-1, :].add(lvl.py_lr * x[:, 1:, :])
    y = y.at[:, 1:, :].add(lvl.py_rl * x[:, :-1, :])
    y = y.at[:-1].add(lvl.pz_lr * x[1:])
    y = y.at[1:].add(lvl.pz_rl * x[:-1])
    return y


def _pad_xy(arr, ny_to, nx_to):
    pz, py, px = arr.shape
    return jnp.pad(arr, ((0, 0), (0, ny_to - py), (0, nx_to - px)))


def _coarsen(lvl: GmgLevel) -> GmgLevel:
    """Galerkin 2x2 areal aggregation with piecewise-constant transfer."""
    nz, ny, nx = lvl.diag.shape
    nyp, nxp = ny + ny % 2, nx + nx % 2
    nyc, nxc = nyp // 2, nxp // 2

    d = _pad_xy(lvl.diag, nyp, nxp)
    px_lr = _pad_xy(lvl.px_lr, nyp, nxp - 1)
    px_rl = _pad_xy(lvl.px_rl, nyp, nxp - 1)
    py_lr = _pad_xy(lvl.py_lr, nyp - 1, nxp)
    py_rl = _pad_xy(lvl.py_rl, nyp - 1, nxp)
    if nz > 1:
        pz_lr = _pad_xy(lvl.pz_lr, nyp, nxp)
        pz_rl = _pad_xy(lvl.pz_rl, nyp, nxp)
    else:
        pz_lr = jnp.zeros((0, nyp, nxp), d.dtype)
        pz_rl = pz_lr

    # aggregate sums: diag + couplings internal to each 2x2 aggregate
    diag_c = d.reshape(nz, nyc, 2, nxc, 2).sum(axis=(2, 4))
    # x interfaces with even index join cells of the same aggregate
    int_x = (px_lr[:, :, 0::2] + px_rl[:, :, 0::2])  # [nz, nyp, nxc]
    diag_c = diag_c + int_x.reshape(nz, nyc, 2, nxc).sum(axis=2)
    int_y = (py_lr[:, 0::2, :] + py_rl[:, 0::2, :])  # [nz, nyc, nxp]
    diag_c = diag_c + int_y.reshape(nz, nyc, nxc, 2).sum(axis=3)

    # crossing bands (odd interfaces) keep their direction
    def cross_x(band):  # [nz, nyp, nxp-1] -> [nz, nyc, nxc-1]
        return band[:, :, 1::2].reshape(nz, nyc, 2, nxc - 1).sum(axis=2)

    def cross_y(band):
        return band[:, 1::2, :].reshape(nz, nyc - 1, nxc, 2).sum(axis=3)

    def agg_z(band):  # [nz-1, nyp, nxp] -> [nz-1, nyc, nxc]
        return band.reshape(nz - 1, nyc, 2, nxc, 2).sum(axis=(2, 4))

    px_lr_c = cross_x(px_lr) if nxc > 1 else jnp.zeros(
        (nz, nyc, 0), d.dtype)
    px_rl_c = cross_x(px_rl) if nxc > 1 else px_lr_c
    py_lr_c = cross_y(py_lr) if nyc > 1 else jnp.zeros(
        (nz, 0, nxc), d.dtype)
    py_rl_c = cross_y(py_rl) if nyc > 1 else py_lr_c
    pz_lr_c = agg_z(pz_lr) if nz > 1 else jnp.zeros((0, nyc, nxc), d.dtype)
    pz_rl_c = agg_z(pz_rl) if nz > 1 else pz_lr_c

    # dummy (padding-only) aggregates get identity rows; they never see a
    # nonzero restricted residual, so their correction stays zero
    diag_c = jnp.where(jnp.abs(diag_c) > 0, diag_c, 1.0)

    inv_d, cp, _ = _factor_zlines(diag_c, pz_lr_c, pz_rl_c)
    return GmgLevel(diag=diag_c, px_lr=px_lr_c, px_rl=px_rl_c,
                    py_lr=py_lr_c, py_rl=py_rl_c,
                    pz_lr=pz_lr_c, pz_rl=pz_rl_c, inv_d=inv_d, cp=cp)


def build_hierarchy(diag, px_lr, px_rl, py_lr, py_rl, pz_lr, pz_rl,
                    max_levels: int = 12) -> list[GmgLevel]:
    """Semi-coarsened hierarchy down to single-column (1x1xnz) grids."""
    inv_d, cp, _ = _factor_zlines(diag, pz_lr, pz_rl)
    lvl = GmgLevel(diag=diag, px_lr=px_lr, px_rl=px_rl, py_lr=py_lr,
                   py_rl=py_rl, pz_lr=pz_lr, pz_rl=pz_rl,
                   inv_d=inv_d, cp=cp)
    levels = [lvl]
    while len(levels) < max_levels:
        nz, ny, nx = lvl.diag.shape
        if ny <= 1 and nx <= 1:
            break
        lvl = _coarsen(lvl)
        levels.append(lvl)
    return levels


def _restrict(r, nyc, nxc):
    nz, ny, nx = r.shape
    rp = _pad_xy(r, nyc * 2, nxc * 2)
    return rp.reshape(nz, nyc, 2, nxc, 2).sum(axis=(2, 4))


def _prolong(xc, ny, nx):
    nz = xc.shape[0]
    xf = jnp.repeat(jnp.repeat(xc, 2, axis=1), 2, axis=2)
    return xf[:, :ny, :nx]


def vcycle(levels: list[GmgLevel], r, level: int = 0,
           omega: float = 0.85):
    """One V(1,1)-cycle with z-line smoothing; returns x ~ A^-1 r."""
    lvl = levels[level]
    if level == len(levels) - 1:
        # single column: the line solve is a direct solve
        return _zline_solve(lvl, r)
    # pre-smooth from x=0: one damped line-Jacobi step
    x = omega * _zline_solve(lvl, r)
    res = r - level_matvec(lvl, x)
    nyc, nxc = levels[level + 1].diag.shape[1:]
    rc = _restrict(res, nyc, nxc)
    xc = vcycle(levels, rc, level + 1, omega)
    nz, ny, nx = lvl.diag.shape
    x = x + _prolong(xc, ny, nx)
    # post-smooth
    res = r - level_matvec(lvl, x)
    x = x + omega * _zline_solve(lvl, res)
    return x
