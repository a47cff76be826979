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
    # non-band (fault/NNC) couplings as COO over flat level indices
    # (VERDICT r2 #2: the coarse operator must see the extras; they are
    # Galerkin-restricted level to level, folding into the diagonal /
    # z bands when an aggregate absorbs them)
    ex_left: jnp.ndarray | None = None   # [Fe] int32
    ex_right: jnp.ndarray | None = None  # [Fe] int32
    ex_lr: jnp.ndarray | None = None     # [Fe] row=left,  col=right
    ex_rl: jnp.ndarray | None = None     # [Fe] row=right, col=left


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
    if lvl.ex_left is not None:
        xf = x.reshape(-1)
        yf = y.reshape(-1)
        yf = yf.at[lvl.ex_left].add(lvl.ex_lr * xf[lvl.ex_right])
        yf = yf.at[lvl.ex_right].add(lvl.ex_rl * xf[lvl.ex_left])
        y = yf.reshape(y.shape)
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

    # non-band extras: piecewise-constant Galerkin restriction = map both
    # endpoints to their aggregates. An entry whose endpoints join the
    # same aggregate folds into the diagonal; endpoints that become
    # z-adjacent in one column fold into the z bands (keeping the
    # coarsest-level line solve exact); the rest stay COO (same static
    # count, folded entries zeroed).
    ex = {}
    if lvl.ex_left is not None:
        nzf, nyf, nxf = lvl.diag.shape
        kl = lvl.ex_left // (nyf * nxf)
        jl = (lvl.ex_left // nxf) % nyf
        il = lvl.ex_left % nxf
        kr = lvl.ex_right // (nyf * nxf)
        jr = (lvl.ex_right // nxf) % nyf
        ir = lvl.ex_right % nxf
        jlc, ilc, jrc, irc = jl // 2, il // 2, jr // 2, ir // 2
        lc = (kl * nyc + jlc) * nxc + ilc
        rc = (kr * nyc + jrc) * nxc + irc
        v_lr, v_rl = lvl.ex_lr, lvl.ex_rl
        same_col = (jlc == jrc) & (ilc == irc)
        fold_d = same_col & (kl == kr)
        df = diag_c.reshape(-1)
        df = df.at[jnp.where(fold_d, lc, 0)].add(
            jnp.where(fold_d, v_lr + v_rl, 0.0))
        diag_c = df.reshape(diag_c.shape)
        fold_zu = jnp.zeros_like(fold_d)
        fold_zd = jnp.zeros_like(fold_d)
        if nz > 1:
            fold_zu = same_col & (kr == kl + 1)
            fold_zd = same_col & (kr == kl - 1)
            zu_pos = (kl * nyc + jlc) * nxc + ilc            # row k, col k+1
            zd_pos = ((kl - 1) * nyc + jlc) * nxc + ilc      # row k, col k-1
            zlr = pz_lr_c.reshape(-1)
            zrl = pz_rl_c.reshape(-1)
            zlr = zlr.at[jnp.where(fold_zu, zu_pos, 0)].add(
                jnp.where(fold_zu, v_lr, 0.0))
            zrl = zrl.at[jnp.where(fold_zu, zu_pos, 0)].add(
                jnp.where(fold_zu, v_rl, 0.0))
            # l is one layer BELOW r: row l col r enters pz_rl at k-1,
            # row r col l enters pz_lr at k-1
            zrl = zrl.at[jnp.where(fold_zd, zd_pos, 0)].add(
                jnp.where(fold_zd, v_lr, 0.0))
            zlr = zlr.at[jnp.where(fold_zd, zd_pos, 0)].add(
                jnp.where(fold_zd, v_rl, 0.0))
            pz_lr_c = zlr.reshape(pz_lr_c.shape)
            pz_rl_c = zrl.reshape(pz_rl_c.shape)
        keep = ~(fold_d | fold_zu | fold_zd)
        ex = dict(ex_left=jnp.where(keep, lc, 0).astype(jnp.int32),
                  ex_right=jnp.where(keep, rc, 0).astype(jnp.int32),
                  ex_lr=jnp.where(keep, v_lr, 0.0),
                  ex_rl=jnp.where(keep, v_rl, 0.0))

    # dummy (padding-only) aggregates get identity rows; they never see a
    # nonzero restricted residual, so their correction stays zero
    diag_c = jnp.where(jnp.abs(diag_c) > 0, diag_c, 1.0)

    inv_d, cp, _ = _factor_zlines(diag_c, pz_lr_c, pz_rl_c)
    return GmgLevel(diag=diag_c, px_lr=px_lr_c, px_rl=px_rl_c,
                    py_lr=py_lr_c, py_rl=py_rl_c,
                    pz_lr=pz_lr_c, pz_rl=pz_rl_c, inv_d=inv_d, cp=cp,
                    **ex)


def build_hierarchy(diag, px_lr, px_rl, py_lr, py_rl, pz_lr, pz_rl,
                    max_levels: int = 12, ex_left=None, ex_right=None,
                    ex_lr=None, ex_rl=None) -> list[GmgLevel]:
    """Semi-coarsened hierarchy down to single-column (1x1xnz) grids.

    ``ex_*`` carry non-band (fault throw / NNC) scalar couplings as COO
    over flat fine-grid indices; they are Galerkin-restricted through
    every level (VERDICT r2 #2 — the coarse operator sees the faults)."""
    if ex_left is not None and int(ex_left.shape[0]) == 0:
        ex_left = ex_right = ex_lr = ex_rl = None
    inv_d, cp, _ = _factor_zlines(diag, pz_lr, pz_rl)
    lvl = GmgLevel(diag=diag, px_lr=px_lr, px_rl=px_rl, py_lr=py_lr,
                   py_rl=py_rl, pz_lr=pz_lr, pz_rl=pz_rl,
                   inv_d=inv_d, cp=cp, ex_left=ex_left, ex_right=ex_right,
                   ex_lr=ex_lr, ex_rl=ex_rl)
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
