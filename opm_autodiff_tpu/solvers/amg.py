"""Aggregation AMG for the CPR pressure stage on general (face-list)
systems.

The reference's CPR coarse stage is a real AMG V-cycle
(opm/simulators/linalg/amgcpr.hh, 1,002 LoC of patched dune-istl AMG +
twolevelmethodcpr.hh). Classic AMG setup (strength-of-connection,
sequential aggregation) is pointer-chasing and hostile to XLA; the GMG
module (solvers/gmg.py) answers for banded grids, and THIS module is
the answer for the general COO/BSR layout where only a face list
exists:

  * aggregation: **index blocks** — cells [iB, (i+1)B) form aggregate i
    (B = 4). With the natural (k,j,i) cell ordering these are segments
    of x-lines, so geometric locality is preserved; NNC/fault entries
    simply coarsen along as COO entries between whatever aggregates
    their endpoints map to. The map is pure integer division on the
    (traced) index arrays — no host-side setup, jit-safe, and the COO
    entry COUNT stays static across levels (folded entries zero out).
  * Galerkin coarse operator with piecewise-constant transfer: the
    coarse diagonal is the block sum of fine diagonals plus every
    entry whose endpoints joined the same aggregate; everything else
    keeps its (coarse) endpoints. Duplicate COO entries are fine —
    the scatter-add matvec accumulates them exactly.
  * smoother: damped Jacobi (the COO layout has no cheap exact line
    solve); coarsest level: fixed-iteration Jacobi-preconditioned CG.

Shapes are static at every level (the hierarchy depth is fixed by N at
trace time), so the whole V-cycle lives inside one XLA computation. The
apply is linear in r -> safe under plain BiCGStab.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AmgLevel(NamedTuple):
    diag: jnp.ndarray    # [N] (padded rows carry 1.0)
    inv_diag: jnp.ndarray
    # l1-Jacobi smoothing diagonal 1 / (|a_ii| + sum_j |a_ij|): bounded
    # below by the row's total coupling, so the smoother stays
    # contractive when quasi-IMPES weighting at large dt destroys
    # diagonal dominance, and near-cancelled coarse Galerkin diagonals
    # cannot blow the correction up (the f32 failure mode)
    inv_l1: jnp.ndarray
    left: jnp.ndarray    # [F] int32
    right: jnp.ndarray   # [F] int32
    v_lr: jnp.ndarray    # [F] row=left,  col=right
    v_rl: jnp.ndarray    # [F] row=right, col=left


def level_matvec(lvl: AmgLevel, x):
    y = lvl.diag * x
    y = y.at[lvl.left].add(lvl.v_lr * x[lvl.right])
    y = y.at[lvl.right].add(lvl.v_rl * x[lvl.left])
    return y


def _pad_to(a, n, fill=0.0):
    return jnp.pad(a, (0, n - a.shape[0]), constant_values=fill)


def _make_level(n_pad, diag, left, right, v_lr, v_rl):
    diag = _pad_to(diag, n_pad)
    diag = jnp.where(jnp.abs(diag) > 0, diag, 1.0)
    l1 = jnp.abs(diag)
    l1 = l1.at[left].add(jnp.abs(v_lr))
    l1 = l1.at[right].add(jnp.abs(v_rl))
    # carry the diagonal's sign so the smoother still steps downhill on
    # rows the quasi-IMPES reduction made negative
    l1 = jnp.where(diag < 0, -l1, l1)
    return AmgLevel(diag=diag, inv_diag=1.0 / diag, inv_l1=1.0 / l1,
                    left=left, right=right, v_lr=v_lr, v_rl=v_rl)


def build_amg(diag, left, right, v_lr, v_rl, block: int = 4,
              coarsest: int = 64, max_levels: int = 16):
    """Index-block aggregation hierarchy of a scalar COO system.

    ``diag`` [N]; ``left/right/v_lr/v_rl`` [F] directed off-diagonal
    entries. Depth is fixed by N (static) — the traced values only flow
    through sums and integer divisions.
    """
    n = int(diag.shape[0])
    levels = []
    lvl_n = []
    cur = _make_level(n, diag, left.astype(jnp.int32),
                      right.astype(jnp.int32), v_lr, v_rl)
    n_cur = n
    while len(levels) < max_levels:
        levels.append(cur)
        lvl_n.append(n_cur)
        if n_cur <= coarsest:
            break
        nc = -(-n_cur // block)  # ceil
        n_pad = nc * block
        d = _pad_to(cur.diag[:n_cur], n_pad)
        diag_c = d.reshape(nc, block).sum(axis=1)
        lc = cur.left // block
        rc = cur.right // block
        fold = lc == rc
        diag_c = diag_c.at[jnp.where(fold, lc, 0)].add(
            jnp.where(fold, cur.v_lr + cur.v_rl, 0.0))
        v_lr_c = jnp.where(fold, 0.0, cur.v_lr)
        v_rl_c = jnp.where(fold, 0.0, cur.v_rl)
        cur = _make_level(nc, diag_c, lc, rc, v_lr_c, v_rl_c)
        n_cur = nc
    return levels, lvl_n


def _restrict(r, nc, block):
    return _pad_to(r, nc * block).reshape(nc, block).sum(axis=1)


def _prolong(xc, n, block):
    return jnp.repeat(xc, block)[:n]


def _coarse_solve(lvl: AmgLevel, b, iters: int = 20):
    """Jacobi-preconditioned BiCGStab, fixed iterations (the coarsest
    grid is <= ~64 aggregates; the upwinded TPFA pressure operator is
    NONSYMMETRIC, so CG is not safe here)."""
    from opm_autodiff_tpu.solvers.cpr import _pressure_inner_solve_generic

    return _pressure_inner_solve_generic(
        lambda x: level_matvec(lvl, x), lvl.diag, b, iters)


def vcycle(levels, lvl_n, r, level: int = 0, omega: float = 0.9,
           block: int = 4, nu: int = 2):
    """V(nu,nu) with l1-Jacobi smoothing; returns x ~ A^-1 r.

    l1-Jacobi (Baker/Falgout-style: divide by |a_ii| + sum_j |a_ij|)
    instead of plain damped Jacobi: provably contractive for SPD rows
    and robust on the upwinded nonsymmetric pressure operator — plain
    0.7-damped Jacobi DIVERGED in f32 on a 1e4-contrast faulted system
    at dt=365d (tests/test_f32_scale.py) where large-dt quasi-IMPES
    rows lose diagonal dominance."""
    lvl = levels[level]
    n = lvl_n[level]
    if level == len(levels) - 1:
        return _coarse_solve(lvl, r)
    x = jnp.zeros_like(r)
    for _ in range(nu):
        x = x + omega * lvl.inv_l1 * (r - level_matvec(lvl, x))
    res = r - level_matvec(lvl, x)
    nc = lvl_n[level + 1]
    rc = _restrict(res, nc, block)
    xc = vcycle(levels, lvl_n, rc, level + 1, omega, block, nu)
    x = x + _prolong(xc, n, block)
    for _ in range(nu):
        x = x + omega * lvl.inv_l1 * (r - level_matvec(lvl, x))
    return x
