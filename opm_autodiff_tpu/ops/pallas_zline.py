"""Pallas TPU kernel: z-line block-tridiagonal factor + solve.

The z-line preconditioner (solvers/linear.py build_zline/zline_apply)
is an exact block-Thomas solve down every vertical column. As an XLA
``lax.scan`` it costs ~nz * (launch latency x kernels-per-step) — at
64x64x12 the factorization alone measured ~5 ms, the single biggest
line item of a Newton iteration. These kernels run the whole recurrence
inside Pallas: the TPU grid iterates the z planes **in order** and a
VMEM scratch buffer carries the recurrence state across steps, so the
entire factorization (and each triangular sweep) is ONE kernel launch.

Layout matches ops/pallas_spmv.py: block dims in front, the (ny, nx)
plane minor — [nz, nb, nb, ny, nx] bands, [nz, nb, ny, nx] vectors.
Block-size generic (nb = 3 black-oil, nb = 4 implicit extensions —
models/transport4.py): the block algebra (cofactor inverse, block
matmul) is unrolled at trace time into plane-wise VPU arithmetic.

Inputs reuse the dict from ``pallas_spmv.prepare_banded``: D = diag,
L = z_rl (row k, col k-1; plane 0 zero), U = z_lr (row k, col k+1; last
plane zero) — exactly the Thomas operands.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, b):
    """Block product on (ny, nx) planes: a, b indexable [i][j]."""
    nb = len(a)
    return [[sum(a[i][m] * b[m][j] for m in range(nb)) for j in range(nb)]
            for i in range(nb)]


def _mv(a, v):
    nb = len(a)
    return [sum(a[i][m] * v[m] for m in range(nb)) for i in range(nb)]


def _det3(m):
    return (m[0][0] * (m[1][1] * m[2][2] - m[1][2] * m[2][1])
            - m[0][1] * (m[1][0] * m[2][2] - m[1][2] * m[2][0])
            + m[0][2] * (m[1][0] * m[2][1] - m[1][1] * m[2][0]))


def _inv3(a):
    """Cofactor inverse of a 3x3 block of planes."""
    c00 = a[1][1] * a[2][2] - a[1][2] * a[2][1]
    c01 = a[1][2] * a[2][0] - a[1][0] * a[2][2]
    c02 = a[1][0] * a[2][1] - a[1][1] * a[2][0]
    c10 = a[0][2] * a[2][1] - a[0][1] * a[2][2]
    c11 = a[0][0] * a[2][2] - a[0][2] * a[2][0]
    c12 = a[0][1] * a[2][0] - a[0][0] * a[2][1]
    c20 = a[0][1] * a[1][2] - a[0][2] * a[1][1]
    c21 = a[0][2] * a[1][0] - a[0][0] * a[1][2]
    c22 = a[0][0] * a[1][1] - a[0][1] * a[1][0]
    det = a[0][0] * c00 + a[0][1] * c01 + a[0][2] * c02
    inv_det = 1.0 / det
    adj = [[c00, c10, c20], [c01, c11, c21], [c02, c12, c22]]
    return [[adj[i][j] * inv_det for j in range(3)] for i in range(3)]


def _inv4(a):
    """Adjugate inverse of a 4x4 block of planes (16 signed 3x3 minors;
    branch-free, matching solvers/linear.py invert_blocks semantics)."""
    cof = [[None] * 4 for _ in range(4)]
    for i in range(4):
        rows = [r for r in range(4) if r != i]
        for j in range(4):
            cols = [c for c in range(4) if c != j]
            m = [[a[r][c] for c in cols] for r in rows]
            cof[i][j] = _det3(m) if (i + j) % 2 == 0 else -_det3(m)
    det = sum(a[0][j] * cof[0][j] for j in range(4))
    inv_det = 1.0 / det
    return [[cof[j][i] * inv_det for j in range(4)] for i in range(4)]


def _inv(a):
    return _inv3(a) if len(a) == 3 else _inv4(a)


def _read_block(ref):
    nb = ref.shape[1]
    return [[ref[0, i, j] for j in range(nb)] for i in range(nb)]


def _write_block(ref, blk):
    nb = len(blk)
    for i in range(nb):
        for j in range(nb):
            ref[0, i, j] = blk[i][j]


def _factor_kernel(d_ref, l_ref, u_ref, inv_ref, cp_ref, carry):
    k = pl.program_id(0)
    nb = d_ref.shape[1]

    @pl.when(k == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    D = _read_block(d_ref)
    L = _read_block(l_ref)
    U = _read_block(u_ref)
    C_prev = [[carry[i, j] for j in range(nb)] for i in range(nb)]
    LC = _mm(L, C_prev)
    den = [[D[i][j] - LC[i][j] for j in range(nb)] for i in range(nb)]
    inv = _inv(den)
    C = _mm(inv, U)
    _write_block(inv_ref, inv)
    _write_block(cp_ref, C)
    for i in range(nb):
        for j in range(nb):
            carry[i, j] = C[i][j]


def _fwd_kernel(inv_ref, l_ref, r_ref, y_ref, carry):
    k = pl.program_id(0)
    nb = inv_ref.shape[1]

    @pl.when(k == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    inv = _read_block(inv_ref)
    L = _read_block(l_ref)
    r = [r_ref[0, i] for i in range(nb)]
    yp = [carry[i] for i in range(nb)]
    t = [r[i] - sum(L[i][m] * yp[m] for m in range(nb)) for i in range(nb)]
    y = _mv(inv, t)
    for i in range(nb):
        y_ref[0, i] = y[i]
        carry[i] = y[i]


def _bwd_kernel(cp_ref, y_ref, x_ref, carry):
    k = pl.program_id(0)
    nb = cp_ref.shape[1]

    @pl.when(k == 0)
    def _():
        carry[...] = jnp.zeros(carry.shape, carry.dtype)

    C = _read_block(cp_ref)
    y = [y_ref[0, i] for i in range(nb)]
    xn = [carry[i] for i in range(nb)]
    x = [y[i] - sum(C[i][m] * xn[m] for m in range(nb)) for i in range(nb)]
    for i in range(nb):
        x_ref[0, i] = x[i]
        carry[i] = x[i]


def _b5(nb, ny, nx):
    return pl.BlockSpec((1, nb, nb, ny, nx),
                        lambda k: (k, k - k, k - k, k - k, k - k))


def _b4(nb, ny, nx, rev=False, nz=None):
    if rev:
        return pl.BlockSpec(
            (1, nb, ny, nx),
            lambda k: ((k - k) + (nz - 1) - k, k - k, k - k, k - k))
    return pl.BlockSpec((1, nb, ny, nx), lambda k: (k, k - k, k - k, k - k))


def prepare_zline(prep: dict, interpret: bool = False):
    """Factor the per-column block tridiagonal from a prepare_banded
    dict. Returns the factorization pytree for ``zline_apply_pallas``."""
    D = prep["diag"]
    L = prep["z_rl"]
    U = prep["z_lr"]
    nz, nb, _, ny, nx = D.shape
    inv, cp = pl.pallas_call(
        _factor_kernel,
        grid=(nz,),
        in_specs=[_b5(nb, ny, nx)] * 3,
        out_specs=[_b5(nb, ny, nx)] * 2,
        out_shape=[jax.ShapeDtypeStruct(D.shape, D.dtype)] * 2,
        scratch_shapes=[pltpu.VMEM((nb, nb, ny, nx), D.dtype)],
        interpret=interpret,
    )(D, L, U)
    return {"inv": inv, "cp": cp, "L": L}


def zline_apply_pallas(fact: dict, r, interpret: bool = False):
    """x = T^-1 r for the factored block tridiagonal; r, x are [N,nb]."""
    inv = fact["inv"]
    nz, nb, _, ny, nx = inv.shape
    dtype = inv.dtype
    r4 = jnp.transpose(r.reshape(nz, ny, nx, nb).astype(dtype),
                       (0, 3, 1, 2))
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(nz,),
        in_specs=[_b5(nb, ny, nx), _b5(nb, ny, nx), _b4(nb, ny, nx)],
        out_specs=_b4(nb, ny, nx),
        out_shape=jax.ShapeDtypeStruct((nz, nb, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((nb, ny, nx), dtype)],
        interpret=interpret,
    )(inv, fact["L"], r4)
    rb = _b4(nb, ny, nx, rev=True, nz=nz)
    rb5 = pl.BlockSpec(
        (1, nb, nb, ny, nx),
        lambda k: ((k - k) + (nz - 1) - k, k - k, k - k, k - k, k - k))
    x = pl.pallas_call(
        _bwd_kernel,
        grid=(nz,),
        in_specs=[rb5, rb],
        out_specs=rb,
        out_shape=jax.ShapeDtypeStruct((nz, nb, ny, nx), dtype),
        scratch_shapes=[pltpu.VMEM((nb, ny, nx), dtype)],
        interpret=interpret,
    )(fact["cp"], y)
    return jnp.transpose(x, (0, 2, 3, 1)).reshape(nz * ny * nx, nb)
