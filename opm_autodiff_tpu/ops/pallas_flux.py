"""Pallas TPU kernel: fused TPFA flux + Jacobian band assembly.

Consumes the plane-layout packed quantities from ops/pallas_cellpack
(Q [nz,17,ny,nx], dQ [nz,17,3,ny,nx]) and emits the complete banded
system — residual, diagonal blocks, and all six directed off-diagonal
bands — in one launch. The math is models/structured.py's hand-derived
flux chain rule (_flux_and_jac_slab; EclTransFluxModule semantics,
eclfluxmodule.hh:212-356) unrolled into plane arithmetic.

Z faces couple neighbor planes: each grid step reads the previous and
next planes' Q/dQ (clamped edge views, zero-padded transmissibility
kills the phantom faces) and computes both its z faces, so every write
stays inside the step's own output window. Each interior z face is
evaluated twice (once from each side) — cheaper than a cross-plane
reduction.

Outputs stay block-front ([.., 3, 3, ny, nx]) for TPU tiling; the
caller transposes into the StructuredSystem layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _face_terms(QL, QR, dQL, dQR, t, g):
    """flux[3], jl[3][3], jr[3][3] for one face slab.

    QX: channel-indexable planes; dQX: [ch][dir] planes; t, g planes.
    """
    p = lambda X, a: X[a]          # noqa: E731  0..2
    ib = lambda X, a: X[3 + a]     # noqa: E731
    mob = lambda X, a: X[6 + a]    # noqa: E731
    rho = lambda X, a: X[9 + a]    # noqa: E731

    base = [None] * 3
    dbase_L = [[None] * 3 for _ in range(3)]
    dbase_R = [[None] * 3 for _ in range(3)]
    up = [None] * 3
    for a in range(3):
        dphi = (p(QL, a) - p(QR, a)) - 0.5 * (rho(QL, a) + rho(QR, a)) * g
        up[a] = dphi >= 0.0
        m = jnp.where(up[a], mob(QL, a), mob(QR, a))
        b = jnp.where(up[a], ib(QL, a), ib(QR, a))
        base[a] = t * m * b * dphi
        mb = m * b
        mdphi = m * dphi
        bdphi = b * dphi
        for d in range(3):
            ddphi_L = dQL[a][d] - 0.5 * g * dQL[9 + a][d]
            ddphi_R = -dQR[a][d] - 0.5 * g * dQR[9 + a][d]
            dbase_L[a][d] = t * (
                jnp.where(up[a], dQL[6 + a][d] * bdphi
                          + dQL[3 + a][d] * mdphi, 0.0) + mb * ddphi_L)
            dbase_R[a][d] = t * (
                jnp.where(up[a], 0.0, dQR[6 + a][d] * bdphi
                          + dQR[3 + a][d] * mdphi) + mb * ddphi_R)

    rs_up = jnp.where(up[1], QL[12], QR[12])
    rv_up = jnp.where(up[2], QL[13], QR[13])
    flux = [base[0],
            base[1] + rv_up * base[2],
            base[2] + rs_up * base[1]]

    def rows(dbase, dQ, side_up):
        out = [[None] * 3 for _ in range(3)]
        for d in range(3):
            drs = jnp.where(up[1], dQ[12][d], 0.0) if side_up == "L" \
                else jnp.where(up[1], 0.0, dQ[12][d])
            drv = jnp.where(up[2], dQ[13][d], 0.0) if side_up == "L" \
                else jnp.where(up[2], 0.0, dQ[13][d])
            out[0][d] = dbase[0][d]
            out[1][d] = dbase[1][d] + rv_up * dbase[2][d] + drv * base[2]
            out[2][d] = dbase[2][d] + rs_up * dbase[1][d] + drs * base[1]
        return out

    return flux, rows(dbase_L, dQL, "L"), rows(dbase_R, dQR, "R")


def _read_qdq(q_ref, dq_ref, sl=None):
    """Channel plane lists, optionally sliced in-plane."""
    if sl is None:
        Q = [q_ref[0, c] for c in range(17)]
        dQ = [[dq_ref[0, c, d] for d in range(3)] for c in range(17)]
    else:
        Q = [q_ref[0, c][sl] for c in range(17)]
        dQ = [[dq_ref[0, c, d][sl] for d in range(3)] for c in range(17)]
    return Q, dQ


def _flux_kernel(q_ref, dq_ref, qp_ref, dqp_ref, qn_ref, dqn_ref,
                 acc_ref, tx_ref, gx_ref, ty_ref, gy_ref,
                 tzh_ref, gzh_ref, tzl_ref, gzl_ref, invdt_ref,
                 res_ref, diag_ref, xlr_ref, xrl_ref, ylr_ref, yrl_ref,
                 zlr_ref, zrl_ref):
    invdt = invdt_ref[0]
    ny, nx = q_ref.shape[2], q_ref.shape[3]

    Q, dQ = _read_qdq(q_ref, dq_ref)
    # accumulation part: residual = (acc - acc0)/dt, diag = dacc/dt
    res = [(Q[14 + a] - acc_ref[0, a]) * invdt for a in range(3)]
    diag = [[dQ[14 + a][d] * invdt for d in range(3)] for a in range(3)]

    zcol = jnp.zeros((ny, 1), Q[0].dtype)
    zrow = jnp.zeros((1, nx), Q[0].dtype)

    def addc(plane, contrib, where):
        # pad a face-slab contribution back to the full plane
        if where == "xl":
            return plane + jnp.concatenate([contrib, zcol], axis=1)
        if where == "xr":
            return plane + jnp.concatenate([zcol, contrib], axis=1)
        if where == "yl":
            return plane + jnp.concatenate([contrib, zrow], axis=0)
        return plane + jnp.concatenate([zrow, contrib], axis=0)

    # ---- X faces ----
    if nx > 1:
        QL = [v[:, :-1] for v in Q]
        QR = [v[:, 1:] for v in Q]
        dQL = [[v[:, :-1] for v in row] for row in dQ]
        dQR = [[v[:, 1:] for v in row] for row in dQ]
        flux, jl, jr = _face_terms(QL, QR, dQL, dQR, tx_ref[0], gx_ref[0])
        for a in range(3):
            res[a] = addc(res[a], flux[a], "xl")
            res[a] = addc(res[a], -flux[a], "xr")
            for d in range(3):
                diag[a][d] = addc(diag[a][d], jl[a][d], "xl")
                diag[a][d] = addc(diag[a][d], -jr[a][d], "xr")
                xlr_ref[0, a, d] = jr[a][d]
                xrl_ref[0, a, d] = -jl[a][d]

    # ---- Y faces ----
    if ny > 1:
        QL = [v[:-1, :] for v in Q]
        QR = [v[1:, :] for v in Q]
        dQL = [[v[:-1, :] for v in row] for row in dQ]
        dQR = [[v[1:, :] for v in row] for row in dQ]
        flux, jl, jr = _face_terms(QL, QR, dQL, dQR, ty_ref[0], gy_ref[0])
        for a in range(3):
            res[a] = addc(res[a], flux[a], "yl")
            res[a] = addc(res[a], -flux[a], "yr")
            for d in range(3):
                diag[a][d] = addc(diag[a][d], jl[a][d], "yl")
                diag[a][d] = addc(diag[a][d], -jr[a][d], "yr")
                ylr_ref[0, a, d] = jr[a][d]
                yrl_ref[0, a, d] = -jl[a][d]

    # ---- Z faces (neighbor planes; padded trans kills grid edges) ----
    QN, dQN = _read_qdq(qn_ref, dqn_ref)
    flux, jl, jr = _face_terms(Q, QN, dQ, dQN, tzh_ref[0], gzh_ref[0])
    for a in range(3):
        res[a] = res[a] + flux[a]
        for d in range(3):
            diag[a][d] = diag[a][d] + jl[a][d]
            zlr_ref[0, a, d] = jr[a][d]

    QP, dQP = _read_qdq(qp_ref, dqp_ref)
    flux, jl, jr = _face_terms(QP, Q, dQP, dQ, tzl_ref[0], gzl_ref[0])
    for a in range(3):
        res[a] = res[a] - flux[a]
        for d in range(3):
            diag[a][d] = diag[a][d] - jr[a][d]
            zrl_ref[0, a, d] = -jl[a][d]

    for a in range(3):
        res_ref[0, a] = res[a]
        for d in range(3):
            diag_ref[0, a, d] = diag[a][d]


def flux_bands(q, dq, acc0, topo, dt, interpret: bool = False):
    """Banded system pieces from plane-layout Q/dQ (all f32).

    Returns (residual [N,3], diag [N,3,3], x_lr, x_rl, y_lr, y_rl,
    z_lr, z_rl) in the StructuredSystem layout, f32.
    """
    nz, _, ny, nx = q.shape
    f32 = jnp.float32

    tx = topo.trans_x.astype(f32)
    gx = topo.gdz_x.astype(f32)
    ty = topo.trans_y.astype(f32)
    gy = topo.gdz_y.astype(f32)
    zpad = jnp.zeros((1, ny, nx), f32)
    tzh = jnp.concatenate([topo.trans_z.astype(f32), zpad], axis=0)
    gzh = jnp.concatenate([topo.gdz_z.astype(f32), zpad], axis=0)
    tzl = jnp.concatenate([zpad, topo.trans_z.astype(f32)], axis=0)
    gzl = jnp.concatenate([zpad, topo.gdz_z.astype(f32)], axis=0)
    acc0p = jnp.transpose(acc0.reshape(nz, ny, nx, 3).astype(f32),
                          (0, 3, 1, 2))
    return flux_bands_arrays(q, dq, acc0p, tx, gx, ty, gy,
                             tzh, gzh, tzl, gzl, dt, interpret)


def flux_bands_arrays(q, dq, acc0p, tx, gx, ty, gy, tzh, gzh, tzl, gzl,
                      dt, interpret: bool = False):
    """Array-level flux_bands: the caller supplies the per-plane face
    arrays directly (tzh/gzh [nz]: face above each plane, zero on the
    last; tzl/gzl [nz]: face below, zero on the first; acc0p in plane
    layout [nz,3,ny,nx]).  Lets the shard_map path feed halo-extended
    local slabs through the same kernel.

    Wide planes route to the y-blocked variant (scoped-VMEM guard):
    the kernel body holds ~630 live lane-padded row-slabs, which blows
    the 16MB scoped-vmem limit once ny x nx_pad planes pass ~25 rows
    at 128 lanes (measured: 18.13M at 56x46 on v5e)."""
    nz, _, ny, nx = q.shape
    f32 = jnp.float32

    nx_pad = max(-(-nx // 128) * 128, 128)
    by_cap = max(int(8 * 1024 * 1024 / (630 * nx_pad * 4)), 8)
    env_by = __import__("os").environ.get("OPM_TPU_FLUX_BY")
    if env_by:
        by_cap = int(env_by)
    if ny > by_cap:
        by = max((by_cap // 8) * 8, 8)
        return _flux_bands_yblocked(q, dq, acc0p, tx, gx, ty, gy,
                                    tzh, gzh, tzl, gzl, dt, by, interpret)
    invdt = (1.0 / jnp.asarray(dt, jnp.float64)).astype(f32).reshape(1)

    i4 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k: (k, k - k, k - k, k - k))
    i5 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k: (k, k - k, k - k, k - k, k - k))

    def nb(off):
        if off < 0:
            return lambda k: (jnp.maximum(k - 1, k - k), k - k, k - k, k - k)
        return lambda k: (jnp.minimum(k + 1, (k - k) + (nz - 1)),
                          k - k, k - k, k - k)

    def nb5(off):
        if off < 0:
            return lambda k: (jnp.maximum(k - 1, k - k), k - k, k - k,
                              k - k, k - k)
        return lambda k: (jnp.minimum(k + 1, (k - k) + (nz - 1)),
                          k - k, k - k, k - k, k - k)

    nxm = max(nx - 1, 1)
    nym = max(ny - 1, 1)
    tx_in = tx if nx > 1 else jnp.zeros((nz, ny, 1), f32)
    gx_in = gx if nx > 1 else tx_in
    ty_in = ty if ny > 1 else jnp.zeros((nz, 1, nx), f32)
    gy_in = gy if ny > 1 else ty_in
    i3 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k: (k, k - k, k - k))

    outs = pl.pallas_call(
        _flux_kernel,
        grid=(nz,),
        in_specs=[
            i4((17, ny, nx)),
            i5((17, 3, ny, nx)),
            pl.BlockSpec((1, 17, ny, nx), nb(-1)),
            pl.BlockSpec((1, 17, 3, ny, nx), nb5(-1)),
            pl.BlockSpec((1, 17, ny, nx), nb(+1)),
            pl.BlockSpec((1, 17, 3, ny, nx), nb5(+1)),
            i4((3, ny, nx)),
            i3((ny, nxm)), i3((ny, nxm)),
            i3((nym, nx)), i3((nym, nx)),
            i3((ny, nx)), i3((ny, nx)), i3((ny, nx)), i3((ny, nx)),
            pl.BlockSpec((1,), lambda k: (k - k,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            i4((3, ny, nx)),
            i5((3, 3, ny, nx)),
            i5((3, 3, ny, nxm)), i5((3, 3, ny, nxm)),
            i5((3, 3, nym, nx)), i5((3, 3, nym, nx)),
            i5((3, 3, ny, nx)), i5((3, 3, ny, nx)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, 3, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny, nxm), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny, nxm), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, nym, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, nym, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny, nx), f32),
        ],
        interpret=interpret,
    )(q, dq, q, dq, q, dq, acc0p, tx_in, gx_in, ty_in, gy_in,
      tzh, gzh, tzl, gzl, invdt)
    res5, diag5, xlr5, xrl5, ylr5, yrl5, zlr5, zrl5 = outs

    res = jnp.transpose(res5, (0, 2, 3, 1)).reshape(nz * ny * nx, 3)
    diag = jnp.transpose(diag5, (0, 3, 4, 1, 2)).reshape(nz * ny * nx, 3, 3)

    def band(b5, shp):
        return jnp.transpose(b5, (0, 3, 4, 1, 2))[:, :shp[1], :shp[2]]

    x_lr = band(xlr5, (nz, ny, nx - 1)) if nx > 1 else \
        jnp.zeros((nz, ny, 0, 3, 3), f32)
    x_rl = band(xrl5, (nz, ny, nx - 1)) if nx > 1 else x_lr
    y_lr = band(ylr5, (nz, ny - 1, nx)) if ny > 1 else \
        jnp.zeros((nz, 0, nx, 3, 3), f32)
    y_rl = band(yrl5, (nz, ny - 1, nx)) if ny > 1 else y_lr
    z_lr = band(zlr5, (nz, ny, nx))[:-1]
    z_rl = band(zrl5, (nz, ny, nx))[1:]
    return res, diag, x_lr, x_rl, y_lr, y_rl, z_lr, z_rl


# ---------------------------------------------------------------------------
# y-blocked variant (wide planes): grid (nz, gy), y faces handled like z
# faces — each block computes its below- and above-faces against the
# neighboring y block's edge rows, so boundary faces are evaluated twice
# (once per side) and every write stays inside the block's own window.
# ---------------------------------------------------------------------------

def _flux_kernel_yb(q_ref, dq_ref, qp_ref, dqp_ref, qn_ref, dqn_ref,
                    qyp_ref, dqyp_ref, qyn_ref, dqyn_ref,
                    acc_ref, tx_ref, gx_ref, tyh_ref, gyh_ref,
                    tyl_ref, gyl_ref, tzh_ref, gzh_ref, tzl_ref, gzl_ref,
                    invdt_ref,
                    res_ref, diag_ref, xlr_ref, xrl_ref, ylr_ref, yrl_ref,
                    zlr_ref, zrl_ref):
    invdt = invdt_ref[0]
    ny, nx = q_ref.shape[2], q_ref.shape[3]

    Q, dQ = _read_qdq(q_ref, dq_ref)
    res = [(Q[14 + a] - acc_ref[0, a]) * invdt for a in range(3)]
    diag = [[dQ[14 + a][d] * invdt for d in range(3)] for a in range(3)]

    zcol = jnp.zeros((ny, 1), Q[0].dtype)

    def addc(plane, contrib, where):
        if where == "xl":
            return plane + jnp.concatenate([contrib, zcol], axis=1)
        return plane + jnp.concatenate([zcol, contrib], axis=1)

    # ---- X faces (within-block; identical to the unblocked kernel) ----
    if nx > 1:
        QL = [v[:, :-1] for v in Q]
        QR = [v[:, 1:] for v in Q]
        dQL = [[v[:, :-1] for v in row] for row in dQ]
        dQR = [[v[:, 1:] for v in row] for row in dQ]
        flux, jl, jr = _face_terms(QL, QR, dQL, dQR, tx_ref[0], gx_ref[0])
        for a in range(3):
            res[a] = addc(res[a], flux[a], "xl")
            res[a] = addc(res[a], -flux[a], "xr")
            for d in range(3):
                diag[a][d] = addc(diag[a][d], jl[a][d], "xl")
                diag[a][d] = addc(diag[a][d], -jr[a][d], "xr")
                xlr_ref[0, a, d] = jr[a][d]
                xrl_ref[0, a, d] = -jl[a][d]

    # ---- Y faces, z-style: face BELOW each row (vs the next row /
    # next block's first row; padded tyh kills the edge) ----
    QY, dQY = _read_qdq(qyn_ref, dqyn_ref)
    QR = [jnp.concatenate([v[1:], w[:1]], axis=0) for v, w in zip(Q, QY)]
    dQR = [[jnp.concatenate([v[1:], w[:1]], axis=0)
            for v, w in zip(rv, rw)] for rv, rw in zip(dQ, dQY)]
    flux, jl, jr = _face_terms(Q, QR, dQ, dQR, tyh_ref[0], gyh_ref[0])
    for a in range(3):
        res[a] = res[a] + flux[a]
        for d in range(3):
            diag[a][d] = diag[a][d] + jl[a][d]
            ylr_ref[0, a, d] = jr[a][d]

    # face ABOVE each row (vs the previous row / previous block's last)
    QYP, dQYP = _read_qdq(qyp_ref, dqyp_ref)
    QL = [jnp.concatenate([w[-1:], v[:-1]], axis=0) for v, w in zip(Q, QYP)]
    dQL = [[jnp.concatenate([w[-1:], v[:-1]], axis=0)
            for v, w in zip(rv, rw)] for rv, rw in zip(dQ, dQYP)]
    flux, jl, jr = _face_terms(QL, Q, dQL, dQ, tyl_ref[0], gyl_ref[0])
    for a in range(3):
        res[a] = res[a] - flux[a]
        for d in range(3):
            diag[a][d] = diag[a][d] - jr[a][d]
            yrl_ref[0, a, d] = -jl[a][d]

    # ---- Z faces (identical to the unblocked kernel) ----
    QN, dQN = _read_qdq(qn_ref, dqn_ref)
    flux, jl, jr = _face_terms(Q, QN, dQ, dQN, tzh_ref[0], gzh_ref[0])
    for a in range(3):
        res[a] = res[a] + flux[a]
        for d in range(3):
            diag[a][d] = diag[a][d] + jl[a][d]
            zlr_ref[0, a, d] = jr[a][d]

    QP, dQP = _read_qdq(qp_ref, dqp_ref)
    flux, jl, jr = _face_terms(QP, Q, dQP, dQ, tzl_ref[0], gzl_ref[0])
    for a in range(3):
        res[a] = res[a] - flux[a]
        for d in range(3):
            diag[a][d] = diag[a][d] - jr[a][d]
            zrl_ref[0, a, d] = -jl[a][d]

    for a in range(3):
        res_ref[0, a] = res[a]
        for d in range(3):
            diag_ref[0, a, d] = diag[a][d]


def _flux_bands_yblocked(q, dq, acc0p, tx, gx, ty, gy, tzh, gzh, tzl, gzl,
                         dt, by, interpret):
    nz, _, ny, nx = q.shape
    f32 = jnp.float32
    invdt = (1.0 / jnp.asarray(dt, jnp.float64)).astype(f32).reshape(1)
    gyn = -(-ny // by)
    ny_pad = gyn * by
    pad = ny_pad - ny
    nym = ny - 1

    def pady(a, rows_axis, n_rows):
        # zero-pad the y axis to ny_pad (zero Q/trans make padded faces
        # exact no-ops — no NaN leakage into real rows)
        width = [(0, 0)] * a.ndim
        width[rows_axis] = (0, ny_pad - n_rows)
        return jnp.pad(a, width)

    qp = pady(q, 2, ny) if pad else q
    dqp_ = pady(dq, 3, ny) if pad else dq
    accp = pady(acc0p, 2, ny) if pad else acc0p
    tzh_p = pady(tzh, 1, ny) if pad else tzh
    gzh_p = pady(gzh, 1, ny) if pad else gzh
    tzl_p = pady(tzl, 1, ny) if pad else tzl
    gzl_p = pady(gzl, 1, ny) if pad else gzl
    nxm = max(nx - 1, 1)
    if nx > 1:
        tx_in = pady(tx, 1, ny) if pad else tx
        gx_in = pady(gx, 1, ny) if pad else gx
    else:
        tx_in = jnp.zeros((nz, ny_pad, 1), f32)
        gx_in = tx_in
    # face-below-row / face-above-row arrangements of the y band
    # (rows ny-1.. are grid edge / padding: zero trans)
    if ny > 1:
        tyh = pady(ty, 1, nym)
        gyh = pady(gy, 1, nym)
        tyl = jnp.pad(ty, [(0, 0), (1, ny_pad - nym - 1), (0, 0)])
        gyl = jnp.pad(gy, [(0, 0), (1, ny_pad - nym - 1), (0, 0)])
    else:
        tyh = jnp.zeros((nz, ny_pad, nx), f32)
        gyh = tyh
        tyl = tyh
        gyl = tyh

    i4 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k, j: (k, k - k, j, k - k))
    i5 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k, j: (k, k - k, k - k, j, k - k))
    i3 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k, j: (k, j, k - k))

    def nbz(off):
        if off < 0:
            return lambda k, j: (jnp.maximum(k - 1, k - k), k - k, j, k - k)
        return lambda k, j: (jnp.minimum(k + 1, (k - k) + (nz - 1)),
                             k - k, j, k - k)

    def nbz5(off):
        if off < 0:
            return lambda k, j: (jnp.maximum(k - 1, k - k), k - k, k - k,
                                 j, k - k)
        return lambda k, j: (jnp.minimum(k + 1, (k - k) + (nz - 1)),
                             k - k, k - k, j, k - k)

    def nby(off):
        if off < 0:
            return lambda k, j: (k, k - k, jnp.maximum(j - 1, j - j), k - k)
        return lambda k, j: (k, k - k,
                             jnp.minimum(j + 1, (j - j) + (gyn - 1)), k - k)

    def nby5(off):
        if off < 0:
            return lambda k, j: (k, k - k, k - k,
                                 jnp.maximum(j - 1, j - j), k - k)
        return lambda k, j: (k, k - k, k - k,
                             jnp.minimum(j + 1, (j - j) + (gyn - 1)), k - k)

    outs = pl.pallas_call(
        _flux_kernel_yb,
        grid=(nz, gyn),
        in_specs=[
            i4((17, by, nx)),
            i5((17, 3, by, nx)),
            pl.BlockSpec((1, 17, by, nx), nbz(-1)),
            pl.BlockSpec((1, 17, 3, by, nx), nbz5(-1)),
            pl.BlockSpec((1, 17, by, nx), nbz(+1)),
            pl.BlockSpec((1, 17, 3, by, nx), nbz5(+1)),
            pl.BlockSpec((1, 17, by, nx), nby(-1)),
            pl.BlockSpec((1, 17, 3, by, nx), nby5(-1)),
            pl.BlockSpec((1, 17, by, nx), nby(+1)),
            pl.BlockSpec((1, 17, 3, by, nx), nby5(+1)),
            i4((3, by, nx)),
            i3((by, nxm)), i3((by, nxm)),
            i3((by, nx)), i3((by, nx)), i3((by, nx)), i3((by, nx)),
            i3((by, nx)), i3((by, nx)), i3((by, nx)), i3((by, nx)),
            pl.BlockSpec((1,), lambda k, j: (k - k,),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            i4((3, by, nx)),
            i5((3, 3, by, nx)),
            i5((3, 3, by, nxm)), i5((3, 3, by, nxm)),
            i5((3, 3, by, nx)), i5((3, 3, by, nx)),
            i5((3, 3, by, nx)), i5((3, 3, by, nx)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, 3, ny_pad, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nxm), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nxm), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nx), f32),
            jax.ShapeDtypeStruct((nz, 3, 3, ny_pad, nx), f32),
        ],
        interpret=interpret,
    )(qp, dqp_, qp, dqp_, qp, dqp_, qp, dqp_, qp, dqp_, accp,
      tx_in, gx_in, tyh, gyh, tyl, gyl, tzh_p, gzh_p, tzl_p, gzl_p, invdt)
    res5, diag5, xlr5, xrl5, ylr5, yrl5, zlr5, zrl5 = outs

    res = jnp.transpose(res5, (0, 2, 3, 1))[:, :ny].reshape(
        nz * ny * nx, 3)
    diag = jnp.transpose(diag5, (0, 3, 4, 1, 2))[:, :ny].reshape(
        nz * ny * nx, 3, 3)

    def band(b5, shp):
        return jnp.transpose(b5, (0, 3, 4, 1, 2))[:, :shp[1], :shp[2]]

    x_lr = band(xlr5, (nz, ny, nx - 1)) if nx > 1 else \
        jnp.zeros((nz, ny, 0, 3, 3), f32)
    x_rl = band(xrl5, (nz, ny, nx - 1)) if nx > 1 else x_lr
    # face-below rows 0..ny-2 are the y band; face-above rows 1..ny-1
    yb = jnp.transpose(ylr5, (0, 3, 4, 1, 2))
    ya = jnp.transpose(yrl5, (0, 3, 4, 1, 2))
    y_lr = yb[:, :nym] if ny > 1 else jnp.zeros((nz, 0, nx, 3, 3), f32)
    y_rl = ya[:, 1:nym + 1] if ny > 1 else y_lr
    z_lr = band(zlr5, (nz, ny, nx))[:-1]
    z_rl = band(zrl5, (nz, ny, nx))[1:]
    return res, diag, x_lr, x_rl, y_lr, y_rl, z_lr, z_rl
