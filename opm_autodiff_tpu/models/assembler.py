"""Residual + block-sparse Jacobian assembly.

Replaces opm-models' ``FvBaseLinearizer::linearizeDomain`` element loop
(the reference's hot loop, SURVEY.md §3.2) with three fully-batched AD
sweeps on static topology:

  1. per-cell accumulation value+Jacobian  (vmap . jacfwd)  -> diag blocks
  2. per-face flux value+Jacobian wrt both cells            -> off-diag BSR
  3. scatter-adds into rows (fixed indices -> XLA scatter)

The Jacobian is stored in face-list BSR form: diag [N,3,3] plus two
off-diagonal blocks per face (row-left/col-right and row-right/col-left).
OpenMP element threading (reference FlowMainEbos.hpp:458) is replaced by
vmap vectorization; the ``Evaluation`` AD type by jacfwd.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.models.blackoil import (CellStatic, FaceStatic,
                                              PrimaryState, accumulation,
                                              face_flux)
from opm_autodiff_tpu.props.fluid import FluidSystem

NUM_EQ = 3


class BsrSystem(NamedTuple):
    """Block-sparse linear system J dx = -r with fixed face-list topology."""

    residual: jnp.ndarray  # [N,3]
    diag: jnp.ndarray      # [N,3,3]
    off_lr: jnp.ndarray    # [F,3,3] row=left,  col=right
    off_rl: jnp.ndarray    # [F,3,3] row=right, col=left
    left: jnp.ndarray      # [F] int32 (static)
    right: jnp.ndarray     # [F] int32
    # storage Jacobian d acc/du [N,3,3] for true-IMPES CPR weights
    # (reference: getQuasiImpesWeights.hpp:89)
    acc_jac: jnp.ndarray | None = None
    # inverse FVFs [N,3] exposed by the packed assembly (the convergence
    # metrics reuse them instead of a second intensive sweep)
    inv_b: jnp.ndarray | None = None
    # fixed-degree adjacency (models/blackoil.build_ell): gather-only
    # SpMV on TPU instead of two scatter-adds per matvec
    ell_face: jnp.ndarray | None = None  # [N,D] int32 (F = padded slot)
    ell_nbr: jnp.ndarray | None = None   # [N,D] int32
    ell_left: jnp.ndarray | None = None  # [N,D] bool

    @property
    def num_cells(self) -> int:
        return self.residual.shape[0]


def _pad_face0(a: jnp.ndarray) -> jnp.ndarray:
    """Append one zero row on the face axis (the ELL padded slot)."""
    return jnp.concatenate(
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0)


def bsr_matvec(sys: BsrSystem, x: jnp.ndarray) -> jnp.ndarray:
    """y = J @ x with x, y of shape [N,3]."""
    y = jnp.einsum("nij,nj->ni", sys.diag, x)
    if sys.ell_face is not None:
        # gather formulation: each cell pulls its <=D off-diagonal
        # blocks and neighbor values (scatter-adds serialize on TPU)
        blocks = jnp.where(sys.ell_left[..., None, None],
                           _pad_face0(sys.off_lr)[sys.ell_face],
                           _pad_face0(sys.off_rl)[sys.ell_face])
        return y + jnp.einsum("ndij,ndj->ni", blocks, x[sys.ell_nbr])
    y = y.at[sys.left].add(jnp.einsum("fij,fj->fi", sys.off_lr, x[sys.right]))
    y = y.at[sys.right].add(jnp.einsum("fij,fj->fi", sys.off_rl, x[sys.left]))
    return y


def prepare_bsr_ell(sys: BsrSystem):
    """Materialize the ELL-dense off-diagonal block tensor [N,D,3,3]
    once per solve: the per-matvec block gather (36-byte elements from
    [F,3,3]) costs ~3ms at 12k cells on TPU while the materialized
    einsum + [N,D,3] vector gather is ~10x cheaper. Returns None when
    the system has no ELL adjacency."""
    if sys.ell_face is None:
        return None
    return jnp.where(sys.ell_left[..., None, None],
                     _pad_face0(sys.off_lr)[sys.ell_face],
                     _pad_face0(sys.off_rl)[sys.ell_face])


def bsr_matvec_ell(sys: BsrSystem, blocks, x):
    """y = J @ x with the prepared ELL block tensor (prepare_bsr_ell)."""
    y = jnp.einsum("nij,nj->ni", sys.diag, x)
    return y + jnp.einsum("ndij,ndj->ni", blocks, x[sys.ell_nbr])


def _acc_val_jac(fs: FluidSystem, u, flag, pv_ref, regs, eps):
    def f(uu):
        a = accumulation(fs, uu, flag, pv_ref, regs, eps)
        return a, a

    jac, val = jax.jacfwd(f, has_aux=True)(u)
    return val, jac


def _flux_val_jac(fs: FluidSystem, uL, uR, flagL, flagR, trans, gdz,
                  regsL, regsR, thp, mobL, mobR, epsL, epsR):
    def f(u6):
        fl = face_flux(fs, u6[:3], u6[3:], flagL, flagR, trans, gdz,
                       regsL, regsR, thp, mobL, mobR, epsL, epsR)
        return fl, fl

    jac, val = jax.jacfwd(f, has_aux=True)(jnp.concatenate([uL, uR]))
    return val, jac[:, :3], jac[:, 3:]


def packed_face_terms(QL, dQL, QR, dQR, t, g, th):
    """TPFA flux + both-side Jacobians from packed per-cell quantities.

    ``QL/QR`` [F,17] and ``dQL/dQR`` [F,17,3] in the cellpack channel
    layout (p[3], 1/B[3], mob[3], rho[3], rs, rv, acc[3]); ``t/g/th``
    per-face trans / g*dz / THPRES. The hand-derived chain rule of
    ops/pallas_flux._face_terms on flat face arrays, plus the THPRES
    deadband (blackoil.face_flux, eclfluxmodule.hh:327-337). Returns
    (flux [F,3], jac_l, jac_r [F,3,3] with [face, row, dvar])."""
    f = QL.dtype
    t = t.astype(f)
    g = g.astype(f)
    th = th.astype(f)
    base = []
    dbase_L = []
    dbase_R = []
    up = []
    for a in range(3):
        dphi_raw = (QL[:, a] - QR[:, a]) \
            - 0.5 * (QL[:, 9 + a] + QR[:, 9 + a]) * g
        live = jnp.abs(dphi_raw) > th
        dphi = jnp.where(
            th > 0.0,
            jnp.where(live, dphi_raw - jnp.sign(dphi_raw) * th, 0.0),
            dphi_raw)
        dfac = jnp.where(th > 0.0, live.astype(f), jnp.ones_like(dphi))
        upa = dphi >= 0.0
        m = jnp.where(upa, QL[:, 6 + a], QR[:, 6 + a])
        bb = jnp.where(upa, QL[:, 3 + a], QR[:, 3 + a])
        base.append(t * m * bb * dphi)
        up.append(upa)
        mb = m * bb
        mdphi = m * dphi
        bdphi = bb * dphi
        dL = []
        dR = []
        for d in range(3):
            ddphi_L = dfac * (dQL[:, a, d] - 0.5 * g * dQL[:, 9 + a, d])
            ddphi_R = dfac * (-dQR[:, a, d] - 0.5 * g * dQR[:, 9 + a, d])
            dL.append(t * (jnp.where(upa, dQL[:, 6 + a, d] * bdphi
                                     + dQL[:, 3 + a, d] * mdphi, 0.0)
                           + mb * ddphi_L))
            dR.append(t * (jnp.where(upa, 0.0, dQR[:, 6 + a, d] * bdphi
                                     + dQR[:, 3 + a, d] * mdphi)
                           + mb * ddphi_R))
        dbase_L.append(dL)
        dbase_R.append(dR)

    rs_up = jnp.where(up[1], QL[:, 12], QR[:, 12])
    rv_up = jnp.where(up[2], QL[:, 13], QR[:, 13])
    flux = jnp.stack([base[0],
                      base[1] + rv_up * base[2],
                      base[2] + rs_up * base[1]], axis=-1)

    def rows(dbase, dQ, side_up):
        out = []
        for d in range(3):
            drs = jnp.where(up[1], dQ[:, 12, d], 0.0) if side_up == "L" \
                else jnp.where(up[1], 0.0, dQ[:, 12, d])
            drv = jnp.where(up[2], dQ[:, 13, d], 0.0) if side_up == "L" \
                else jnp.where(up[2], 0.0, dQ[:, 13, d])
            out.append(jnp.stack(
                [dbase[0][d],
                 dbase[1][d] + rv_up * dbase[2][d] + drv * base[2],
                 dbase[2][d] + rs_up * dbase[1][d] + drs * base[1]],
                axis=-1))
        return jnp.stack(out, axis=-1)  # [F,3(row),3(dvar)]

    return flux, rows(dbase_L, dQL, "L"), rows(dbase_R, dQR, "R")


def assemble_system(fs: FluidSystem, cells: CellStatic, faces: FaceStatic,
                    state: PrimaryState, acc0: jnp.ndarray,
                    dt, want_packed: bool = False, out_dtype=None):
    """Assemble residual and Jacobian for one Newton iteration.

    R_i = (acc_i(u) - acc0_i)/dt + sum_faces +-flux_f   [surface m^3/s]
    Well/aquifer sources are added by their own modules on top of this.

    Packed formulation: ONE per-cell 3-tangent jacfwd packs every
    intensive quantity + accumulation (structured._pack_cell), then the
    per-face terms come from gathered packed values through the
    hand-derived chain rule (packed_face_terms). The earlier per-face
    jacfwd re-evaluated the full PVT stack at BOTH cells of EVERY face
    under 6 tangents — ~2F/N ~ 6 evaluations per cell per sweep, and
    tiny gather-heavy jacfwd graphs utilize the TPU terribly (the same
    pathology measured at 31.9ms for 986 fault extras).

    On TPU the per-cell sweep itself goes through the fused Pallas
    cellpack on a padded fake-plane layout (the kernel is topology-
    independent — planes are just a layout): the XLA jacfwd chain
    measured ~60ms at 12k cells where the kernel takes ~1ms. With
    ``want_packed`` returns (system, (q5, dq5) or None) for the packed
    well assembly; ``out_dtype`` sets the system storage dtype."""
    u, flag = state.u, state.flag

    from opm_autodiff_tpu.ops import pallas_cellpack as pcp

    if pcp.enabled() and pcp.supports(fs, cells):
        out = _assemble_system_cellpack(fs, cells, faces, state, acc0,
                                        dt, out_dtype)
        return out if want_packed else out[0]

    from opm_autodiff_tpu.models.structured import _pack_cell

    def one_cell(uu, ff, pv, rg, mm, ep):
        def fn(x):
            q = _pack_cell(fs, x, ff, pv, rg, mm, ep)
            return q, q

        jac, val = jax.jacfwd(fn, has_aux=True)(uu)
        return val, jac

    eps_ax = None if cells.eps is None else 0
    Q, dQ = jax.vmap(one_cell, in_axes=(0, 0, 0, 0, 0, eps_ax))(
        u, flag, cells.pore_vol_ref, cells.regs, cells.mob_mult,
        cells.eps)

    residual = (Q[:, 14:17] - acc0) / dt
    acc_jac = dQ[:, 14:17, :]
    diag = acc_jac / dt

    flux, jac_l, jac_r = packed_face_terms(
        Q[faces.left], dQ[faces.left], Q[faces.right], dQ[faces.right],
        faces.trans, faces.gdz, faces.thpres)

    # R_L += flux ; R_R -= flux
    ell = getattr(faces, "ell_face", None)
    if ell is not None:
        # gather-only accumulation of face contributions (TPU: scatter-
        # adds serialize; the fixed-degree gather vectorizes)
        sgn = jnp.where(faces.ell_left, 1.0, -1.0)
        residual = residual + (sgn[..., None]
                               * _pad_face0(flux)[ell]).sum(axis=1)
        dsel = jnp.where(faces.ell_left[..., None, None],
                         _pad_face0(jac_l)[ell], -_pad_face0(jac_r)[ell])
        diag = diag + dsel.sum(axis=1)
    else:
        residual = residual.at[faces.left].add(flux)
        residual = residual.at[faces.right].add(-flux)
        diag = diag.at[faces.left].add(jac_l)
        diag = diag.at[faces.right].add(-jac_r)
    off_lr = jac_r
    off_rl = -jac_l

    sys = BsrSystem(residual=residual, diag=diag, off_lr=off_lr,
                    off_rl=off_rl, left=faces.left, right=faces.right,
                    acc_jac=acc_jac,
                    ell_face=ell,
                    ell_nbr=getattr(faces, "ell_nbr", None),
                    ell_left=getattr(faces, "ell_left", None))
    return (sys, None) if want_packed else sys


def _assemble_system_cellpack(fs: FluidSystem, cells: CellStatic,
                              faces: FaceStatic, state: PrimaryState,
                              acc0, dt, out_dtype=None):
    """Face-list assembly fed by the fused cellpack kernel on a padded
    fake-plane layout. Returns (BsrSystem, (q5, dq5)) — the planes feed
    well4_contributions_packed (padded flat index == cell index)."""
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp

    u, flag = state.u, state.flag
    n = u.shape[0]
    f_store = jnp.float32 if out_dtype is None else out_dtype
    sub, lanes = 8, 128
    plane = sub * lanes
    kdim = max((n + plane - 1) // plane, 1)
    n_pad = kdim * plane

    def padc(a):
        if a is None or n_pad == n:
            return a
        width = [(0, n_pad - n)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, width, mode="edge")  # valid-value padding

    cells_p = cells._replace(
        pore_vol_ref=padc(cells.pore_vol_ref),
        depth=padc(cells.depth),
        regs=padc(cells.regs),
        mob_mult=padc(cells.mob_mult),
        eps=padc(cells.eps))
    q5, dq5 = pcp.cellpack_planes(fs, cells_p, padc(u), padc(flag),
                                  (kdim, sub, lanes))
    Q = jnp.transpose(q5, (0, 2, 3, 1)).reshape(n_pad, 17)[:n]
    dQ = jnp.transpose(dq5, (0, 3, 4, 1, 2)).reshape(n_pad, 17, 3)[:n]

    dt32 = jnp.asarray(dt, Q.dtype)
    residual = ((Q[:, 14:17] - acc0.astype(Q.dtype)) / dt32).astype(f_store)
    acc_jac = dQ[:, 14:17, :].astype(f_store)
    diag = (dQ[:, 14:17, :] / dt32).astype(f_store)
    inv_b = Q[:, 3:6]

    flux, jac_l, jac_r = packed_face_terms(
        Q[faces.left], dQ[faces.left], Q[faces.right], dQ[faces.right],
        faces.trans, faces.gdz, faces.thpres)
    flux = flux.astype(f_store)
    jac_l = jac_l.astype(f_store)
    jac_r = jac_r.astype(f_store)

    ell = getattr(faces, "ell_face", None)
    if ell is not None:
        sgn = jnp.where(faces.ell_left, 1.0, -1.0).astype(f_store)
        residual = residual + (sgn[..., None]
                               * _pad_face0(flux)[ell]).sum(axis=1)
        dsel = jnp.where(faces.ell_left[..., None, None],
                         _pad_face0(jac_l)[ell], -_pad_face0(jac_r)[ell])
        diag = diag + dsel.sum(axis=1)
    else:
        idx = jnp.concatenate([faces.left, faces.right])
        residual = residual.at[idx].add(
            jnp.concatenate([flux, -flux], axis=0))
        diag = diag.at[idx].add(jnp.concatenate([jac_l, -jac_r], axis=0))

    sys = BsrSystem(residual=residual, diag=diag, off_lr=jac_r,
                    off_rl=-jac_l, left=faces.left, right=faces.right,
                    acc_jac=acc_jac, inv_b=inv_b,
                    ell_face=ell,
                    ell_nbr=getattr(faces, "ell_nbr", None),
                    ell_left=getattr(faces, "ell_left", None))
    return sys, (q5, dq5)


def assemble_system_ref(fs: FluidSystem, cells: CellStatic,
                        faces: FaceStatic, state: PrimaryState,
                        acc0: jnp.ndarray, dt) -> BsrSystem:
    """Per-face jacfwd reference assembly (the pre-packed formulation;
    kept as the regression anchor for assemble_system)."""
    u, flag = state.u, state.flag

    eps_ax = None if cells.eps is None else 0
    acc, acc_jac = jax.vmap(
        _acc_val_jac, in_axes=(None, 0, 0, 0, 0, eps_ax))(
        fs, u, flag, cells.pore_vol_ref, cells.regs, cells.eps)

    residual = (acc - acc0) / dt
    diag = acc_jac / dt

    uL = u[faces.left]
    uR = u[faces.right]
    flagL = flag[faces.left]
    flagR = flag[faces.right]

    regsL = cells.regs[faces.left]
    regsR = cells.regs[faces.right]
    epsL = None if cells.eps is None else cells.eps[faces.left]
    epsR = None if cells.eps is None else cells.eps[faces.right]
    flux, jac_l, jac_r = jax.vmap(
        _flux_val_jac,
        in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, eps_ax, eps_ax))(
        fs, uL, uR, flagL, flagR, faces.trans, faces.gdz, regsL, regsR,
        faces.thpres, cells.mob_mult[faces.left],
        cells.mob_mult[faces.right], epsL, epsR)

    ell = getattr(faces, "ell_face", None)
    if ell is not None:
        sgn = jnp.where(faces.ell_left, 1.0, -1.0)
        residual = residual + (sgn[..., None]
                               * _pad_face0(flux)[ell]).sum(axis=1)
        dsel = jnp.where(faces.ell_left[..., None, None],
                         _pad_face0(jac_l)[ell], -_pad_face0(jac_r)[ell])
        diag = diag + dsel.sum(axis=1)
    else:
        residual = residual.at[faces.left].add(flux)
        residual = residual.at[faces.right].add(-flux)
        diag = diag.at[faces.left].add(jac_l)
        diag = diag.at[faces.right].add(-jac_r)
    off_lr = jac_r
    off_rl = -jac_l

    return BsrSystem(residual=residual, diag=diag, off_lr=off_lr,
                     off_rl=off_rl, left=faces.left, right=faces.right,
                     acc_jac=acc_jac,
                     ell_face=ell,
                     ell_nbr=getattr(faces, "ell_nbr", None),
                     ell_left=getattr(faces, "ell_left", None))
