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


def assemble_system(fs: FluidSystem, cells: CellStatic, faces: FaceStatic,
                    state: PrimaryState, acc0: jnp.ndarray,
                    dt) -> BsrSystem:
    """Assemble residual and Jacobian for one Newton iteration.

    R_i = (acc_i(u) - acc0_i)/dt + sum_faces +-flux_f   [surface m^3/s]
    Well/aquifer sources are added by their own modules on top of this.
    """
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

    return BsrSystem(residual=residual, diag=diag, off_lr=off_lr,
                     off_rl=off_rl, left=faces.left, right=faces.right,
                     acc_jac=acc_jac,
                     ell_face=ell,
                     ell_nbr=getattr(faces, "ell_nbr", None),
                     ell_left=getattr(faces, "ell_left", None))
