"""Pallas TPU kernel: banded block-sparse matvec (7-point blocks).

Block-size generic: 3x3 black-oil blocks or 4x4 extension blocks
(implicit polymer/brine/foam/solvent/energy — models/transport4.py);
the block loops unroll at trace time from the operand shapes.

The Krylov loop's hot op. The XLA version (structured_matvec) is a chain
of einsums + padded adds that XLA fuses well; this kernel keeps a z-plane
of x plus its two neighbors resident in VMEM while applying the diagonal
and all six bands in one pass.

Layout matters on TPU: the natural [..., 3, 3] block layout wastes VMEM
catastrophically (a (3,3) trailing tile pads to (8,128) — 114x), so the
kernel operates on transposed banks with the block dims in FRONT and the
(ny, nx) plane in the minor dims: bands [nz, 3, 3, ny, nx], vectors
[nz, 3, ny, nx]. ``prepare_banded`` does this once per assembled system
(amortized over the whole Krylov solve).

Grid: one program per z-plane; the 3x3 block algebra is unrolled into
plain (ny, nx)-plane VPU arithmetic. Edge planes mask the missing
z-neighbor with @pl.when.

Opt-in for the solver via OPM_TPU_PALLAS_SPMV=1; correctness is tested
in interpret mode on CPU and against the XLA matvec on TPU.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

def enabled() -> bool:
    """Use the kernel by default on TPU (measured 1.66x the XLA matvec
    on v5e); interpret-mode execution on CPU is for tests only.
    OPM_TPU_PALLAS_SPMV=1/0 overrides."""
    env = os.environ.get("OPM_TPU_PALLAS_SPMV")
    if env is not None:
        return env == "1"
    # single chip only: pallas_call does not partition under GSPMD (the
    # sharded mesh path keeps the XLA matvec until shard_map wrapping)
    return (jax.default_backend() not in ("cpu",)
            and jax.device_count() == 1)


def prepare_banded(sys):
    """Transpose a StructuredSystem's banks to the kernel layout.

    Returns a dict pytree: bands [nz(,+pad), nb, nb, ny, nx*], diag
    [nz, nb, nb, ny, nx]. Run once per assembly; the result feeds any
    number of ``banded_spmv_pallas`` calls.
    """
    nz, ny, nxm = sys.x_lr.shape[:3]
    nx = nxm + 1
    nb = sys.diag.shape[-1]

    def tr(band):  # [Z, Y, X, nb, nb] -> [Z, nb, nb, Y, X]
        return jnp.transpose(band, (0, 3, 4, 1, 2))

    def nonempty(band, axis):
        # singleton grid dimensions make zero-width bands; keep a dummy
        # width-1 zero band (the kernel statically skips it) so BlockSpec
        # sizes stay positive
        if band.shape[axis] == 0:
            shape = list(band.shape)
            shape[axis] = 1
            return jnp.zeros(shape, band.dtype)
        return band

    pad_hi = [(0, 1), (0, 0), (0, 0), (0, 0), (0, 0)]
    pad_lo = [(1, 0), (0, 0), (0, 0), (0, 0), (0, 0)]
    return {
        "diag": tr(sys.diag.reshape(nz, ny, nx, nb, nb)),
        "x_lr": tr(nonempty(sys.x_lr, 2)), "x_rl": tr(nonempty(sys.x_rl, 2)),
        "y_lr": tr(nonempty(sys.y_lr, 1)), "y_rl": tr(nonempty(sys.y_rl, 1)),
        # z bands padded to nz planes; plane k of z_rl holds row k, col k-1
        "z_lr": jnp.pad(tr(sys.z_lr), pad_hi),
        "z_rl": jnp.pad(tr(sys.z_rl), pad_lo),
    }


def _kernel(diag_ref, xlr_ref, xrl_ref, ylr_ref, yrl_ref, zlr_ref, zrl_ref,
            xp_ref, xc_ref, xn_ref, out_ref):
    k = pl.program_id(0)
    nz = pl.num_programs(0)
    nb, ny, nx = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    dt = xc_ref.dtype

    xc = [xc_ref[0, d] for d in range(nb)]  # nb (ny, nx) planes

    def rows(band_ref, xs):
        """y_c = sum_d band[c, d] * xs[d] for the nb rows."""
        return [sum(band_ref[0, c, d] * xs[d] for d in range(nb))
                for c in range(nb)]

    y = rows(diag_ref, xc)

    zcol = jnp.zeros((ny, 1), dt)
    zrow = jnp.zeros((1, nx), dt)

    # x bands: [3,3,ny,nx-1] against shifted columns of xc (statically
    # absent on single-column grids — prepare_banded keeps dummy banks)
    if nx > 1:
        xr = [v[:, 1:] for v in xc]
        xl = [v[:, :-1] for v in xc]
        for c, contrib in enumerate(rows(xlr_ref, xr)):
            y[c] = y[c] + jnp.concatenate([contrib, zcol], axis=1)
        for c, contrib in enumerate(rows(xrl_ref, xl)):
            y[c] = y[c] + jnp.concatenate([zcol, contrib], axis=1)

    # y bands: [3,3,ny-1,nx] against shifted rows
    if ny > 1:
        xd = [v[1:, :] for v in xc]
        xu = [v[:-1, :] for v in xc]
        for c, contrib in enumerate(rows(ylr_ref, xd)):
            y[c] = y[c] + jnp.concatenate([contrib, zrow], axis=0)
        for c, contrib in enumerate(rows(yrl_ref, xu)):
            y[c] = y[c] + jnp.concatenate([zrow, contrib], axis=0)

    # z bands: neighbor planes, masked at the grid edges
    @pl.when(k < nz - 1)
    def _():
        xn = [xn_ref[0, d] for d in range(nb)]
        for c, contrib in enumerate(rows(zlr_ref, xn)):
            out_ref[0, c] = y[c] + contrib

    @pl.when(k >= nz - 1)
    def _():
        for c in range(nb):
            out_ref[0, c] = y[c]

    @pl.when(k > 0)
    def _():
        xp = [xp_ref[0, d] for d in range(nb)]
        for c, contrib in enumerate(rows(zrl_ref, xp)):
            out_ref[0, c] = out_ref[0, c] + contrib


def banded_spmv_pallas(prep: dict, x, interpret: bool = False):
    """y = J @ x using prepared banks; x, y are [N, nb]."""
    nz, nb, ny, nx = (prep["diag"].shape[0], prep["diag"].shape[1],
                      prep["diag"].shape[3], prep["diag"].shape[4])
    dtype = prep["diag"].dtype
    # [N,nb] -> [nz, nb, ny, nx]
    x4 = jnp.transpose(x.reshape(nz, ny, nx, nb).astype(dtype),
                       (0, 3, 1, 2))

    # index maps must stay i32 under global x64 (Mosaic rejects i64
    # block indices) and may not capture array constants -> derive the
    # zero components from the traced index (k - k is i32)
    b5 = lambda shape: pl.BlockSpec(  # noqa: E731
        (1,) + shape, lambda k: (k, k - k, k - k, k - k, k - k))
    xs = lambda imap: pl.BlockSpec((1, nb, ny, nx), imap)  # noqa: E731

    out = pl.pallas_call(
        _kernel,
        grid=(nz,),
        in_specs=[
            b5((nb, nb, ny, nx)),       # diag
            b5((nb, nb, ny, max(nx - 1, 1))),   # x_lr
            b5((nb, nb, ny, max(nx - 1, 1))),   # x_rl
            b5((nb, nb, max(ny - 1, 1), nx)),   # y_lr
            b5((nb, nb, max(ny - 1, 1), nx)),   # y_rl
            b5((nb, nb, ny, nx)),       # z_lr (padded hi)
            b5((nb, nb, ny, nx)),       # z_rl (padded lo)
            xs(lambda k: (jnp.maximum(k - 1, k - k), k - k, k - k, k - k)),
            xs(lambda k: (k, k - k, k - k, k - k)),
            xs(lambda k: (jnp.minimum(k + 1, (k - k) + (nz - 1)),
                          k - k, k - k, k - k)),
        ],
        out_specs=pl.BlockSpec((1, nb, ny, nx),
                               lambda k: (k, k - k, k - k, k - k)),
        out_shape=jax.ShapeDtypeStruct((nz, nb, ny, nx), dtype),
        interpret=interpret,
    )(prep["diag"], prep["x_lr"], prep["x_rl"], prep["y_lr"], prep["y_rl"],
      prep["z_lr"], prep["z_rl"], x4, x4, x4)
    # [nz, nb, ny, nx] -> [N, nb]
    return jnp.transpose(out, (0, 2, 3, 1)).reshape(nz * ny * nx, nb)
