"""shard_map wrappers: keep the Pallas fast path on multi-chip meshes.

``pallas_call`` is a single-device program — GSPMD cannot partition it,
so round 1 disabled every hand-written kernel the moment the Newton step
was jitted over a mesh (the sharded path lost fused assembly, the SpMV
and the z-line preconditioner at once; VERDICT.md round 1 "what's weak"
#2). The fix is the standard TPU recipe: wrap each kernel in
``jax.shard_map`` over the Z-slab mesh so every device runs the
single-device kernel on its local slab, with the inter-slab coupling
carried by explicit halo exchanges (``lax.ppermute`` — the same
nearest-neighbor ICI traffic GSPMD emits for the XLA path's shifted
adds, and the TPU analog of the reference's Dune overlap halo swap,
SURVEY.md §2.9#1).

Per kernel:
  * cellpack — pointwise per cell: trivially local, no halo.
  * flux/band assembly — each device extends its slab with one halo
    plane of packed quantities per side (ppermute), runs the unchanged
    flux kernel on the [nzl+2]-plane extended slab, and keeps the
    interior rows. Interior z faces at slab boundaries are computed by
    BOTH neighbors (each keeps its own row's half) — the same
    evaluate-twice trade the kernel already makes between grid planes.
  * banded SpMV — bands are pre-extended once per assembly
    (prepare_banded_sharded); each matvec halo-exchanges only the two
    boundary planes of x.
  * z-line block-Thomas — factored per slab with the inter-slab
    coupling dropped: additive Schwarz with exact slab solves, the
    direct analog of the reference's per-rank decoupled
    ParallelOverlappingILU0 (interiorStart semantics,
    linalg/ParallelOverlappingILU0.hpp:604).

Interpret-mode (CPU) execution is supported for the virtual-mesh test
tier; on hardware the kernels emit the same Mosaic programs as the
single-chip path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def kernels_enabled(mesh) -> bool:
    """Use the shard_mapped Pallas kernels for this mesh?"""
    if mesh is None or mesh.devices.size <= 1:
        return False
    env = os.environ.get("OPM_TPU_PALLAS_SHARDED")
    if env is not None:
        return env == "1"
    return jax.default_backend() not in ("cpu",)


def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


def _axis(mesh) -> str:
    return mesh.axis_names[0]


def _perm_fwd(mesh):
    """source i -> dest i+1 (carry my LAST plane to the next slab)."""
    n = mesh.devices.size
    return [(i, i + 1) for i in range(n - 1)]


def _perm_bwd(mesh):
    """source i -> dest i-1 (carry my FIRST plane to the previous slab)."""
    n = mesh.devices.size
    return [(i + 1, i) for i in range(n - 1)]


def _halo_prev(a, axis_name, mesh):
    """[1, ...] plane received from the previous slab (zeros on slab 0)."""
    return jax.lax.ppermute(a[-1:], axis_name, _perm_fwd(mesh))


def _halo_next(a, axis_name, mesh):
    """[1, ...] plane received from the next slab (zeros on the last)."""
    return jax.lax.ppermute(a[:1], axis_name, _perm_bwd(mesh))


def _cell_specs(tree, n_cells, axis):
    """P(axis) on every [N,...]-leading leaf, replicated otherwise."""
    def spec(a):
        if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == n_cells:
            return P(axis, *([None] * (a.ndim - 1)))
        return P()

    return jax.tree.map(spec, tree)


# ---------------------------------------------------------------------------
# Fused assembly (cellpack + flux/band) under shard_map
# ---------------------------------------------------------------------------

def assemble_fast_sharded(mesh, fs, cells, topo, u, flag, acc0, dt,
                          interpret: bool | None = None):
    """Sharded two-launch assembly; returns a StructuredSystem (f64).

    Same contract as models/structured.assemble_structured's fast path,
    with every per-cell/per-plane array sharded over the mesh's z axis.
    Requires nz % n_devices == 0 (grids pad to this, structured.py
    nz_pad).
    """
    from opm_autodiff_tpu.models.structured import StructuredSystem
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp
    from opm_autodiff_tpu.ops import pallas_flux

    if interpret is None:
        interpret = _interpret_default()
    nx, ny, nz = topo.dims
    ndev = mesh.devices.size
    nzl = nz // ndev
    ax = _axis(mesh)
    n_cells = nz * ny * nx
    f32 = jnp.float32

    # z-face arrays padded to one row per PLANE (face above each plane;
    # zero above the last) so they shard like the planes do
    zrow = jnp.zeros((1, ny, nx), topo.trans_z.dtype)
    tzp = jnp.concatenate([topo.trans_z, zrow], axis=0)
    gzp = jnp.concatenate([topo.gdz_z, zrow], axis=0)

    plane = lambda a: P(ax, *([None] * (a.ndim - 1)))  # noqa: E731

    def local(cells_l, u_l, flag_l, acc0_l, tx, gx, ty, gy, tz, gz):
        q, dq = pcp.cellpack_planes(fs, cells_l, u_l, flag_l,
                                    (nzl, ny, nx), interpret)
        # halo exchange: one packed plane per side
        qp = _halo_prev(q, ax, mesh)
        qn = _halo_next(q, ax, mesh)
        dqp = _halo_prev(dq, ax, mesh)
        dqn = _halo_next(dq, ax, mesh)
        q_e = jnp.concatenate([qp, q, qn], axis=0)
        dq_e = jnp.concatenate([dqp, dq, dqn], axis=0)
        # face z arrays for the extended slab: ext plane e is global
        # plane (base-1+e); the face ABOVE it is global face (base-1+e)
        # = tz_e[e]; the face BELOW it is tz_e[e-1] (zero for the first
        # halo row — sliced away anyway)
        tz_e = jnp.concatenate(
            [_halo_prev(tz, ax, mesh), tz, jnp.zeros_like(tz[:1])], axis=0)
        gz_e = jnp.concatenate(
            [_halo_prev(gz, ax, mesh), gz, jnp.zeros_like(gz[:1])], axis=0)
        tzh = tz_e.astype(f32)              # face above each ext plane
        gzh = gz_e.astype(f32)
        zf = jnp.zeros_like(tzh[:1])
        tzl = jnp.concatenate([zf, tzh[:-1]], axis=0)  # face below
        gzl = jnp.concatenate([zf, gzh[:-1]], axis=0)
        zero3 = jnp.zeros((1,) + tx.shape[1:], f32)
        tx_e = jnp.concatenate([zero3, tx.astype(f32), zero3], axis=0)
        gx_e = jnp.concatenate([zero3, gx.astype(f32), zero3], axis=0)
        zero3y = jnp.zeros((1,) + ty.shape[1:], f32)
        ty_e = jnp.concatenate([zero3y, ty.astype(f32), zero3y], axis=0)
        gy_e = jnp.concatenate([zero3y, gy.astype(f32), zero3y], axis=0)
        acc0p = jnp.transpose(acc0_l.reshape(nzl, ny, nx, 3).astype(f32),
                              (0, 3, 1, 2))
        zeroacc = jnp.zeros((1, 3, ny, nx), f32)
        acc0_e = jnp.concatenate([zeroacc, acc0p, zeroacc], axis=0)

        (res_e, diag_e, xlr_e, xrl_e, ylr_e, yrl_e, zlr_e,
         zrl_e) = pallas_flux.flux_bands_arrays(
            q_e, dq_e, acc0_e, tx_e, gx_e, ty_e, gy_e,
            tzh, gzh, tzl, gzl, dt, interpret)

        pp = ny * nx
        res = res_e.reshape(nzl + 2, pp, 3)[1:-1].reshape(nzl * pp, 3)
        diag = diag_e.reshape(nzl + 2, pp, 3, 3)[1:-1].reshape(
            nzl * pp, 3, 3)
        x_lr, x_rl = xlr_e[1:-1], xrl_e[1:-1]
        y_lr, y_rl = ylr_e[1:-1], yrl_e[1:-1]
        # flux_bands returns z_lr[i] = coupling ext plane i -> i+1 and
        # z_rl[i] = coupling ext plane i+1 -> i (its [1:] shift). Global
        # face base+k is ext face k+1: z_lr row k+1; global row base+k
        # coupling downward is ext plane k+1: z_rl row k.
        z_lr = zlr_e[1:nzl + 1]
        z_rl = zrl_e[0:nzl]
        inv_b = jnp.transpose(q[:, 3:6], (0, 2, 3, 1)).reshape(
            nzl * pp, 3)
        acc_jac = jnp.transpose(dq[:, 14:17], (0, 3, 4, 1, 2)).reshape(
            nzl * pp, 3, 3)
        return (res, diag, x_lr, x_rl, y_lr, y_rl, z_lr, z_rl,
                inv_b, acc_jac)

    in_specs = (
        _cell_specs(cells, n_cells, ax),
        P(ax, None), P(ax),          # u [N,3], flag [N]
        P(ax, None),                 # acc0 [N,3]
        plane(topo.trans_x), plane(topo.gdz_x),
        plane(topo.trans_y), plane(topo.gdz_y),
        plane(tzp), plane(gzp),
    )
    nxm, nym = topo.trans_x.shape[2], topo.trans_y.shape[1]
    out_specs = (
        P(ax, None), P(ax, None, None),
        *([P(ax, *([None] * 4))] * 6),
        P(ax, None), P(ax, None, None),
    )
    (res, diag, x_lr, x_rl, y_lr, y_rl, z_lr, z_rl, inv_b,
     acc_jac) = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(
        cells, u, flag, acc0, topo.trans_x, topo.gdz_x,
        topo.trans_y, topo.gdz_y, tzp, gzp)

    f64 = u.dtype
    return StructuredSystem(
        residual=res.astype(f64), diag=diag.astype(f64),
        x_lr=x_lr.astype(f64), x_rl=x_rl.astype(f64),
        y_lr=y_lr.astype(f64), y_rl=y_rl.astype(f64),
        z_lr=z_lr[:-1].astype(f64), z_rl=z_rl[1:].astype(f64),
        inv_b=inv_b.astype(f64), acc_jac=acc_jac.astype(f64))


# ---------------------------------------------------------------------------
# Banded SpMV under shard_map
# ---------------------------------------------------------------------------

def prepare_banded_sharded(mesh, sys, interpret: bool | None = None):
    """Extend each slab's banks with zero boundary planes ONCE so the
    per-matvec shard_map only exchanges x halos. Returns an ext-packed
    prep dict: leading dim (nzl+2)*n_devices, sharded over the mesh."""
    from opm_autodiff_tpu.ops import pallas_spmv

    prep = pallas_spmv.prepare_banded(sys)
    ax = _axis(mesh)

    def local(prep_l):
        def ext(a):
            zero = jnp.zeros((1,) + a.shape[1:], a.dtype)
            return jnp.concatenate([zero, a, zero], axis=0)

        return {k: ext(v) for k, v in prep_l.items()}

    spec = jax.tree.map(lambda a: P(ax, *([None] * (a.ndim - 1))), prep)
    prep_ext = jax.shard_map(local, mesh=mesh, in_specs=(spec,),
                             out_specs=spec, check_vma=False)(prep)
    prep_ext["_interpret"] = (interpret if interpret is not None
                              else _interpret_default())
    return prep_ext


def banded_spmv_sharded(mesh, prep_ext, x):
    """y = J @ x with ext-packed banks; x, y are [N, nb] z-sharded."""
    from opm_autodiff_tpu.ops import pallas_spmv

    interpret = prep_ext["_interpret"]
    banks = {k: v for k, v in prep_ext.items() if k != "_interpret"}
    ax = _axis(mesh)
    nze, nb, _, ny, nx = banks["diag"].shape
    ndev = mesh.devices.size
    nzl = nze // ndev - 2
    pp = ny * nx

    def local(banks_l, x_l):
        x4 = jnp.transpose(
            x_l.reshape(nzl, ny, nx, nb).astype(banks_l["diag"].dtype),
            (0, 3, 1, 2))
        xp = _halo_prev(x4, ax, mesh)
        xn = _halo_next(x4, ax, mesh)
        x_e = jnp.concatenate([xp, x4, xn], axis=0)
        x_e2 = jnp.transpose(x_e, (0, 2, 3, 1)).reshape((nzl + 2) * pp, nb)
        y_e = pallas_spmv.banded_spmv_pallas(banks_l, x_e2, interpret)
        return y_e.reshape(nzl + 2, pp, nb)[1:-1].reshape(nzl * pp, nb)

    bank_spec = jax.tree.map(
        lambda a: P(ax, *([None] * (a.ndim - 1))), banks)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(bank_spec, P(ax, None)),
        out_specs=P(ax, None), check_vma=False)(banks, x)


# ---------------------------------------------------------------------------
# Z-line block-Thomas under shard_map (additive Schwarz over slabs)
# ---------------------------------------------------------------------------

def prepare_zline_sharded(mesh, sys, interpret: bool | None = None):
    """Per-slab factorization with inter-slab coupling dropped."""
    from opm_autodiff_tpu.ops import pallas_spmv, pallas_zline

    if interpret is None:
        interpret = _interpret_default()
    prep = pallas_spmv.prepare_banded(sys)
    ax = _axis(mesh)

    def local(diag_l, zlr_l, zrl_l):
        # Schwarz cut: the last plane's up-coupling and the first
        # plane's down-coupling leave the slab — zero them so the local
        # factorization is exact on the slab
        zlr_l = zlr_l.at[-1].set(0.0)
        zrl_l = zrl_l.at[0].set(0.0)
        return pallas_zline.prepare_zline(
            {"diag": diag_l, "z_lr": zlr_l, "z_rl": zrl_l}, interpret)

    s5 = P(ax, *([None] * 4))
    fact = jax.shard_map(
        local, mesh=mesh, in_specs=(s5, s5, s5),
        out_specs={"inv": s5, "cp": s5, "L": s5}, check_vma=False)(
        prep["diag"], prep["z_lr"], prep["z_rl"])
    fact["_interpret"] = interpret
    return fact


def zline_apply_sharded(mesh, fact, r):
    """x = T_slab^-1 r, fully local per slab."""
    from opm_autodiff_tpu.ops import pallas_zline

    interpret = fact["_interpret"]
    banks = {k: v for k, v in fact.items() if k != "_interpret"}
    ax = _axis(mesh)

    def local(banks_l, r_l):
        return pallas_zline.zline_apply_pallas(banks_l, r_l, interpret)

    s5 = P(ax, *([None] * 4))
    return jax.shard_map(
        local, mesh=mesh,
        in_specs=({"inv": s5, "cp": s5, "L": s5}, P(ax, None)),
        out_specs=P(ax, None), check_vma=False)(banks, r)


# ---------------------------------------------------------------------------
# 2-D (z, y) mesh variants (VERDICT r4 next #7)
#
# The 1-D wrappers above bound the mesh at nz devices (Norne: 22). These
# variants tile the box over BOTH the z and y mesh axes: the y-halo
# recipe mirrors the z one (one packed row per side via ppermute over
# the y axis), and the z exchange runs on the y-EXTENDED arrays so the
# corner halos arrive filled from the diagonal neighbors for free
# (TPFA needs no corners — they only make the discarded halo rows
# consistent). shard_map boundaries here take BOX-shaped arrays
# ([nz, ny, nx, ...], specs P(z, y, ...)): callers reshape their flat
# k-major cell arrays once per assembly.
# ---------------------------------------------------------------------------


def _perms(n):
    return ([(i, i + 1) for i in range(n - 1)],
            [(i + 1, i) for i in range(n - 1)])


def _ysl(a, y_axis, i0, i1):
    idx = [slice(None)] * a.ndim
    idx[y_axis] = slice(i0, i1)
    return a[tuple(idx)]


def _extend_y(a, yax, ndev_y, y_axis):
    """Concat one halo row per side along ``y_axis`` (zeros at the
    global edges)."""
    fwd, bwd = _perms(ndev_y)
    ny_l = a.shape[y_axis]
    yp = jax.lax.ppermute(_ysl(a, y_axis, ny_l - 1, ny_l), yax, fwd)
    yn = jax.lax.ppermute(_ysl(a, y_axis, 0, 1), yax, bwd)
    return jnp.concatenate([yp, a, yn], axis=y_axis)


def _extend_z(a, zax, ndev_z):
    """Concat one halo plane per side along axis 0."""
    fwd, bwd = _perms(ndev_z)
    zp = jax.lax.ppermute(a[-1:], zax, fwd)
    zn = jax.lax.ppermute(a[:1], zax, bwd)
    return jnp.concatenate([zp, a, zn], axis=0)


def _zero_pad(a, axis):
    z = jnp.zeros_like(_ysl(a, axis, 0, 1))
    return jnp.concatenate([z, a, z], axis=axis)


def assemble_fast_sharded2(mesh, fs, cells, topo, u, flag, acc0, dt,
                           interpret: bool | None = None):
    """2-D-tiled two-launch assembly; same contract as
    assemble_fast_sharded but over a (z, y) mesh. Requires
    nz % ndev_z == 0 and ny % ndev_y == 0."""
    from opm_autodiff_tpu.models.structured import StructuredSystem
    from opm_autodiff_tpu.ops import pallas_cellpack as pcp
    from opm_autodiff_tpu.ops import pallas_flux

    if interpret is None:
        interpret = _interpret_default()
    nx, ny, nz = topo.dims
    zax, yax = mesh.axis_names
    ndz, ndy = mesh.devices.shape
    nzl, nyl = nz // ndz, ny // ndy
    n_cells = nz * ny * nx
    f32 = jnp.float32

    # per-plane/per-row padded face arrays so every tile owns the faces
    # ABOVE its planes / rows (zero at the global top ends)
    zrow = jnp.zeros((1, ny, nx), topo.trans_z.dtype)
    tzp = jnp.concatenate([topo.trans_z, zrow], axis=0)
    gzp = jnp.concatenate([topo.gdz_z, zrow], axis=0)
    yrow = jnp.zeros((nz, 1, nx), topo.trans_y.dtype)
    typ = jnp.concatenate([topo.trans_y, yrow], axis=1)
    gyp = jnp.concatenate([topo.gdz_y, yrow], axis=1)

    def box(a):
        return a.reshape(nz, ny, nx, *a.shape[1:])

    is_cell = lambda a: (hasattr(a, "ndim") and a.ndim >= 1  # noqa: E731
                         and a.shape[0] == n_cells)
    cells_b = jax.tree.map(lambda a: box(a) if is_cell(a) else a, cells)

    def cspec(a):
        if is_cell(a):
            return P(zax, yax, *([None] * (a.ndim - 1)))
        return P()

    cell_specs = jax.tree.map(cspec, cells)  # same structure as cells_b
    box3 = P(zax, yax, None)

    def local(cells_l, u_l, flag_l, acc0_l, tx, gx, ty, gy, tz, gz):
        def unbox(a):
            if (hasattr(a, "ndim") and a.ndim >= 3
                    and a.shape[:3] == (nzl, nyl, nx)):
                return a.reshape(nzl * nyl * nx, *a.shape[3:])
            return a

        cells_f = jax.tree.map(unbox, cells_l)
        q, dq = pcp.cellpack_planes(fs, cells_f, unbox(u_l),
                                    unbox(flag_l), (nzl, nyl, nx),
                                    interpret)
        # y then z halo exchange (y rides inside the z exchange so the
        # corners arrive filled — see module comment)
        q_e = _extend_z(_extend_y(q, yax, ndy, 2), zax, ndz)
        dq_e = _extend_z(_extend_y(dq, yax, ndy, dq.ndim - 2), zax, ndz)
        # z faces for the extended box: zero at y halos (only the
        # discarded halo rows' z-coupling), halo-exchanged in z
        tz_y = _zero_pad(tz.astype(f32), 1)
        gz_y = _zero_pad(gz.astype(f32), 1)
        tzh = _extend_z(tz_y, zax, ndz)
        gzh = _extend_z(gz_y, zax, ndz)
        zf = jnp.zeros_like(tzh[:1])
        tzl = jnp.concatenate([zf, tzh[:-1]], axis=0)
        gzl = jnp.concatenate([zf, gzh[:-1]], axis=0)
        # y faces: ext box has nyl+1 inter-row faces = [face from the
        # previous tile's boundary row, my per-row-padded faces]
        fwd_y, _ = _perms(ndy)
        ty32, gy32 = ty.astype(f32), gy.astype(f32)
        ty_recv = jax.lax.ppermute(ty32[:, -1:], yax, fwd_y)
        gy_recv = jax.lax.ppermute(gy32[:, -1:], yax, fwd_y)
        ty_e = _zero_pad(jnp.concatenate([ty_recv, ty32], axis=1), 0)
        gy_e = _zero_pad(jnp.concatenate([gy_recv, gy32], axis=1), 0)
        # x faces: zero at all halos
        tx_e = _zero_pad(_zero_pad(tx.astype(f32), 1), 0)
        gx_e = _zero_pad(_zero_pad(gx.astype(f32), 1), 0)
        acc0p = jnp.transpose(
            acc0_l.reshape(nzl, nyl, nx, 3).astype(f32), (0, 3, 1, 2))
        acc0_e = _zero_pad(_zero_pad(acc0p, 2), 0)

        (res_e, diag_e, xlr_e, xrl_e, ylr_e, yrl_e, zlr_e,
         zrl_e) = pallas_flux.flux_bands_arrays(
            q_e, dq_e, acc0_e, tx_e, gx_e, ty_e, gy_e,
            tzh, gzh, tzl, gzl, dt, interpret)

        nze, nye = nzl + 2, nyl + 2
        res = res_e.reshape(nze, nye, nx, 3)[1:-1, 1:-1]
        diag = diag_e.reshape(nze, nye, nx, 3, 3)[1:-1, 1:-1]
        x_lr = xlr_e[1:-1, 1:-1]
        x_rl = xrl_e[1:-1, 1:-1]
        # y bands in per-row padded form (row j holds the face above
        # global row j; zero at the global end — sliced by the caller):
        # ylr_e[f] couples ext row f <- f+1, yrl_e[f] couples f+1 <- f
        y_lr_p = ylr_e[1:-1, 1:nyl + 1]
        y_rl_p = yrl_e[1:-1, 0:nyl]
        # z bands in per-plane padded form (as the 1-D wrapper)
        z_lr_p = zlr_e[1:nzl + 1, 1:-1]
        z_rl_p = zrl_e[0:nzl, 1:-1]
        inv_b = jnp.transpose(q[:, 3:6], (0, 2, 3, 1))
        acc_jac = jnp.transpose(dq[:, 14:17], (0, 3, 4, 1, 2))
        return (res, diag, x_lr, x_rl, y_lr_p, y_rl_p, z_lr_p, z_rl_p,
                inv_b, acc_jac)

    in_specs = (
        cell_specs,
        box3 if u.ndim == 1 else P(zax, yax, None, None),
        box3,
        P(zax, yax, None, None),
        box3, box3,   # tx, gx ([nz, ny, nx-1])
        box3, box3,   # typ, gyp
        box3, box3,   # tzp, gzp
    )
    b5 = P(zax, yax, *([None] * 3))
    out_specs = (
        P(zax, yax, None, None), P(zax, yax, None, None, None),
        *([b5] * 6),
        P(zax, yax, None, None), P(zax, yax, None, None, None),
    )
    (res, diag, x_lr, x_rl, y_lr_p, y_rl_p, z_lr_p, z_rl_p, inv_b,
     acc_jac) = jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False)(
        cells_b, box(u), box(flag), box(acc0),
        topo.trans_x, topo.gdz_x, typ, gyp, tzp, gzp)

    f64 = u.dtype
    return StructuredSystem(
        residual=res.reshape(n_cells, 3).astype(f64),
        diag=diag.reshape(n_cells, 3, 3).astype(f64),
        x_lr=x_lr.astype(f64), x_rl=x_rl.astype(f64),
        y_lr=y_lr_p[:, :-1].astype(f64), y_rl=y_rl_p[:, 1:].astype(f64),
        z_lr=z_lr_p[:-1].astype(f64), z_rl=z_rl_p[1:].astype(f64),
        inv_b=inv_b.reshape(n_cells, 3).astype(f64),
        acc_jac=acc_jac.reshape(n_cells, 3, 3).astype(f64))


def prepare_banded_sharded2(mesh, sys, interpret: bool | None = None):
    """Per-tile extended banks on the (z, y) mesh: the cross-tile y/z
    coupling values already live in the owning row's tile (per-row /
    per-plane padded forms), so the extension is local zero-padding —
    no exchange. Per-matvec traffic is the x halos only."""
    from opm_autodiff_tpu.ops import pallas_spmv

    prep = pallas_spmv.prepare_banded(sys)
    zax, yax = mesh.axis_names
    nb = prep["diag"].shape[1]

    # pad the y banks to per-row form first (global arrays)
    pady_hi = [(0, 0), (0, 0), (0, 0), (0, 1), (0, 0)]
    pady_lo = [(0, 0), (0, 0), (0, 0), (1, 0), (0, 0)]
    y_lr_p = jnp.pad(prep["y_lr"], pady_hi)  # row j: couple j <- j+1
    y_rl_p = jnp.pad(prep["y_rl"], pady_lo)  # row j: couple j <- j-1

    def local(p):
        def extz(a):
            z = jnp.zeros_like(a[:1])
            return jnp.concatenate([z, a, z], axis=0)

        def exty(a):
            return _zero_pad(a, 3)

        out = {}
        for k in ("diag", "x_lr", "x_rl", "z_lr", "z_rl"):
            out[k] = extz(exty(p[k]))
        # ext-box y banks: nyl+1 inter-row faces (see the assembly
        # wrapper): y_lr_ext[0] couples the discarded halo row (zero);
        # y_rl_ext[nyl] likewise
        zrow = jnp.zeros_like(_ysl(p["y_lr_p"], 3, 0, 1))
        out["y_lr"] = extz(
            jnp.concatenate([zrow, p["y_lr_p"]], axis=3))
        out["y_rl"] = extz(
            jnp.concatenate([p["y_rl_p"], zrow], axis=3))
        return out

    banks = {k: prep[k] for k in ("diag", "x_lr", "x_rl", "z_lr",
                                  "z_rl")}
    banks["y_lr_p"] = y_lr_p
    banks["y_rl_p"] = y_rl_p
    s5 = P(zax, None, None, yax, None)
    in_spec = {k: s5 for k in banks}
    out_spec = {k: s5 for k in ("diag", "x_lr", "x_rl", "y_lr", "y_rl",
                                "z_lr", "z_rl")}
    prep_ext = jax.shard_map(local, mesh=mesh, in_specs=(in_spec,),
                             out_specs=out_spec, check_vma=False)(banks)
    prep_ext["_interpret"] = (interpret if interpret is not None
                              else _interpret_default())
    return prep_ext


def banded_spmv_sharded2(mesh, prep_ext, x):
    """y = J @ x on the (z, y) mesh; x, y flat [N, nb] k-major."""
    from opm_autodiff_tpu.ops import pallas_spmv

    interpret = prep_ext["_interpret"]
    banks = {k: v for k, v in prep_ext.items() if k != "_interpret"}
    zax, yax = mesh.axis_names
    ndz, ndy = mesh.devices.shape
    nze, nb, _, nye, nx = banks["diag"].shape
    nzl = nze // ndz - 2
    nyl = nye // ndy - 2
    nz, ny = nzl * ndz, nyl * ndy

    def local(banks_l, x_l):
        x4 = jnp.transpose(x_l.astype(banks_l["diag"].dtype),
                           (0, 3, 1, 2))            # [nzl, nb, nyl, nx]
        x_e = _extend_z(_extend_y(x4, yax, ndy, 2), zax, ndz)
        x_e2 = jnp.transpose(x_e, (0, 2, 3, 1)).reshape(
            (nzl + 2) * (nyl + 2) * nx, nb)
        y_e = pallas_spmv.banded_spmv_pallas(banks_l, x_e2, interpret)
        y4 = y_e.reshape(nzl + 2, nyl + 2, nx, nb)[1:-1, 1:-1]
        return y4

    s5 = P(zax, None, None, yax, None)
    bank_spec = {k: s5 for k in banks}
    yb = jax.shard_map(
        local, mesh=mesh,
        in_specs=(bank_spec, P(zax, yax, None, None)),
        out_specs=P(zax, yax, None, None), check_vma=False)(
        banks, x.reshape(nz, ny, nx, nb))
    return yb.reshape(nz * ny * nx, nb)


def prepare_zline_sharded2(mesh, sys, interpret: bool | None = None):
    """Per-tile z-line factorization on the (z, y) mesh. The block-
    Thomas solve runs along z only, so the y split is EXACT (each (y,x)
    column lives wholly in one tile); the z split is the same additive-
    Schwarz cut as the 1-D wrapper."""
    from opm_autodiff_tpu.ops import pallas_spmv, pallas_zline

    if interpret is None:
        interpret = _interpret_default()
    prep = pallas_spmv.prepare_banded(sys)
    zax, yax = mesh.axis_names

    def local(diag_l, zlr_l, zrl_l):
        zlr_l = zlr_l.at[-1].set(0.0)
        zrl_l = zrl_l.at[0].set(0.0)
        return pallas_zline.prepare_zline(
            {"diag": diag_l, "z_lr": zlr_l, "z_rl": zrl_l}, interpret)

    s5 = P(zax, None, None, yax, None)
    fact = jax.shard_map(
        local, mesh=mesh, in_specs=(s5, s5, s5),
        out_specs={"inv": s5, "cp": s5, "L": s5}, check_vma=False)(
        prep["diag"], prep["z_lr"], prep["z_rl"])
    fact["_interpret"] = interpret
    return fact


def zline_apply_sharded2(mesh, fact, r):
    """x = T_tile^-1 r on the (z, y) mesh; r, x flat [N, nb]."""
    from opm_autodiff_tpu.ops import pallas_zline

    interpret = fact["_interpret"]
    banks = {k: v for k, v in fact.items() if k != "_interpret"}
    zax, yax = mesh.axis_names
    ndz, ndy = mesh.devices.shape
    nz, nb, _, ny, nx = banks["inv"].shape

    def local(banks_l, r_l):
        nzl, nyl = r_l.shape[0], r_l.shape[1]
        r2 = r_l.reshape(nzl * nyl * nx, nb)
        x2 = pallas_zline.zline_apply_pallas(banks_l, r2, interpret)
        return x2.reshape(nzl, nyl, nx, nb)

    s5 = P(zax, None, None, yax, None)
    xb = jax.shard_map(
        local, mesh=mesh,
        in_specs=({"inv": s5, "cp": s5, "L": s5},
                  P(zax, yax, None, None)),
        out_specs=P(zax, yax, None, None), check_vma=False)(
        banks, r.reshape(nz, ny, nx, nb))
    return xb.reshape(nz * ny * nx, nb)
