"""Owner-distributed StandardWell assembly: the ParallelWellInfo analog.

The reference distributes a well whose perforations span multiple MPI
ranks by giving each rank its local connections and reducing the
well-equation sums with CommunicateAboveBelow / createCommunicator
(opm/simulators/wells/ParallelWellInfo.hpp:40,
ParallelWellInfo.cpp sumPerfValues): per-connection work stays on the
cell's owner; only well-sized reductions cross ranks.

The TPU-native rebuild expresses the same locality with ``shard_map``
over the Z-slab cell mesh (parallel/mesh.py):

* each device gathers cell state at the perforations it OWNS (a local,
  on-chip gather — no all-gather of the [N]-sized state),
* runs the per-perforation rate/jacobian sweep masked to its owned
  perforations (wells/standard4._perf_sweep),
* one ``psum`` over the mesh rebuilds the [W,P]-shaped results on every
  device (perforation ownership is disjoint, so the sum is exact
  placement, not accumulation),
* the [W]-sized well-level tail (control equations, pinning, D^-1)
  runs replicated — the exact analog of every rank holding the full
  well system after the reference's reduction.

Because shard_map regions contain ONLY the collectives written here,
the communication contract is explicit: one psum of [W,P]-shaped
arrays per assembly and one [W,4] psum per Krylov matvec, nothing
proportional to the cell count (pinned by the HLO test in
tests/test_shard_wells.py). The replicated path
(wells/standard4.well4_contributions under plain GSPMD) remains
correct under any sharding; the Newton driver switches to this module
when a mesh is active and the cell axis divides it
(solvers/newton.py, ``dist_wells_enabled``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

shard_map = jax.shard_map

from opm_autodiff_tpu.wells.standard import _connection_density
from opm_autodiff_tpu.wells.standard4 import (Well4Result, _perf_sweep,
                                              _well_tail)
from opm_autodiff_tpu.utils.tinydot import esum


def _axis(mesh):
    return mesh.axis_names[0]


def dist_wells_enabled(mesh, n: int) -> bool:
    """Owner-distributed wells active? Requires a mesh, an evenly
    divisible cell axis (compressed-active arrays on ACTNUM grids stay
    replicated — shard_problem's rule), and the env opt-out unset."""
    import os

    if mesh is None or os.environ.get("OPM_TPU_DIST_WELLS", "1") == "0":
        return False
    return n % mesh.devices.size == 0


def owned_perforations(ws, n_local: int, axis: str):
    """Local index + ownership mask for this device's perforations.

    With the Z-slab decomposition (cell_sharding), device d owns global
    cell rows [d*n_local, (d+1)*n_local); a perforation belongs to the
    device owning its cell (reference: ParallelWellInfo's
    communicateFirstPerforation assigns each connection to the rank
    owning the cell)."""
    d = jax.lax.axis_index(axis)
    loc = ws.cell - d * n_local
    owned = (loc >= 0) & (loc < n_local) & ws.perf_mask
    return jnp.clip(loc, 0, n_local - 1), owned


def well4_contributions_dist(mesh, fs, u, flag, xw, ws, active_mode=None,
                             vfp_bank=None, regs=None, mob_mult=None,
                             eps=None, rho_conn=None, f0=None,
                             dt=86400.0) -> Well4Result:
    """Owner-distributed twin of wells/standard4.well4_contributions.

    ``u``/``flag``/``regs``/``mob_mult``/``eps`` are [N]-leading cell
    arrays sharded over the mesh axis (parallel/mesh.cell_sharding);
    everything well-sized is replicated. ``rho_conn`` may carry the
    substep's explicit connection densities (replicated); None computes
    them here from owned cells. Returns a fully-replicated Well4Result
    equal to the single-device assembly (tests/test_shard_wells.py).

    All traced operands pass through shard_map args (never closures) so
    this composes inside the jitted Newton iteration."""
    if active_mode is None:
        active_mode = ws.ctrl_mode
    axis = _axis(mesh)
    nsh = mesh.devices.size
    n = u.shape[0]
    assert n % nsh == 0, (n, nsh)
    n_local = n // nsh

    allow_cf = getattr(ws, "allow_crossflow", None)
    if allow_cf is None:
        allow_cf = jnp.ones(ws.num_wells, bool)

    has_regs = regs is not None
    has_mob = mob_mult is not None
    has_eps = eps is not None
    has_rho = rho_conn is not None
    opt = [a for a, h in ((regs, has_regs), (mob_mult, has_mob),
                          (eps, has_eps), (rho_conn, has_rho)) if h]
    n_cell_opt = has_regs + has_mob + has_eps
    in_specs = ([P(axis)] * 2 + [P()] * 4
                + [P(axis)] * n_cell_opt + [P()] * has_rho)

    def local(u_l, flag_l, fs_r, xw_r, ws_r, acf_r, *opt_l):
        it = iter(opt_l)
        regs_l = next(it) if has_regs else None
        mob_l = next(it) if has_mob else None
        eps_l = next(it) if has_eps else None
        rho_in = next(it) if has_rho else None

        locc, owned = owned_perforations(ws_r, n_local, axis)
        u_perf = u_l[locc]
        flag_perf = flag_l[locc]
        reg_perf = (regs_l[locc] if has_regs
                    else jnp.zeros(ws_r.cell.shape + (2,), jnp.int32))
        mob_perf = (mob_l[locc] if has_mob
                    else jnp.ones(ws_r.cell.shape + (5,)))
        eps_perf = eps_l[locc] if has_eps else None

        if not has_rho:
            # explicit per-connection densities from locally-owned
            # cells (reference calculateExplicitQuantities — per
            # connection, no along-wellbore recursion), rebuilt
            # everywhere by the psum
            rho_loc = jax.vmap(jax.vmap(
                _connection_density,
                in_axes=(None, 0, 0, None, None, None, 0)),
                in_axes=(None, 0, 0, 0, 0, 0, 0))(
                fs_r, jax.lax.stop_gradient(u_perf), flag_perf,
                jax.lax.stop_gradient(xw_r[:, 3]), ws_r.is_injector,
                ws_r.inj_phase, reg_perf)
            rho = jax.lax.psum(jnp.where(owned, rho_loc, 0.0), axis)
        else:
            rho = rho_in

        q_l, dqdu_l, dqdxw_l = _perf_sweep(
            fs_r, u_perf, flag_perf, reg_perf, mob_perf, eps_perf, xw_r,
            ws_r, rho, owned, acf_r)
        # disjoint ownership: the psum PLACES each perf's block, the
        # only cross-device traffic of the whole well assembly
        q_perf = jax.lax.psum(q_l, axis)
        dq_du = jax.lax.psum(dqdu_l, axis)
        dq_dxw = jax.lax.psum(dqdxw_l, axis)
        return q_perf, dq_du, dq_dxw, rho

    fn = shard_map(local, mesh=mesh, in_specs=tuple(in_specs),
                   out_specs=(P(), P(), P(), P()), check_vma=False)
    q_perf, dq_du, dq_dxw, rho_out = fn(u, flag, fs, xw, ws, allow_cf,
                                        *opt)
    return _well_tail(xw, ws, active_mode, vfp_bank, f0, dt,
                      q_perf, dq_du, dq_dxw, rho_out)


def apply_to_residual_dist(mesh, residual, wr: Well4Result, ws):
    """Scatter the perf rates into the SHARDED residual: each device
    adds only its owned perforations — local scatter, zero collectives
    (the replicated wells/standard4.apply_to_residual on a sharded
    residual would make XLA materialize cross-device scatters)."""
    axis = _axis(mesh)
    n_local = residual.shape[0] // mesh.devices.size

    def local(res_l, q_perf, ws_r):
        locc, owned = owned_perforations(ws_r, n_local, axis)
        q = jnp.where(owned[..., None], q_perf, 0.0)
        return res_l.at[locc.reshape(-1)].add(
            -q.reshape(-1, q.shape[-1]).astype(res_l.dtype))

    return shard_map(local, mesh=mesh, in_specs=(P(axis), P(), P()),
                     out_specs=P(axis), check_vma=False)(
        residual, wr.q_perf, ws)


def apply_to_diag_dist(mesh, diag, wr: Well4Result, ws):
    """A_cc -= dq/du at the owned perforations (local scatter)."""
    axis = _axis(mesh)
    n_local = diag.shape[0] // mesh.devices.size

    def local(diag_l, dq_du, ws_r):
        locc, owned = owned_perforations(ws_r, n_local, axis)
        d = jnp.where(owned[..., None, None], dq_du, 0.0)
        return diag_l.at[locc.reshape(-1)].add(
            -d.reshape(-1, *d.shape[-2:]).astype(diag_l.dtype))

    return shard_map(local, mesh=mesh, in_specs=(P(axis), P(), P()),
                     out_specs=P(axis), check_vma=False)(
        diag, wr.dq_du, ws)


def schur_matvec_dist(mesh, wr: Well4Result, ws, x):
    """Owner-distributed y = -C D^-1 B x on a SHARDED cell vector.

    The replicated wells/standard4.schur_matvec does an [N]-sized
    gather + scatter per Krylov iteration; here the gather/scatter stay
    on the owning device and the only traffic is ONE [W,4] psum per
    matvec (the Bx partial sums — the exact shape the reference moves
    in ParallelWellInfo::communication().sum over its well vectors)."""
    axis = _axis(mesh)
    n_local = x.shape[0] // mesh.devices.size

    def local(x_l, wr_r, ws_r):
        dt = x_l.dtype  # f32-native inside the f32 Krylov loop
        locc, owned = owned_perforations(ws_r, n_local, axis)
        x_perf = jnp.where(owned[..., None], x_l[locc], 0.0)  # [W,P,3]
        bx_l = esum("wpej,wpj->we", wr_r.b_blk.astype(dt),
                          x_perf)  # [W,4]
        bx = jax.lax.psum(bx_l, axis)
        coef = esum("wef,wf->we", wr_r.d_inv.astype(dt), bx)
        contrib = esum("wpce,we->wpc", -wr_r.dq_dxw.astype(dt), coef)
        contrib = jnp.where(owned[..., None], contrib, 0.0)
        y_l = jnp.zeros_like(x_l)
        return y_l.at[locc.reshape(-1)].add(-contrib.reshape(-1, 3))

    return shard_map(local, mesh=mesh, in_specs=(P(axis), P(), P()),
                     out_specs=P(axis), check_vma=False)(x, wr, ws)


def schur_rhs_dist(mesh, residual, wr: Well4Result, ws):
    """Owner-distributed correction C D^-1 r_w on a sharded residual:
    zero collectives (res_well/d_inv are already replicated; each
    device scatters only its owned perforations)."""
    axis = _axis(mesh)
    n_local = residual.shape[0] // mesh.devices.size

    def local(res_l, wr_r, ws_r):
        locc, owned = owned_perforations(ws_r, n_local, axis)
        coef = esum("wef,wf->we", wr_r.d_inv, wr_r.res_well)
        contrib = esum("wpce,we->wpc", -wr_r.dq_dxw, coef)
        contrib = jnp.where(owned[..., None], contrib, 0.0)
        corr = jnp.zeros_like(res_l)
        return corr.at[locc.reshape(-1)].add(
            contrib.reshape(-1, contrib.shape[-1]).astype(res_l.dtype))

    return shard_map(local, mesh=mesh, in_specs=(P(axis), P(), P()),
                     out_specs=P(axis), check_vma=False)(
        residual, wr, ws)


class DistWellApi:
    """wells/standard4-shaped facade bound to a mesh, so the Newton
    iteration can swap the well coupling wholesale (``w_api`` in
    solvers/newton.py). Falls back to the replicated implementation on
    arrays whose leading dim does not divide the mesh (the embedded
    full-box system may divide while the compressed-active arrays do
    not, and vice versa)."""

    def __init__(self, mesh):
        self.mesh = mesh

    def _ok(self, a):
        return a.shape[0] % self.mesh.devices.size == 0

    def apply_to_residual(self, residual, wr, ws):
        from opm_autodiff_tpu.wells import standard4 as s4

        if not self._ok(residual):
            return s4.apply_to_residual(residual, wr, ws)
        return apply_to_residual_dist(self.mesh, residual, wr, ws)

    def apply_to_diag(self, diag, wr, ws):
        from opm_autodiff_tpu.wells import standard4 as s4

        if not self._ok(diag):
            return s4.apply_to_diag(diag, wr, ws)
        return apply_to_diag_dist(self.mesh, diag, wr, ws)

    def schur_matvec(self, wr, ws, x):
        from opm_autodiff_tpu.wells import standard4 as s4

        if not self._ok(x):
            return s4.schur_matvec(wr, ws, x)
        return schur_matvec_dist(self.mesh, wr, ws, x)

    def schur_rhs(self, residual, wr, ws):
        from opm_autodiff_tpu.wells import standard4 as s4

        if not self._ok(residual):
            return s4.schur_rhs(residual, wr, ws)
        return schur_rhs_dist(self.mesh, residual, wr, ws)
