"""Batched 4-DOF StandardWell: WQTotal / WFrac / GFrac / Bhp per well.

The reference's production well model
(/root/reference/opm/simulators/wells/StandardWell.hpp:126-133 primary
variables; StandardWell_impl.hpp:188-297 assembly; StandardWellEval.cpp:965
computePerfRate) carries rate + composition unknowns per well so that rate
controls become (nearly) linear constraints on the well system and
crossflow perforations inject the wellbore mixture. This module is the
TPU-native rebuild: all wells batched into padded ``[W, ...]`` arrays,
per-perforation forward-mode AD via ``vmap(jacfwd)``, B/C/D blocks as
dense tiny tensors with an explicitly inverted D (``[W,4,4]``), and the
Schur complement ``y -= C D^-1 B x`` fused into the Krylov operator
(reference: WellOperators.hpp:99; StandardWell_impl.hpp:1273 apply).

Primary variables per well (``xw [W,4]``):
  xw[:,0] = q_t   total rate: producers carry the scaled total surface
                  rate sum_p scal_p * q_p (negative = production;
                  scal = [1, 1, 0.01], WellInterfaceIndices.cpp:99);
                  injectors carry the injected-phase surface rate
                  (StandardWellEval.cpp:268-287 updatePrimaryVariables)
  xw[:,1] = f_w   scaled water volume fraction   (WFrac)
  xw[:,2] = f_g   scaled gas volume fraction     (GFrac)
  xw[:,3] = bhp   bottom-hole pressure           (Bhp)

Well equations (``res [W,4]``, StandardWell_impl.hpp:263-285):
  res[c]  = efac*(sum_p cq_s[p,c] - Q_c(xw)) + (VOL/dt)*(cmix_c - F0_c)
  res[3]  = control equation (WellInterfaceEval.cpp:272 assembleControlEqProd
            / :386 assembleControlEqInj) on primary-variable rates.

Sign convention matches the package: q > 0 is surface volume flowing INTO
the cell (so producers have negative rates), identical to the reference's
cq_s.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.models.blackoil import intensive
from opm_autodiff_tpu.props.fluid import FluidSystem
from opm_autodiff_tpu.wells.standard import (CTRL_BHP, CTRL_GRAT, CTRL_LRAT,
                                             CTRL_ORAT, CTRL_RATE, CTRL_RESV,
                                             CTRL_STOP, CTRL_THP, CTRL_WRAT,
                                             WellSet, _split_banks)
from opm_autodiff_tpu.utils.tinydot import esum

# component scaling factors (water, oil, gas) — gas rates are ~100x the
# liquid rates in surface volume, the 0.01 rebalances the fraction space
# (reference: WellInterfaceIndices.cpp:99-114 scalingFactor).
# NumPy, not jnp: a module-level device array would initialize the JAX
# backend at import time, before the CLI can pick a platform.
SCAL = np.array([1.0, 1.0, 0.01])
# wellbore volume for the storage regularization term: 0.1 cu ft
# (reference: StandardWell_impl.hpp:196)
WELLBORE_VOLUME = 0.002831684659200


def invert44(m):
    """Branch-free cofactor inverse of [...,4,4] blocks with the
    determinant as aux.

    TPU-safe: ``jnp.linalg.inv`` lowers to an f64 LU decomposition the
    TPU backend does not implement; the adjugate formulation is pure
    mul/add (reference analog: Dune::ISTLUtility::invertMatrix on the
    4x4 D block, StandardWell_impl.hpp:285).
    """
    a = m[..., 0, 0]; b = m[..., 0, 1]; c = m[..., 0, 2]; d = m[..., 0, 3]
    e = m[..., 1, 0]; f = m[..., 1, 1]; g = m[..., 1, 2]; h = m[..., 1, 3]
    i = m[..., 2, 0]; j = m[..., 2, 1]; k = m[..., 2, 2]; ll = m[..., 2, 3]
    mm = m[..., 3, 0]; n = m[..., 3, 1]; o = m[..., 3, 2]; p = m[..., 3, 3]

    s0 = a * f - b * e
    s1 = a * g - c * e
    s2 = a * h - d * e
    s3 = b * g - c * f
    s4 = b * h - d * f
    s5 = c * h - d * g
    c5 = k * p - ll * o
    c4 = j * p - ll * n
    c3 = j * o - k * n
    c2 = i * p - ll * mm
    c1 = i * o - k * mm
    c0 = i * n - j * mm

    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 0, det, 1.0)

    adj = jnp.stack([
        jnp.stack([f * c5 - g * c4 + h * c3,
                   -b * c5 + c * c4 - d * c3,
                   n * s5 - o * s4 + p * s3,
                   -j * s5 + k * s4 - ll * s3], axis=-1),
        jnp.stack([-e * c5 + g * c2 - h * c1,
                   a * c5 - c * c2 + d * c1,
                   -mm * s5 + o * s2 - p * s1,
                   i * s5 - k * s2 + ll * s1], axis=-1),
        jnp.stack([e * c4 - f * c2 + h * c0,
                   -a * c4 + b * c2 - d * c0,
                   mm * s4 - n * s2 + p * s0,
                   -i * s4 + j * s2 - ll * s0], axis=-1),
        jnp.stack([-e * c3 + f * c1 - g * c0,
                   a * c3 - b * c1 + c * c0,
                   -mm * s3 + n * s1 - o * s0,
                   i * s3 - j * s1 + k * s0], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None], det


class Well4Result(NamedTuple):
    """Per-iteration well assembly output (device pytree)."""

    q_perf: jnp.ndarray    # [W,P,3] surface rates into cells (efac-scaled)
    dq_du: jnp.ndarray     # [W,P,3,3] d q_perf / d u_cell (efac-scaled)
    dq_dxw: jnp.ndarray    # [W,P,3,4] d q_perf / d xw     (efac-scaled)
    res_well: jnp.ndarray  # [W,4]
    b_blk: jnp.ndarray     # [W,P,4,3]  d res_well / d u_cell(perf)
    d_inv: jnp.ndarray     # [W,4,4]    D^-1 (explicit, like invDuneD_)
    rho_conn: jnp.ndarray  # [W,P] explicit connection densities


# ---------------------------------------------------------------------------
# Primary-variable helpers
# ---------------------------------------------------------------------------

def _volume_fractions(f_w, f_g):
    """Scaled volume fractions [3]: (F_w, F_o, F_g) with F_o = 1-F_w-F_g
    (reference: StandardWellEval.cpp:128 wellVolumeFraction)."""
    return jnp.stack([f_w, 1.0 - f_w - f_g, f_g])


def _surface_fractions(f_w, f_g):
    """Surface volume fractions cmix_s [3]
    (reference: StandardWellEval.cpp:233 wellSurfaceVolumeFraction)."""
    f_scaled = _volume_fractions(f_w, f_g) / SCAL
    total = f_scaled[0] + f_scaled[1] + f_scaled[2]
    # the sum is positive for any physically meaningful fraction state;
    # guard the padded/degenerate case only
    safe = jnp.where(jnp.abs(total) > 1e-12, total, 1.0)
    return f_scaled / safe


def _get_qs(xw, is_injector, inj_phase):
    """Per-component surface rates Q [3] from the primary variables
    (reference: StandardWellEval.cpp:179 getQs)."""
    q_t, f_w, f_g = xw[0], xw[1], xw[2]
    q_prod = q_t * (_volume_fractions(f_w, f_g) / SCAL)
    q_inj = jnp.zeros(3).at[inj_phase].set(q_t)
    return jnp.where(is_injector, q_inj, q_prod)


def init_xw(fs: FluidSystem, u, flag, ws: WellSet, pbh=None,
            q_rates=None) -> jnp.ndarray:
    """Initialize ``xw`` from the reservoir state / previous rates
    (reference: StandardWellEval.cpp:248 updatePrimaryVariables).

    ``q_rates`` [W,3] are signed surface rates into cells (production
    negative); None seeds producers at equal fractions and a small rate
    from the schedule target, injectors at their target rate.
    """
    nw = ws.num_wells
    if pbh is None:
        p_perf0 = u[ws.cell[:, 0], 0]
        pbh = p_perf0 + jnp.where(ws.is_injector, +1e5, -1e5)

    if q_rates is None:
        # seed rates from the schedule targets where finite
        prod_target = jnp.select(
            [ws.ctrl_mode == CTRL_ORAT, ws.ctrl_mode == CTRL_WRAT,
             ws.ctrl_mode == CTRL_GRAT, ws.ctrl_mode == CTRL_LRAT],
            [ws.orat, ws.wrat, ws.grat, ws.lrat], default=1e-3)
        prod_target = jnp.where(
            jnp.isfinite(prod_target) & (prod_target > 0), prod_target, 1e-3)
        inj_target = jnp.where(jnp.isfinite(ws.inj_rate), ws.inj_rate, 1e-3)
        # producers: split the target evenly across phases (reference
        # seeds fractions at 1/np when the rate is zero)
        q_rates = jnp.where(
            ws.is_injector[:, None],
            jax.nn.one_hot(ws.inj_phase, 3) * inj_target[:, None],
            -jnp.ones((nw, 3)) * (prod_target[:, None] / 3.0))

    total_scaled = q_rates @ SCAL  # [W]
    safe_tot = jnp.where(jnp.abs(total_scaled) > 1e-12, total_scaled, 1.0)
    f_w = jnp.where(jnp.abs(total_scaled) > 1e-12,
                    SCAL[0] * q_rates[:, 0] / safe_tot,
                    jnp.where(ws.is_injector,
                              (ws.inj_phase == 0).astype(q_rates.dtype),
                              1.0 / 3.0))
    f_g = jnp.where(jnp.abs(total_scaled) > 1e-12,
                    SCAL[2] * q_rates[:, 2] / safe_tot,
                    jnp.where(ws.is_injector,
                              (ws.inj_phase == 2).astype(q_rates.dtype),
                              1.0 / 3.0))
    q_t = jnp.where(ws.is_injector,
                    q_rates[jnp.arange(nw), ws.inj_phase], total_scaled)
    return jnp.stack([q_t, f_w, f_g, pbh], axis=1)


def xw_surface_rates(xw, ws: WellSet) -> jnp.ndarray:
    """[W,3] signed surface rates into cells from the primary variables."""
    return jax.vmap(_get_qs)(xw, ws.is_injector, ws.inj_phase)


# ---------------------------------------------------------------------------
# Per-perforation inflow (reference: StandardWellEval.cpp:965 computePerfRate)
# ---------------------------------------------------------------------------

def _perf_cq(fs: FluidSystem, u_cell, flag_cell, xw, rho_conn, wi, dz,
             is_injector, inj_phase, allow_cf, regs=(0, 0), mob_mult=None,
             eps=None):
    """Surface component rates cq_s [3] INTO the cell at one perforation.

    Differentiable in (u_cell, xw). Single drawdown from the cell's oil
    pressure (reference getPerfCellPressure), branch on its sign:
    producing perfs use per-phase cell mobilities + Rs/Rv transfer;
    injecting perfs push the wellbore surface mixture cmix_s through the
    total mobility with the volume-ratio conversion.
    """
    q = intensive(fs, u_cell, flag_cell, regs, mob_mult, eps)
    bhp = xw[3]
    p_conn = bhp + rho_conn * U.GRAVITY * dz
    drawdown = q.p[1] - p_conn  # > 0 -> producing perforation

    # --- producing branch ---
    cq_p = -wi * q.mob * q.inv_b * drawdown  # [3] (negative production)
    cq_prod = jnp.stack([cq_p[0],
                         cq_p[1] + q.rv * cq_p[2],
                         cq_p[2] + q.rs * cq_p[1]])

    # --- injecting branch (wellbore mixture, volume-ratio conversion) ---
    total_mob = q.mob[0] + q.mob[1] + q.mob[2]
    cqt_i = -wi * total_mob * drawdown  # > 0 when injecting
    cmix = _surface_fractions(xw[1], xw[2])  # [3]
    d = 1.0 - q.rv * q.rs
    d = jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    tmp_o = (cmix[1] - q.rv * cmix[2]) / d
    tmp_g = (cmix[2] - q.rs * cmix[1]) / d
    vol_ratio = (cmix[0] / q.inv_b[0] + tmp_o / q.inv_b[1]
                 + tmp_g / q.inv_b[2])
    vol_ratio = jnp.where(jnp.abs(vol_ratio) > 1e-12, vol_ratio, 1e-12)
    cq_inj = cmix * (cqt_i / vol_ratio)

    producing = drawdown > 0
    cq = jnp.where(producing, cq_prod, cq_inj)

    # crossflow gating (reference: "Do nothing if crossflow is not
    # allowed"): a producing perf on an injector (or vice versa) is
    # zeroed when WELSPECS disallows crossflow
    crossflow = jnp.where(producing, is_injector, ~is_injector)
    return jnp.where(crossflow & ~allow_cf, jnp.zeros(3), cq)


def _perf_cq_channels(ch, xw, rho_conn, wi, dz, is_injector, inj_phase,
                      allow_cf):
    """``_perf_cq`` from packed cell channels instead of a fresh
    ``intensive`` evaluation: ``ch`` [17] is one cell of the fused
    cellpack's plane layout (p[3], 1/B[3], mob[3], rho[3], rs, rv,
    acc[3] — ops/pallas_cellpack). Pure elementwise arithmetic, so the
    per-perf jacfwd over (ch, xw) stays tiny — no PVT/satfunc graphs
    re-traced per perforation (the same pathology that cost ~30ms for
    986 fault extras before add_extra_faces_packed)."""
    p_o = ch[1]
    inv_b = ch[3:6]
    mob = ch[6:9]
    rs, rv = ch[12], ch[13]
    bhp = xw[3]
    p_conn = bhp + rho_conn * U.GRAVITY * dz
    drawdown = p_o - p_conn  # > 0 -> producing perforation

    cq_p = -wi * mob * inv_b * drawdown
    cq_prod = jnp.stack([cq_p[0],
                         cq_p[1] + rv * cq_p[2],
                         cq_p[2] + rs * cq_p[1]])

    total_mob = mob[0] + mob[1] + mob[2]
    cqt_i = -wi * total_mob * drawdown
    cmix = _surface_fractions(xw[1], xw[2])
    d = 1.0 - rv * rs
    d = jnp.where(jnp.abs(d) > 1e-12, d, 1e-12)
    tmp_o = (cmix[1] - rv * cmix[2]) / d
    tmp_g = (cmix[2] - rs * cmix[1]) / d
    vol_ratio = (cmix[0] / inv_b[0] + tmp_o / inv_b[1]
                 + tmp_g / inv_b[2])
    vol_ratio = jnp.where(jnp.abs(vol_ratio) > 1e-12, vol_ratio, 1e-12)
    cq_inj = cmix * (cqt_i / vol_ratio)

    producing = drawdown > 0
    cq = jnp.where(producing, cq_prod, cq_inj)
    crossflow = jnp.where(producing, is_injector, ~is_injector)
    return jnp.where(crossflow & ~allow_cf, jnp.zeros(3), cq)


def well4_contributions_packed(packed, xw, ws: WellSet, cell_full,
                               active_mode=None, vfp_bank=None,
                               rho_conn=None, f0=None,
                               dt=86400.0) -> Well4Result:
    """``well4_contributions`` fed by the fused assembly's packed planes.

    ``packed`` = (q5 [nz,17,ny,nx], dq5 [nz,17,3,ny,nx]) from
    ``assemble_structured(want_packed=True)``; ``cell_full`` [W,P] are
    the perforated cells' FULL-BOX flat indices (the embedded layouts'
    ``emb.act[ws.cell]``). The per-perf Jacobian in u comes from the
    chain rule d cq/du = (d cq/d ch) @ (d ch/du), with d cq/d ch a tiny
    elementwise jacfwd of ``_perf_cq_channels`` — value-identical (to
    f32 rounding) to the ``intensive``-based path, tested in
    tests/test_std4.py."""
    if active_mode is None:
        active_mode = ws.ctrl_mode
    q5, dq5 = packed
    nz, _, ny, nx = q5.shape
    k = cell_full // (ny * nx)
    rem = cell_full % (ny * nx)
    j = rem // nx
    i = rem % nx
    # the whole per-perf sweep runs in f32: the channels are f32-born,
    # and f64 here lowers to emulated bf16 triple-pass chains with
    # dynamic-slice scaffolding (traced at hundreds of op instances for
    # a handful of wells). The [W]-level well rows (_well_tail) stay
    # f64.
    f32 = jnp.float32
    CH = q5[k, :, j, i]                           # [W,P,17] f32
    dCH = dq5[k, :, :, j, i]                      # [W,P,17,3] f32
    xw32 = xw.astype(f32)

    if rho_conn is None:
        raise ValueError("well4_contributions_packed needs the explicit "
                         "per-substep rho_conn (calculateExplicitQuantities "
                         "analog)")
    allow_cf = getattr(ws, "allow_crossflow", None)
    if allow_cf is None:
        allow_cf = jnp.ones(ws.num_wells, bool)
    dz = ws.perf_depth - ws.ref_depth[:, None]

    def one_perf(ch, xw_w, rho, wi, dzc, inj, phase, acf, m):
        def f(args):
            cc, xx = args
            cq = _perf_cq_channels(cc, xx, rho, wi, dzc, inj, phase, acf)
            cq = jnp.where(m, cq, jnp.zeros(3))
            return cq, cq

        jacs, val = jax.jacfwd(f, has_aux=True)((ch, xw_w))
        return val, jacs[0], jacs[1]   # [3], [3,17], [3,4]

    val, dcq_dch, dq_dxw = jax.vmap(jax.vmap(
        one_perf, in_axes=(0, None, 0, 0, 0, None, None, None, 0)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0))(
        CH, xw32, rho_conn.astype(f32), ws.wi.astype(f32),
        dz.astype(f32), ws.is_injector, ws.inj_phase,
        allow_cf, ws.perf_mask)
    dq_du = esum("wpck,wpkd->wpcd", dcq_dch, dCH)  # [W,P,3,3]
    f64 = xw.dtype
    return _well_tail(xw, ws, active_mode, vfp_bank, f0, dt,
                      val.astype(f64), dq_du.astype(f64),
                      dq_dxw.astype(f64), rho_conn)


# ---------------------------------------------------------------------------
# Control equation (row 3)
# ---------------------------------------------------------------------------

def _control_eq(xw, mode, ws_row, is_injector, inj_phase, vfp_bank):
    """Mode-dependent control residual on primary-variable rates
    (reference: WellInterfaceEval.cpp:272/:386)."""
    (orat, wrat, grat, lrat, inj_rate, bhp_t, thp_t, vfp_i, resv, vcoef,
     alq) = ws_row
    bhp = xw[3]
    q = _get_qs(xw, is_injector, inj_phase)  # [3] signed (into cells)
    prod = -q  # positive production rates
    prod_bank, inj_bank = _split_banks(vfp_bank)

    r_prod = jnp.select(
        [mode == CTRL_ORAT, mode == CTRL_WRAT, mode == CTRL_GRAT,
         mode == CTRL_LRAT, mode == CTRL_RESV],
        [prod[1] - orat, prod[0] - wrat, prod[2] - grat,
         prod[0] + prod[1] - lrat, jnp.dot(vcoef, prod) - resv],
        default=bhp - bhp_t)
    if prod_bank is not None:
        from opm_autodiff_tpu.wells.vfp import bank_bhp

        bhp_vfp = bank_bhp(prod_bank, vfp_i, thp_t, prod, alq)
        r_prod = jnp.where(mode == CTRL_THP, bhp - bhp_vfp, r_prod)

    inj_surf = q[0] + q[1] + q[2]
    r_inj = jnp.select(
        [mode == CTRL_RATE, mode == CTRL_RESV],
        [inj_surf - inj_rate, jnp.dot(vcoef, q) - resv],
        default=bhp - bhp_t)
    if inj_bank is not None:
        from opm_autodiff_tpu.wells.vfp import bank_inj_bhp

        bhp_inj = bank_inj_bhp(inj_bank, vfp_i, thp_t, inj_surf)
        r_inj = jnp.where(mode == CTRL_THP, bhp - bhp_inj, r_inj)

    r = jnp.where(is_injector, r_inj,
                  jnp.where(mode == CTRL_BHP, bhp - bhp_t, r_prod))
    # STOP status: zero TOTAL surface rate — the WQTotal primary
    # variable is pinned to 0, the wellbore pressure equilibrates, and
    # perforation crossflow stays live (reference Well::Status::STOP;
    # WellInterface_impl.hpp stopppedOrZeroRateTarget)
    return jnp.where(mode == CTRL_STOP, xw[0], r)


# ---------------------------------------------------------------------------
# Assembly
# ---------------------------------------------------------------------------

def _perf_sweep(fs: FluidSystem, u_perf, flag_perf, reg_perf, mob_perf,
                eps_perf, xw, ws: WellSet, rho_conn, mask, allow_cf):
    """Per-perforation rates + jacobians in (u_cell, xw): the
    embarrassingly-parallel half of the well assembly. ``mask`` [W,P]
    selects the perforations this caller is responsible for — the full
    perf_mask in the replicated path, the locally-owned subset in the
    owner-distributed path (parallel/shard_wells.py)."""
    eps_ax = None if eps_perf is None else 0
    dz = ws.perf_depth - ws.ref_depth[:, None]

    def one_perf(u_c, f_c, xw_w, rho, wi, dzc, inj, phase, acf, m, rg,
                 mm, ep):
        def f(args):
            uu, xx = args
            cq = _perf_cq(fs, uu, f_c, xx, rho, wi, dzc, inj, phase, acf,
                          rg, mm, ep)
            cq = jnp.where(m, cq, jnp.zeros(3))
            return cq, cq

        jacs, val = jax.jacfwd(f, has_aux=True)((u_c, xw_w))
        return val, jacs[0], jacs[1]

    return jax.vmap(jax.vmap(
        one_perf,
        in_axes=(0, 0, None, 0, 0, 0, None, None, None, 0, 0, 0, eps_ax)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, eps_ax))(
        u_perf, flag_perf, xw, rho_conn, ws.wi, dz,
        ws.is_injector, ws.inj_phase, allow_cf, mask, reg_perf,
        mob_perf, eps_perf)


def well4_contributions(fs: FluidSystem, u, flag, xw, ws: WellSet,
                        active_mode=None, vfp_bank=None, regs=None,
                        mob_mult=None, eps=None, rho_conn=None,
                        f0=None, dt=86400.0) -> Well4Result:
    """Assemble the 4-DOF well system for one Newton iteration.

    ``f0`` [W,3] are the timestep-start surface fractions for the
    wellbore-storage term (reference F0_, StandardWellEval.cpp:710);
    None disables storage.
    """
    if active_mode is None:
        active_mode = ws.ctrl_mode
    u_perf = u[ws.cell]          # [W,P,3]
    flag_perf = flag[ws.cell]    # [W,P]
    reg_perf = (regs[ws.cell] if regs is not None
                else jnp.zeros(ws.cell.shape + (2,), jnp.int32))
    mob_perf = (mob_mult[ws.cell] if mob_mult is not None
                else jnp.ones(ws.cell.shape + (5,)))
    eps_perf = eps[ws.cell] if eps is not None else None

    if rho_conn is None:
        from opm_autodiff_tpu.wells.standard import connection_densities

        rho_conn = connection_densities(fs, u, flag, xw[:, 3], ws, regs)

    allow_cf = getattr(ws, "allow_crossflow", None)
    if allow_cf is None:
        allow_cf = jnp.ones(ws.num_wells, bool)

    q_perf, dq_du, dq_dxw = _perf_sweep(
        fs, u_perf, flag_perf, reg_perf, mob_perf, eps_perf, xw, ws,
        rho_conn, ws.perf_mask, allow_cf)
    return _well_tail(xw, ws, active_mode, vfp_bank, f0, dt,
                      q_perf, dq_du, dq_dxw, rho_conn)


def _well_tail(xw, ws: WellSet, active_mode, vfp_bank, f0, dt,
               q_perf, dq_du, dq_dxw, rho_conn) -> Well4Result:
    """Well-level rows + Schur pieces from the per-perf sweep results.
    [W]-sized math only — in the distributed path this runs replicated
    on every device (the reference's analog: each rank owning part of a
    well holds the full well equations after CommunicateAboveBelow,
    ParallelWellInfo.hpp:40)."""
    efac = ws.efac  # [W]
    q_perf = q_perf * efac[:, None, None]
    dq_du = dq_du * efac[:, None, None, None]
    dq_dxw = dq_dxw * efac[:, None, None, None]

    # --- well-level residual rows (conservation + control) ---
    sum_q = q_perf.sum(axis=1)          # [W,3] (efac included)
    sum_dq_dxw = dq_dxw.sum(axis=1)     # [W,3,4]

    if f0 is None:
        f0 = jax.vmap(_surface_fractions)(
            jax.lax.stop_gradient(xw[:, 1]), jax.lax.stop_gradient(xw[:, 2]))

    def rest_fn(xw_w, mode, is_inj, phase, ef, f0_w, orat, wrat, grat,
                lrat, inj_rate, bhp_t, thp_t, vfp_i, resv, vcoef, alq):
        """The xw-only part of res: -efac*Q + storage, and the control
        equation. [4]"""
        q_w = _get_qs(xw_w, is_inj, phase)
        cmix = _surface_fractions(xw_w[1], xw_w[2])
        storage = (WELLBORE_VOLUME / dt) * (cmix - f0_w)
        rows = -ef * q_w + storage
        ctrl = _control_eq(xw_w, mode,
                           (orat, wrat, grat, lrat, inj_rate, bhp_t, thp_t,
                            vfp_i, resv, vcoef, alq),
                           is_inj, phase, vfp_bank)
        return jnp.concatenate([rows, ctrl[None]])

    rest_args = (xw, active_mode, ws.is_injector, ws.inj_phase, efac, f0,
                 ws.orat, ws.wrat, ws.grat, ws.lrat, ws.inj_rate,
                 ws.bhp_target, ws.thp_target, ws.vfp_idx, ws.resv_rate,
                 ws.voidage_coeff, ws.alq)
    rest = jax.vmap(rest_fn)(*rest_args)                       # [W,4]
    drest_dxw = jax.vmap(jax.jacfwd(rest_fn, argnums=0))(*rest_args)

    res_well = rest.at[:, :3].add(sum_q)                       # [W,4]
    d_blk = drest_dxw.at[:, :3, :].add(sum_dq_dxw)             # [W,4,4]

    # B rows 0..2 = d res / d u_cell(perf); control row has no direct
    # cell dependence (rates in the control eq come from xw)
    b_blk = jnp.concatenate(
        [dq_du, jnp.zeros_like(dq_du[:, :, :1, :])], axis=2)   # [W,P,4,3]

    # --- singular / closed-well handling: pin the well system ---
    _, det = invert44(d_blk)
    bad = (~jnp.isfinite(det)) | (jnp.abs(det) < 1e-300) | ~ws.open_mask
    eye = jnp.broadcast_to(jnp.eye(4), d_blk.shape)
    d_blk = jnp.where(bad[:, None, None], eye, d_blk)
    res_pin = jnp.concatenate(
        [xw[:, :1], xw[:, 1:2], xw[:, 2:3],
         (xw[:, 3] - ws.bhp_target)[:, None]], axis=1)
    res_well = jnp.where(bad[:, None], res_pin, res_well)
    b_blk = jnp.where(bad[:, None, None, None], 0.0, b_blk)
    zero_q = bad | ~ws.open_mask
    q_perf = jnp.where(zero_q[:, None, None], 0.0, q_perf)
    dq_du = jnp.where(zero_q[:, None, None, None], 0.0, dq_du)
    dq_dxw = jnp.where(zero_q[:, None, None, None], 0.0, dq_dxw)

    d_inv, _ = invert44(d_blk)
    return Well4Result(q_perf=q_perf, dq_du=dq_du, dq_dxw=dq_dxw,
                       res_well=res_well, b_blk=b_blk, d_inv=d_inv,
                       rho_conn=rho_conn)


# ---------------------------------------------------------------------------
# Coupling into the reservoir system (same contract as wells/standard.py)
# ---------------------------------------------------------------------------

def apply_to_residual(residual, wr: Well4Result, ws: WellSet):
    """R_c -= q at perforated cells (in the system's storage dtype —
    scatters into f32-stored banded systems stay off TPU's f64 path)."""
    flat_cells = ws.cell.reshape(-1)
    upd = (-wr.q_perf.reshape(-1, 3)).astype(residual.dtype)
    return residual.at[flat_cells].add(upd)


def apply_to_diag(diag, wr: Well4Result, ws: WellSet):
    """A_cc -= dq/du at perforated cells."""
    flat_cells = ws.cell.reshape(-1)
    upd = (-wr.dq_du.reshape(-1, 3, 3)).astype(diag.dtype)
    return diag.at[flat_cells].add(upd)


def schur_matvec(wr: Well4Result, ws: WellSet, x):
    """y = -C D^-1 B x on cell vectors.

    C[w,p,:,:] = dR_c/dxw = -dq_dxw [3,4]; B[w,p,:,:] [4,3].
    (Reference: StandardWell_impl.hpp:1273 apply: Ax -= C^T D^-1 B x.)

    Computes in ``x.dtype``: inside the f32 Krylov loop the whole apply
    stays f32 (the factor casts are tiny [W,P,4,3] arrays; the full-
    length gather/scatter and the zeros vector are the real cost).
    """
    dt = x.dtype
    x_perf = x[ws.cell]                                     # [W,P,3]
    bx = esum("wpej,wpj->we", wr.b_blk.astype(dt), x_perf)  # [W,4]
    coef = esum("wef,wf->we", wr.d_inv.astype(dt), bx)  # D^-1 Bx
    contrib = esum("wpce,we->wpc", -wr.dq_dxw.astype(dt), coef)
    y = jnp.zeros_like(x)
    return y.at[ws.cell.reshape(-1)].add(-contrib.reshape(-1, 3))


def schur_rhs(residual, wr: Well4Result, ws: WellSet):
    """Correction C D^-1 r_w to ADD to the rhs (b = -R + corr).

    (Reference: BlackoilWellModel_impl.hpp:148 linearize — the well
    residual elimination r -= C^T D^-1 resWell.)
    """
    coef = esum("wef,wf->we", wr.d_inv, wr.res_well)  # [W,4]
    contrib = esum("wpce,we->wpc", -wr.dq_dxw, coef)
    corr = jnp.zeros_like(residual)
    return corr.at[ws.cell.reshape(-1)].add(
        contrib.reshape(-1, 3).astype(residual.dtype))


def recover_xw_update(wr: Well4Result, ws: WellSet, dx):
    """dxw = -D^-1 (res_well + B dx)
    (reference: StandardWell_impl.hpp:1308 recoverSolutionWell)."""
    dx_perf = dx[ws.cell]
    bdx = esum("wpej,wpj->we", wr.b_blk, dx_perf)
    return -esum("wef,wf->we", wr.d_inv, wr.res_well + bdx)


# ---------------------------------------------------------------------------
# Chopped update (reference: StandardWellEval.cpp:717
# updatePrimaryVariablesNewton + :450 processFractions)
# ---------------------------------------------------------------------------

def chop_xw_update(xw, dxw, ws: WellSet, df_limit=0.2, dbhp_limit=1.0):
    """Apply the Newton update with the reference's chops; NOTE the
    reference convention is ``new = old - dwells`` — this function takes
    ``dxw`` in the package's ``new = old + dxw`` convention."""
    q_t, f_w, f_g, bhp = xw[:, 0], xw[:, 1], xw[:, 2], xw[:, 3]
    dq, dfw, dfg, dbhp = dxw[:, 0], dxw[:, 1], dxw[:, 2], dxw[:, 3]

    def relax_frac(old, d):
        # relaxationFactorFraction: keep old+d within [0,1] (x0.95)
        new = old + d
        r = jnp.where(new < 0.0, jnp.abs(old / jnp.where(d == 0, 1.0, d)),
                      jnp.where(new > 1.0,
                                jnp.abs((1.0 - old)
                                        / jnp.where(d == 0, 1.0, d)),
                                1.0))
        return jnp.clip(r * 0.95 + (r == 1.0) * 0.05, 0.0, 1.0)

    r_w = relax_frac(f_w, dfw)
    r_g = relax_frac(f_g, dfg)
    r_frac = jnp.minimum(r_w, r_g)
    # keep f_w + f_g <= 1 so the oil fraction stays non-negative
    sum_new = f_w + f_g + r_frac * (dfw + dfg)
    upd = r_frac * (dfw + dfg)
    r_sum = jnp.where(sum_new > 1.0,
                      jnp.abs((1.0 - f_w - f_g)
                              / jnp.where(upd == 0, 1.0, upd)) * 0.95,
                      1.0)
    r_frac = r_frac * jnp.clip(r_sum, 0.0, 1.0)
    # injectors skip the fraction relaxation (reference :725)
    r_frac = jnp.where(ws.is_injector, 1.0, r_frac)

    df_w = jnp.clip(r_frac * dfw, -df_limit, df_limit)
    df_g = jnp.clip(r_frac * dfg, -df_limit, df_limit)
    f_w_new = f_w + df_w
    f_g_new = f_g + df_g

    # processFractions: clamp negatives, renormalize the others
    f_o = 1.0 - f_w_new - f_g_new
    # water < 0
    neg_w = f_w_new < 0.0
    scale_w = 1.0 - jnp.where(neg_w, f_w_new, 0.0)
    f_g_new = jnp.where(neg_w, f_g_new / scale_w, f_g_new)
    f_o = jnp.where(neg_w, f_o / scale_w, f_o)
    f_w_new = jnp.where(neg_w, 0.0, f_w_new)
    # gas < 0
    neg_g = f_g_new < 0.0
    scale_g = 1.0 - jnp.where(neg_g, f_g_new, 0.0)
    f_w_new = jnp.where(neg_g, f_w_new / scale_g, f_w_new)
    f_o = jnp.where(neg_g, f_o / scale_g, f_o)
    f_g_new = jnp.where(neg_g, 0.0, f_g_new)
    # oil < 0
    neg_o = f_o < 0.0
    scale_o = 1.0 - jnp.where(neg_o, f_o, 0.0)
    f_w_new = jnp.where(neg_o, f_w_new / scale_o, f_w_new)
    f_g_new = jnp.where(neg_o, f_g_new / scale_o, f_g_new)

    # total rate: relax only on sign change (relaxationFactorRate)
    new_q = q_t + dq
    sign_change = q_t * new_q < 0.0
    r_rate = jnp.where(sign_change,
                       jnp.abs(q_t / jnp.where(dq == 0, 1.0, dq)) * 0.8,
                       1.0)
    q_t_new = q_t + r_rate * dq

    # bhp: |d| <= dbhp_limit * |old|, floor at 1 bar
    dbhp_lim = jnp.abs(bhp) * dbhp_limit
    dbhp_c = jnp.clip(dbhp, -dbhp_lim, dbhp_lim)
    bhp_new = jnp.maximum(bhp + dbhp_c, 1e5)

    return jnp.stack([q_t_new, f_w_new, f_g_new, bhp_new], axis=1)


# ---------------------------------------------------------------------------
# Inner well solve (reference: StandardWell_impl.hpp solveWellEqUntilConverged
# via prepareTimeStep; MaxWelleqIter=30, BlackoilModelParametersEbos.hpp:204)
# ---------------------------------------------------------------------------

def solve_well_eq(fs: FluidSystem, u, flag, xw, ws: WellSet,
                  active_mode=None, vfp_bank=None, regs=None, mob_mult=None,
                  eps=None, rho_conn=None, dt=86400.0, max_iter=30,
                  tol=1e-10):
    """Solve the well equations with the reservoir state frozen.

    Batched Newton on the [W,4] systems: dxw = -D^-1 res, chopped. Runs
    as a lax.while_loop; exits when every well's scaled residual is
    below tol or max_iter is reached.
    """
    if active_mode is None:
        active_mode = ws.ctrl_mode

    def resid_scale(res, xw_c):
        rate_mag = jnp.maximum(jnp.abs(xw_c[:, 0]), 1e-6)
        s = jnp.concatenate([
            jnp.broadcast_to(rate_mag[:, None], res[:, :3].shape),
            jnp.maximum(jnp.abs(ws.bhp_target), 1e5)[:, None]], axis=1)
        return jnp.abs(res) / s

    def body(carry):
        xw_c, it, _err = carry
        wr = well4_contributions(fs, u, flag, xw_c, ws, active_mode,
                                 vfp_bank, regs, mob_mult, eps, rho_conn,
                                 None, dt)
        dxw = -esum("wef,wf->we", wr.d_inv, wr.res_well)
        dxw = jnp.where(jnp.isfinite(dxw), dxw, 0.0)
        xw_n = chop_xw_update(xw_c, dxw, ws)
        err = jnp.where(ws.open_mask[:, None],
                        resid_scale(wr.res_well, xw_c), 0.0).max()
        return xw_n, it + 1, err

    def cond(carry):
        _xw, it, err = carry
        return (it < max_iter) & (err > tol)

    xw_out, _it, _err = jax.lax.while_loop(
        cond, body, (xw, jnp.asarray(0), jnp.asarray(jnp.inf)))
    return jnp.where(jnp.isfinite(xw_out), xw_out, xw)


def well_convergence(wr: Well4Result, ws: WellSet, active_mode, b_avg=None):
    """Per-well scaled residual [W] (reference: StandardWellEval.cpp:767
    getWellConvergence — flux rows scaled by field-average B factors,
    control row by its target magnitude). Callers reduce with .max();
    the per-well vector also feeds the timestepper's problematic-well
    shut fallback (AdaptiveTimeSteppingEbos.hpp:549-586)."""
    if b_avg is None:
        b_avg = jnp.ones(3)
    flux_err = jnp.abs(wr.res_well[:, :3]) * b_avg[None, :]
    rate_scale = jnp.where(
        ws.is_injector,
        jnp.where(jnp.isfinite(ws.inj_rate), ws.inj_rate, 1.0),
        jnp.select([ws.ctrl_mode == CTRL_ORAT, ws.ctrl_mode == CTRL_WRAT,
                    ws.ctrl_mode == CTRL_GRAT, ws.ctrl_mode == CTRL_LRAT,
                    ws.ctrl_mode == CTRL_RESV],
                   [ws.orat, ws.wrat, ws.grat, ws.lrat, ws.resv_rate],
                   default=1.0))
    rate_scale = jnp.where(jnp.isfinite(rate_scale) & (rate_scale > 0),
                           rate_scale, 1.0)
    is_p = (active_mode == CTRL_BHP) | (active_mode == CTRL_THP)
    ctrl_scale = jnp.where(is_p, jnp.maximum(jnp.abs(ws.bhp_target), 1e5),
                           rate_scale)
    ctrl_err = jnp.abs(wr.res_well[:, 3]) / ctrl_scale
    err = jnp.maximum(flux_err.max(axis=1), ctrl_err)
    return jnp.where(ws.open_mask, err, 0.0)
