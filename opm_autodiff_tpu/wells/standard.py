"""Batched Peaceman wells with a single BHP unknown per well.

Round-1 well model: the reference ships this exact model as its research
well (ebos/eclpeacemanwell.hh:77 ``EclPeacemanWell`` — bottom-hole
pressure as the only well DOF, Peaceman inflow per perforation) alongside
the 4-DOF StandardWell (opm/simulators/wells/StandardWell.hpp:126); the
rebuild starts from the 1-DOF model and adds the rate/fraction DOFs in a
later stage (SURVEY.md §7 stage 8).

TPU design: all wells batched into padded [W, P] arrays; per-perforation
AD via vmapped jacfwd; the well system's B/C/D blocks (reference:
StandardWellGeneric.hpp:56 duneB_/duneC_/invDuneD_) are dense tiny arrays,
and the Schur complement y -= C D^-1 B x fuses into the Krylov operator
(reference: WellOperators.hpp:99).

Sign convention: q > 0 means surface volume flowing INTO the cell
(injection); the cell residual is R_c = acc + div - q.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid.geometry import Geometry, peaceman_well_index
from opm_autodiff_tpu.models.blackoil import intensive
from opm_autodiff_tpu.props.fluid import FluidSystem
from opm_autodiff_tpu.utils.tinydot import esum

# control modes (per well, int)
(CTRL_BHP, CTRL_ORAT, CTRL_WRAT, CTRL_GRAT, CTRL_LRAT, CTRL_RATE,
 CTRL_THP, CTRL_RESV) = range(8)
# STOP status (reference Well::Status::STOP, test_stoppedwells.cpp:54):
# no SURFACE flow (the 4-DOF control equation pins WQTotal = 0) but the
# wellbore stays live, so perforation crossflow can redistribute fluid
# between layers — distinct from SHUT (open_mask False, no flow at
# all). The 1-DOF research well has no total-rate unknown and treats
# STOP as closed.
CTRL_STOP = 8

_PHASE_IDX = {"WATER": 0, "WAT": 0, "OIL": 1, "GAS": 2}
_MODE_IDX = {"BHP": CTRL_BHP, "ORAT": CTRL_ORAT, "WRAT": CTRL_WRAT,
             "GRAT": CTRL_GRAT, "LRAT": CTRL_LRAT, "RATE": CTRL_RATE,
             "RESV": CTRL_RESV, "THP": CTRL_THP}


class WellSet(NamedTuple):
    """Padded static + control data for all wells (device pytree)."""

    cell: jnp.ndarray        # [W,P] int32 perf cell (0 where padded)
    wi: jnp.ndarray          # [W,P] connection trans factor (0 padded)
    perf_depth: jnp.ndarray  # [W,P]
    perf_mask: jnp.ndarray   # [W,P] bool
    ref_depth: jnp.ndarray   # [W]
    is_injector: jnp.ndarray  # [W] bool
    inj_phase: jnp.ndarray   # [W] int32 (phase index)
    ctrl_mode: jnp.ndarray   # [W] int32
    # targets (SI rates; inf where absent)
    orat: jnp.ndarray        # [W] oil rate target (producer, positive)
    wrat: jnp.ndarray
    grat: jnp.ndarray
    lrat: jnp.ndarray
    inj_rate: jnp.ndarray    # [W]
    bhp_target: jnp.ndarray  # [W] bhp when on BHP control (= the limit)
    bhp_limit: jnp.ndarray   # [W] min (producer) / max (injector)
    open_mask: jnp.ndarray   # [W] bool
    thp_target: jnp.ndarray  # [W] THP target (0 if none)
    vfp_idx: jnp.ndarray     # [W] index into the VFP bank (-1 = none)
    # RESV controls (reference: RateConverter.hpp:406 voidage coefficients)
    resv_rate: jnp.ndarray       # [W] reservoir-volume rate target
    voidage_coeff: jnp.ndarray   # [W,3] surface-rate -> res-volume coeffs
    # gas lift: per-well ALQ fed to the VFP 5th axis (deck units;
    # reference: GasLiftSingleWellGeneric/ALQState)
    alq: jnp.ndarray             # [W]
    # WEFAC/GEFAC efficiency factor: scales reported/group/cumulative
    # rates (downtime fraction), not the instantaneous physics
    efac: jnp.ndarray            # [W]

    @property
    def num_wells(self) -> int:
        return self.cell.shape[0]

    @property
    def max_perfs(self) -> int:
        return self.cell.shape[1]


class WellResult(NamedTuple):
    """Everything the Newton iteration needs from the well model."""

    q_perf: jnp.ndarray     # [W,P,3] surface rates into cells
    dq_du: jnp.ndarray      # [W,P,3,3] d q / d u_cell
    dq_dpbh: jnp.ndarray    # [W,P,3]
    res_well: jnp.ndarray   # [W] well (control) equation residual
    b_blk: jnp.ndarray      # [W,P,3]  d res_well / d u_cell(perf)
    d_diag: jnp.ndarray     # [W]      d res_well / d pbh
    rho_conn: jnp.ndarray   # [W,P] connection mixture density used


def build_wellset(geo: Geometry, wells: list, max_perfs: int | None = None,
                  vfp_numbering: dict | None = None,
                  vfp_inj_numbering: dict | None = None) -> WellSet:
    """Host-side construction from schedule WellConfig list (padded)."""
    nw = max(len(wells), 1)
    np_max = max_perfs or max((len(w.completions) for w in wells), default=1)
    np_max = max(np_max, 1)

    cell = np.zeros((nw, np_max), np.int32)
    wi = np.zeros((nw, np_max))
    pdepth = np.zeros((nw, np_max))
    pmask = np.zeros((nw, np_max), bool)
    ref_depth = np.zeros(nw)
    is_inj = np.zeros(nw, bool)
    inj_phase = np.zeros(nw, np.int32)
    mode = np.zeros(nw, np.int32)
    inf = np.inf
    orat = np.full(nw, inf)
    wrat = np.full(nw, inf)
    grat = np.full(nw, inf)
    lrat = np.full(nw, inf)
    inj_rate = np.full(nw, inf)
    bhp_t = np.zeros(nw)
    bhp_l = np.zeros(nw)
    open_m = np.zeros(nw, bool)
    thp_t = np.zeros(nw)
    vfp_i = np.full(nw, -1, np.int32)
    resv = np.full(nw, inf)
    # lagged voidage coefficients; the simulator refreshes these per
    # substep from FIPNUM-region average PVT (wells/rate_converter.py)
    voidage = np.ones((nw, 3))
    alq = np.zeros(nw)
    efac = np.ones(nw)

    for iw, w in enumerate(wells):
        comps = [c for c in w.completions if c.open]
        for ip, c in enumerate(comps[:np_max]):
            ci = geo.act_index(c.i, c.j, c.k)
            if ci < 0:
                continue
            cell[iw, ip] = ci
            wi[iw, ip] = (c.cf if c.cf is not None
                          else peaceman_well_index(
                              geo, ci, c.diameter, c.skin, c.direction,
                              c.kh)) * getattr(c, "pi_mult", 1.0)
            pdepth[iw, ip] = geo.depth[ci]
            pmask[iw, ip] = True
        efac[iw] = getattr(w, "efac", 1.0)
        ref_depth[iw] = (w.ref_depth if w.ref_depth is not None
                         else (pdepth[iw, pmask[iw]].min()
                               if pmask[iw].any() else 0.0))
        is_inj[iw] = w.is_injector
        stopped = (w.status == "STOP") and pmask[iw].any()
        open_m[iw] = (w.status == "OPEN" and pmask[iw].any()) or stopped
        if w.is_injector:
            inj_phase[iw] = _PHASE_IDX.get(w.inj_phase or "GAS", 2)
            # unknown modes (e.g. GRUP before the group manager assigns a
            # share) fall back to BHP, never to RATE with an inf target
            mode[iw] = _MODE_IDX.get(w.control_mode, CTRL_BHP)
            if w.inj_rate is not None:
                inj_rate[iw] = w.inj_rate
            bhp_l[iw] = w.bhp_limit if w.bhp_limit is not None else 6.9e8
        else:
            mode[iw] = _MODE_IDX.get(w.control_mode, CTRL_BHP)
            if w.oil_rate is not None:
                orat[iw] = w.oil_rate
            if w.water_rate is not None:
                wrat[iw] = w.water_rate
            if w.gas_rate is not None:
                grat[iw] = w.gas_rate
            if w.liquid_rate is not None:
                lrat[iw] = w.liquid_rate
            bhp_l[iw] = w.bhp_limit if w.bhp_limit is not None else U.ATM
        bhp_t[iw] = bhp_l[iw]
        if stopped:
            mode[iw] = CTRL_STOP
        if getattr(w, "resv_rate", None) is not None:
            resv[iw] = w.resv_rate
        if getattr(w, "thp_limit", None):
            thp_t[iw] = w.thp_limit
        if getattr(w, "vfp_table", None) is not None:
            numbering = (vfp_inj_numbering if w.is_injector
                         else vfp_numbering) or {}
            vfp_i[iw] = numbering.get(w.vfp_table, -1)

    return WellSet(
        cell=jnp.asarray(cell), wi=jnp.asarray(wi),
        perf_depth=jnp.asarray(pdepth), perf_mask=jnp.asarray(pmask),
        ref_depth=jnp.asarray(ref_depth), is_injector=jnp.asarray(is_inj),
        inj_phase=jnp.asarray(inj_phase), ctrl_mode=jnp.asarray(mode),
        orat=jnp.asarray(orat), wrat=jnp.asarray(wrat),
        grat=jnp.asarray(grat), lrat=jnp.asarray(lrat),
        inj_rate=jnp.asarray(inj_rate), bhp_target=jnp.asarray(bhp_t),
        bhp_limit=jnp.asarray(bhp_l), open_mask=jnp.asarray(open_m),
        thp_target=jnp.asarray(thp_t), vfp_idx=jnp.asarray(vfp_i),
        resv_rate=jnp.asarray(resv), voidage_coeff=jnp.asarray(voidage),
        alq=jnp.asarray(alq), efac=jnp.asarray(efac),
    )


def _split_banks(vfp_bank):
    """vfp_bank may be a production VfpBank or a plain (prod, inj) tuple
    (VfpBank itself is a NamedTuple, so test for the _fields attr)."""
    if isinstance(vfp_bank, tuple) and not hasattr(vfp_bank, "_fields"):
        return vfp_bank
    return vfp_bank, None


# ---------------------------------------------------------------------------
# Per-perforation inflow (scalar; vmapped over perfs and wells)
# ---------------------------------------------------------------------------

def _perf_rates(fs: FluidSystem, u_cell, flag_cell, pbh, rho_conn, wi,
                dz, is_injector, inj_phase, regs=(0, 0), mob_mult=None,
                eps=None):
    """Surface-volume rates [3] INTO the cell at one perforation.

    Reference semantics: StandardWell_impl.hpp:297 calculateSinglePerf —
    producing perfs use cell mobilities per phase; injecting perfs use the
    cell's total mobility on the injected surface stream; hydrostatic
    connection pressure correction from an explicitly-computed (lagged)
    connection density.
    """
    q = intensive(fs, u_cell, flag_cell, regs, mob_mult, eps)
    p_conn = pbh + rho_conn * U.GRAVITY * dz

    # one drawdown per phase using phase pressures in the cell
    dp = p_conn - q.p  # [3]; > 0 -> injection into cell

    # producing part (dp < 0): per-phase Darcy with cell mobility
    base = wi * q.mob * q.inv_b * dp  # [3] (negative when producing)
    # dissolved gas produced with oil; vaporized oil with gas (VAPOIL)
    q_prod = jnp.stack([base[0],
                        base[1] + q.rv * base[2],
                        base[2] + q.rs * base[1]])

    # injecting part (dp > 0): total mobility, injected phase only
    total_mob = q.mob[0] + q.mob[1] + q.mob[2]
    inj_inv_b = q.inv_b[inj_phase]
    q_inj_scalar = wi * total_mob * inj_inv_b * dp[inj_phase]
    q_inj = jnp.zeros(3).at[inj_phase].set(q_inj_scalar)

    # Producers: always the per-phase formula (its per-phase signs handle
    # injection crossflow automatically). Injectors: the injection formula
    # holds for either drawdown sign — a momentary reversal "un-injects"
    # the injected phase. A hard shut-off (where(dp>0, q, 0)) would zero
    # dq/dpbh on the shut side and make the well's D block singular,
    # killing the Schur complement; the reference instead models real
    # crossflow (StandardWell_impl.hpp calculateSinglePerf), which the
    # 4-DOF well model will bring in a later stage.
    return jnp.where(is_injector, q_inj, q_prod)


def _connection_density(fs: FluidSystem, u_cell, flag_cell, pbh,
                        is_injector, inj_phase, regs=(0, 0)):
    """Explicit (lagged, non-differentiated) connection mixture density.

    Reference: StandardWell computeConnectionDensities — explicit update
    per Newton iteration from the previous iteration's state.
    """
    q = intensive(fs, u_cell, flag_cell, regs)
    # producer: mobility-weighted cell fluid density; injector: phase density
    mob_sum = q.mob[0] + q.mob[1] + q.mob[2]
    w = q.mob / jnp.maximum(mob_sum, 1e-30)
    rho_mix = jnp.sum(w * q.rho)
    rho_inj = q.rho[inj_phase]
    return jnp.where(is_injector, rho_inj, rho_mix)


def well_rates_only(fs: FluidSystem, u, flag, pbh: jnp.ndarray,
                    ws: WellSet, regs=None, mob_mult=None,
                    eps=None) -> jnp.ndarray:
    """Total surface rates [W,3] without Jacobians (for control checks)."""
    u_perf = u[ws.cell]
    flag_perf = flag[ws.cell]
    reg_perf = (regs[ws.cell] if regs is not None
                else jnp.zeros(ws.cell.shape + (2,), jnp.int32))
    mob_perf = (mob_mult[ws.cell] if mob_mult is not None
                else jnp.ones(ws.cell.shape + (5,)))
    eps_perf = eps[ws.cell] if eps is not None else None
    eps_ax = None if eps is None else 0
    dz = ws.perf_depth - ws.ref_depth[:, None]
    rho_conn = jax.vmap(jax.vmap(
        _connection_density, in_axes=(None, 0, 0, None, None, None, 0)),
        in_axes=(None, 0, 0, 0, 0, 0, 0))(
        fs, u_perf, flag_perf, pbh, ws.is_injector, ws.inj_phase, reg_perf)

    def one(u_c, f_c, pb, rho, wi, dzc, inj, phase, mask, rg, mm, ep):
        q = _perf_rates(fs, u_c, f_c, pb, rho, wi, dzc, inj, phase, rg,
                        mm, ep)
        return jnp.where(mask, q, jnp.zeros(3))

    q = jax.vmap(jax.vmap(one,
                          in_axes=(0, 0, None, 0, 0, 0, None, None, 0, 0,
                                   0, eps_ax)),
                 in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, eps_ax))(
        u_perf, flag_perf, pbh, rho_conn, ws.wi, dz,
        ws.is_injector, ws.inj_phase, ws.perf_mask, reg_perf, mob_perf,
        eps_perf)
    live = ws.open_mask & (ws.ctrl_mode != CTRL_STOP)  # 1-DOF: STOP=closed
    q = jnp.where(live[:, None, None], q, 0.0)
    return q.sum(axis=1)


class WellPerf(NamedTuple):
    """Mode-independent perforation quantities (first assembly stage)."""

    q_perf: jnp.ndarray    # [W,P,3] rates into cells
    dq_du: jnp.ndarray     # [W,P,3,3]
    dq_dpbh: jnp.ndarray   # [W,P,3]
    rho_conn: jnp.ndarray  # [W,P]


def connection_densities(fs: FluidSystem, u, flag, pbh, ws: WellSet,
                         regs=None) -> jnp.ndarray:
    """Explicit (lagged) connection mixture densities [W,P].

    The reference computes these once per timestep in
    calculateExplicitQuantities (BlackoilWellModel_impl.hpp:824); the
    Newton loop passes the result into every iteration's assembly."""
    u_perf = u[ws.cell]
    flag_perf = flag[ws.cell]
    reg_perf = (regs[ws.cell] if regs is not None
                else jnp.zeros(ws.cell.shape + (2,), jnp.int32))
    return jax.vmap(jax.vmap(
        _connection_density, in_axes=(None, 0, 0, None, None, None, 0)),
        in_axes=(None, 0, 0, 0, 0, 0, 0))(
        fs, jax.lax.stop_gradient(u_perf), flag_perf,
        jax.lax.stop_gradient(pbh), ws.is_injector, ws.inj_phase, reg_perf)


def _perf_rates_channels(ch, pbh, rho_conn, wi, dz, is_injector,
                         inj_phase):
    """``_perf_rates`` from packed cellpack channels (p[3], 1/B[3],
    mob[3], rho[3], rs, rv, acc[3]) instead of a fresh ``intensive``
    evaluation — same trick as standard4._perf_cq_channels."""
    p = ch[0:3]
    inv_b = ch[3:6]
    mob = ch[6:9]
    rs, rv = ch[12], ch[13]
    p_conn = pbh + rho_conn * U.GRAVITY * dz
    dp = p_conn - p  # [3]; > 0 -> injection into cell

    base = wi * mob * inv_b * dp
    q_prod = jnp.stack([base[0],
                        base[1] + rv * base[2],
                        base[2] + rs * base[1]])
    total_mob = mob[0] + mob[1] + mob[2]
    inj_inv_b = inv_b[inj_phase]
    q_inj_scalar = wi * total_mob * inj_inv_b * dp[inj_phase]
    q_inj = jnp.zeros(3).at[inj_phase].set(q_inj_scalar)
    return jnp.where(is_injector, q_inj, q_prod)


def well_perf_contributions_packed(packed, pbh, ws: WellSet, cell_full,
                                   rho_conn) -> WellPerf:
    """``well_perf_contributions`` fed by the fused assembly's packed
    planes (see standard4.well4_contributions_packed for the layout and
    the chain-rule scheme; equality-tested in tests/test_wells.py)."""
    q5, dq5 = packed
    nz, _, ny, nx = q5.shape
    k = cell_full // (ny * nx)
    rem = cell_full % (ny * nx)
    j = rem // nx
    i = rem % nx
    # f32 sweep: see standard4.well4_contributions_packed — f64 math at
    # these tiny shapes lowers to emulated bf16 chains with hundreds of
    # op instances
    f32 = jnp.float32
    CH = q5[k, :, j, i]                            # [W,P,17] f32
    dCH = dq5[k, :, :, j, i]                       # [W,P,17,3] f32
    pbh32 = pbh.astype(f32)
    dz = (ws.perf_depth - ws.ref_depth[:, None]).astype(f32)

    def one_perf(ch, pb, rho, wi, dzc, inj, phase, m):
        def f(args):
            cc, pp = args
            qv = _perf_rates_channels(cc, pp, rho, wi, dzc, inj, phase)
            qv = jnp.where(m, qv, jnp.zeros(3))
            return qv, qv

        jacs, val = jax.jacfwd(f, has_aux=True)((ch, pb))
        return val, jacs[0], jacs[1]   # [3], [3,17], [3]

    val, dq_dch, dq_dpbh = jax.vmap(jax.vmap(
        one_perf, in_axes=(0, None, 0, 0, 0, None, None, 0)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0))(
        CH, pbh32, rho_conn.astype(f32), ws.wi.astype(f32), dz,
        ws.is_injector, ws.inj_phase, ws.perf_mask)
    dq_du = esum("wpck,wpkd->wpcd", dq_dch, dCH)
    f64 = pbh.dtype
    return WellPerf(q_perf=val.astype(f64), dq_du=dq_du.astype(f64),
                    dq_dpbh=dq_dpbh.astype(f64), rho_conn=rho_conn)


def well_perf_contributions(fs: FluidSystem, u, flag, pbh: jnp.ndarray,
                            ws: WellSet, regs=None, mob_mult=None,
                            eps=None, rho_conn=None) -> WellPerf:
    """Per-perforation rates + Jacobians (independent of well controls).

    ``rho_conn`` may be precomputed once per substep
    (connection_densities); None recomputes it here."""
    u_perf = u[ws.cell]          # [W,P,3]
    flag_perf = flag[ws.cell]    # [W,P]
    reg_perf = (regs[ws.cell] if regs is not None
                else jnp.zeros(ws.cell.shape + (2,), jnp.int32))
    mob_perf = (mob_mult[ws.cell] if mob_mult is not None
                else jnp.ones(ws.cell.shape + (5,)))
    eps_perf = eps[ws.cell] if eps is not None else None
    eps_ax = None if eps is None else 0
    dz = ws.perf_depth - ws.ref_depth[:, None]  # [W,P]

    if rho_conn is None:
        rho_conn = connection_densities(fs, u, flag, pbh, ws, regs)

    def one_perf(u_c, flag_c, pb, rho_c, wi_c, dz_c, inj, phase, mask, rg,
                 mm, ep):
        def f(args):
            uu, pp = args
            qv = _perf_rates(fs, uu, flag_c, pp, rho_c, wi_c, dz_c, inj,
                             phase, rg, mm, ep)
            qv = jnp.where(mask, qv, jnp.zeros(3))
            return qv, qv

        jacs, val = jax.jacfwd(f, has_aux=True)((u_c, pb))
        dq_du, dq_dpbh = jacs
        return val, dq_du, dq_dpbh

    q_perf, dq_du, dq_dpbh = jax.vmap(jax.vmap(
        one_perf,
        in_axes=(0, 0, None, 0, 0, 0, None, None, 0, 0, 0, eps_ax)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, eps_ax))(
        u_perf, flag_perf, pbh, rho_conn, ws.wi, dz,
        ws.is_injector, ws.inj_phase, ws.perf_mask, reg_perf, mob_perf,
        eps_perf)

    # closed wells contribute nothing (the 1-DOF well has no total-rate
    # unknown, so STOP wells are treated as closed on this path too)
    open_ = ws.open_mask & (ws.ctrl_mode != CTRL_STOP)
    q_perf = jnp.where(open_[:, None, None], q_perf, jnp.zeros_like(q_perf))
    dq_du = jnp.where(open_[:, None, None, None], dq_du,
                      jnp.zeros_like(dq_du))
    dq_dpbh = jnp.where(open_[:, None, None], dq_dpbh,
                        jnp.zeros_like(dq_dpbh))
    return WellPerf(q_perf=q_perf, dq_du=dq_du, dq_dpbh=dq_dpbh,
                    rho_conn=rho_conn)


def well_control_contributions(pr: WellPerf, ws: WellSet, active_mode,
                               pbh, vfp_bank=None) -> WellResult:
    """Second assembly stage: the per-well control equation and the
    B/D Schur blocks for the current (possibly just-switched) mode."""
    q_perf, dq_du, dq_dpbh = pr.q_perf, pr.dq_du, pr.dq_dpbh

    # ---- well control equations (per well, differentiable in u, pbh) ----
    def control_residual(q_tot, pb, mode, ws_row):
        (orat, wrat, grat, lrat, inj_rate, bhp_t, is_inj, thp_t,
         vfp_i, resv, vcoef, alq) = ws_row
        prod = -q_tot  # positive production rates
        prod_bank, inj_bank = _split_banks(vfp_bank)
        r_rate_prod = jnp.select(
            [mode == CTRL_ORAT, mode == CTRL_WRAT, mode == CTRL_GRAT,
             mode == CTRL_LRAT, mode == CTRL_RESV],
            [prod[1] - orat, prod[0] - wrat, prod[2] - grat,
             prod[0] + prod[1] - lrat, jnp.dot(vcoef, prod) - resv],
            default=pb - bhp_t)
        if prod_bank is not None:
            from opm_autodiff_tpu.wells.vfp import bank_bhp

            bhp_vfp = bank_bhp(prod_bank, vfp_i, thp_t, prod, alq)
            r_rate_prod = jnp.where(mode == CTRL_THP, pb - bhp_vfp,
                                    r_rate_prod)
        inj_surf = q_tot[0] + q_tot[1] + q_tot[2]
        r_inj = jnp.select(
            [mode == CTRL_RATE, mode == CTRL_RESV],
            [inj_surf - inj_rate, jnp.dot(vcoef, q_tot) - resv],
            default=pb - bhp_t)
        if inj_bank is not None:
            from opm_autodiff_tpu.wells.vfp import bank_inj_bhp

            bhp_inj = bank_inj_bhp(inj_bank, vfp_i, thp_t, inj_surf)
            r_inj = jnp.where(mode == CTRL_THP, pb - bhp_inj, r_inj)
        r = jnp.where(is_inj, r_inj,
                      jnp.where(mode == CTRL_BHP, pb - bhp_t, r_rate_prod))
        return r

    # residual value and derivatives via the chain rule:
    # R_w = g(sum_p q(u_p, pbh), pbh)
    q_tot = q_perf.sum(axis=1)  # [W,3]

    def rw_fn(q_tot_w, pb, mode, orat, wrat, grat, lrat, inj_rate, bhp_t,
              is_inj, thp_t, vfp_i, resv, vcoef, alq):
        return control_residual(q_tot_w, pb, mode,
                                (orat, wrat, grat, lrat, inj_rate, bhp_t,
                                 is_inj, thp_t, vfp_i, resv, vcoef, alq))

    rw_args = (q_tot, pbh, active_mode, ws.orat, ws.wrat, ws.grat, ws.lrat,
               ws.inj_rate, ws.bhp_target, ws.is_injector, ws.thp_target,
               ws.vfp_idx, ws.resv_rate, ws.voidage_coeff, ws.alq)
    res_well = jax.vmap(rw_fn)(*rw_args)

    # dg/dq_tot: [W,3]; dg/dpbh direct: [W]
    dg_dq = jax.vmap(jax.grad(rw_fn, argnums=0))(*rw_args)
    dg_dpb = jax.vmap(jax.grad(rw_fn, argnums=1))(*rw_args)

    # B[w,p,:] = dg/dq . dq/du ; D[w] = dg/dpbh + dg/dq . dq/dpbh
    b_blk = esum("wi,wpij->wpj", dg_dq, dq_du)
    d_diag = dg_dpb + esum("wi,wpi->w", dg_dq, dq_dpbh)

    # singular well equation (all perfs degenerate): pin pbh instead of
    # letting D^-1 poison the Schur complement
    d_bad = jnp.abs(d_diag) < 1e-300
    res_well = jnp.where(d_bad, 0.0, res_well)
    b_blk = jnp.where(d_bad[:, None, None], 0.0, b_blk)
    d_diag = jnp.where(d_bad, 1.0, d_diag)

    # closed wells: pin their pbh to the limit (their q/dq are already
    # zero from the perf stage); 1-DOF STOP wells are closed
    open_ = ws.open_mask & (ws.ctrl_mode != CTRL_STOP)
    res_well = jnp.where(open_, res_well, pbh - ws.bhp_target)
    b_blk = jnp.where(open_[:, None, None], b_blk, jnp.zeros_like(b_blk))
    d_diag = jnp.where(open_, d_diag, jnp.ones_like(d_diag))

    return WellResult(q_perf=q_perf, dq_du=dq_du, dq_dpbh=dq_dpbh,
                      res_well=res_well, b_blk=b_blk, d_diag=d_diag,
                      rho_conn=pr.rho_conn)


def well_contributions(fs: FluidSystem, u, flag, pbh: jnp.ndarray,
                       ws: WellSet,
                       active_mode: jnp.ndarray | None = None,
                       vfp_bank=None, regs=None,
                       mob_mult=None, eps=None,
                       rho_conn=None) -> WellResult:
    """Assemble all well quantities for one Newton iteration.

    Returns per-perf rates + Jacobian blocks and the 1x1 well equations.
    Shapes: u [N,3], flag [N], pbh [W]. ``active_mode`` is the *current*
    control (dynamic — control switching changes it between iterations,
    reference BlackoilWellModel_impl.hpp:1239 updateWellControls);
    defaults to the schedule mode. The two stages are exposed separately
    (well_perf_contributions / well_control_contributions) so the Newton
    loop can switch controls on the SAME assembly's rates without a
    second rates pass.
    """
    if active_mode is None:
        active_mode = ws.ctrl_mode
    pr = well_perf_contributions(fs, u, flag, pbh, ws, regs, mob_mult,
                                 eps, rho_conn)
    return well_control_contributions(pr, ws, active_mode, pbh, vfp_bank)


# ---------------------------------------------------------------------------
# Coupling into the reservoir system
# ---------------------------------------------------------------------------

def apply_to_residual(residual, wr: WellResult, ws: WellSet):
    """R_c -= q at perforated cells (in the system's storage dtype)."""
    flat_cells = ws.cell.reshape(-1)
    flat_q = wr.q_perf.reshape(-1, 3).astype(residual.dtype)
    return residual.at[flat_cells].add(-flat_q)


def apply_to_diag(diag, wr: WellResult, ws: WellSet):
    """A_cc -= dq/du at perforated cells."""
    flat_cells = ws.cell.reshape(-1)
    flat_j = wr.dq_du.reshape(-1, 3, 3).astype(diag.dtype)
    return diag.at[flat_cells].add(-flat_j)


def schur_matvec(wr: WellResult, ws: WellSet, x):
    """y = -C D^-1 B x  (the well Schur complement on cell vectors).

    C[w,p,:] = dR_c/dpbh = -dq_dpbh. Fused into the Krylov operator
    (reference: WellOperators.hpp:99; StandardWell_impl.hpp:1273 apply).
    """
    dt = x.dtype  # f32-native inside the f32 Krylov loop
    x_perf = x[ws.cell]  # [W,P,3]
    bx = esum("wpj,wpj->w", wr.b_blk.astype(dt), x_perf)
    coef = bx / wr.d_diag.astype(dt)  # [W]
    contrib = (-wr.dq_dpbh.astype(dt)) * coef[:, None, None]
    y = jnp.zeros_like(x)
    y = y.at[ws.cell.reshape(-1)].add(-contrib.reshape(-1, 3))
    return y


def schur_rhs(residual, wr: WellResult, ws: WellSet):
    """b = -(r_c - C D^-1 r_w); returns the correction to add to -r_c."""
    coef = wr.res_well / wr.d_diag  # [W]
    contrib = (-wr.dq_dpbh) * coef[:, None, None]
    corr = jnp.zeros_like(residual)
    corr = corr.at[ws.cell.reshape(-1)].add(
        contrib.reshape(-1, 3).astype(residual.dtype))
    return corr  # add to rhs: b = -residual + corr


def recover_pbh_update(wr: WellResult, ws: WellSet, dx):
    """dpbh = -D^-1 (r_w + B dx)."""
    dx_perf = dx[ws.cell]
    bdx = esum("wpj,wpj->w", wr.b_blk, dx_perf)
    return -(wr.res_well + bdx) / wr.d_diag
