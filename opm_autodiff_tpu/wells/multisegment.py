"""Multisegment wells: segmented wellbore flow fully coupled to the grid.

Rebuild of the reference's MultisegmentWell
(opm/simulators/wells/MultisegmentWell.hpp:35, MultisegmentWellEval.cpp:
1556 assembleDefaultPressureEq, friction model MSWellHelpers): segments
form a tree (WELSEGS), perforations attach to segments by branch length
(COMPSEGS), and each segment carries mass-balance + pressure-drop
(hydrostatic + friction) equations.

TPU design decisions:
  * all MSW wells batched into padded [M, S] segment arrays; unknowns are
    x[M, S, 4] = (qw, qo, qg, p): per-segment surface outflow rates toward
    the outlet plus segment node pressure. Rate unknowns keep the mass
    balance linear (the reference's GTotal/WFrac/GFrac parametrization
    degenerates at zero rate; rates do not).
  * the per-well system Jacobian D = dR/dx ([4S, 4S]) comes from one
    jacfwd over the flattened segment state — replacing the reference's
    Evaluation<.., numWellEq> AD — and is inverted with a vmapped
    Gauss-Jordan (partial pivoting) because f64 LuDecomposition has no
    TPU lowering.
  * coupling uses the same Schur-complement shape as StandardWell:
    y_cell -= C D^-1 B x fused into the Krylov operator
    (reference: WellOperators.hpp:99; MultisegmentWell duneB_/C_/D_,
    MultisegmentWellEval.hpp:272-275). The reference solves D with host
    UMFPACK; here D^-1 is formed once per Newton iteration on device.

Pressure-drop model: 'H--' hydrostatic only, 'HF-' + Darcy-Weisbach
friction with the Haaland friction factor (laminar 64/Re below Re~2000),
'HFA' + the acceleration (velocity-head) term — net mdot^2/(A^2 rho)
gained across the segment vs its inlets (reference:
MultisegmentWellEval.cpp:1505 handleAccelerationPressureLoss).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.grid.geometry import Geometry, peaceman_well_index
from opm_autodiff_tpu.models.blackoil import intensive
from opm_autodiff_tpu.props.fluid import FluidSystem
from opm_autodiff_tpu.wells.standard import (_MODE_IDX, _PHASE_IDX, CTRL_BHP,
                                             CTRL_GRAT, CTRL_LRAT, CTRL_ORAT,
                                             CTRL_RATE, CTRL_RESV, CTRL_THP,
                                             CTRL_WRAT, _perf_rates)
from opm_autodiff_tpu.utils.tinydot import esum


class MswSet(NamedTuple):
    """Padded static + control data for all multisegment wells."""

    # segments [M,S]
    seg_outlet: jnp.ndarray   # int32 index of outlet segment (self for top)
    seg_mask: jnp.ndarray     # bool
    seg_depth: jnp.ndarray    # node TVD
    seg_dlen: jnp.ndarray     # |length - outlet length| (pipe increment)
    seg_diam: jnp.ndarray
    seg_rough: jnp.ndarray
    seg_area: jnp.ndarray
    # perforations [M,P]
    perf_cell: jnp.ndarray
    perf_seg: jnp.ndarray     # segment index of each perf
    perf_wi: jnp.ndarray
    perf_depth: jnp.ndarray
    perf_mask: jnp.ndarray
    # well-level controls [M] (same conventions as standard WellSet)
    is_injector: jnp.ndarray
    inj_phase: jnp.ndarray
    ctrl_mode: jnp.ndarray
    orat: jnp.ndarray
    wrat: jnp.ndarray
    grat: jnp.ndarray
    lrat: jnp.ndarray
    inj_rate: jnp.ndarray
    bhp_target: jnp.ndarray
    bhp_limit: jnp.ndarray
    open_mask: jnp.ndarray
    use_friction: jnp.ndarray  # bool per well (pd_model has 'F')
    use_accel: jnp.ndarray     # bool per well (pd_model == 'HFA')

    @property
    def num_wells(self) -> int:
        return self.seg_mask.shape[0]

    @property
    def max_segs(self) -> int:
        return self.seg_mask.shape[1]

    @property
    def max_perfs(self) -> int:
        return self.perf_cell.shape[1]


class MswResult(NamedTuple):
    q_perf_cell: jnp.ndarray  # [M,P,3] surface rates INTO cells
    res: jnp.ndarray          # [M,S,4] well residuals
    d_inv: jnp.ndarray        # [M,4S,4S]
    b_blk: jnp.ndarray        # [M,4S,P*3] dR/d u_perf
    c_blk: jnp.ndarray        # [M,P*3,4S] dq_cell/dx (cell-eq coupling)
    dq_du: jnp.ndarray        # [M,P,3,3] dq_cell/du_cell (diagonal add)


def build_mswset(geo: Geometry, wells: list) -> MswSet | None:
    """Host-side construction from WellConfigs that carry segments."""
    msw = [w for w in wells if getattr(w, "segments", None)]
    if not msw:
        return None
    m = len(msw)
    smax = max(len(w.segments) for w in msw)
    pmax = max(max(len(w.completions), 1) for w in msw)

    so = np.zeros((m, smax), np.int32)
    sm = np.zeros((m, smax), bool)
    sd = np.zeros((m, smax))
    sl = np.zeros((m, smax))
    sdi = np.full((m, smax), 0.1)
    sr = np.full((m, smax), 1e-5)
    sa = np.full((m, smax), np.pi * 0.1 ** 2 / 4)

    pc = np.zeros((m, pmax), np.int32)
    ps = np.zeros((m, pmax), np.int32)
    pw = np.zeros((m, pmax))
    pd = np.zeros((m, pmax))
    pm = np.zeros((m, pmax), bool)

    inj = np.zeros(m, bool)
    injp = np.zeros(m, np.int32)
    mode = np.zeros(m, np.int32)
    inf = np.inf
    orat = np.full(m, inf)
    wrat = np.full(m, inf)
    grat = np.full(m, inf)
    lrat = np.full(m, inf)
    irate = np.full(m, inf)
    bhp_t = np.zeros(m)
    bhp_l = np.zeros(m)
    open_m = np.zeros(m, bool)
    fric = np.zeros(m, bool)
    accel = np.zeros(m, bool)

    for iw, w in enumerate(msw):
        segs = sorted(w.segments, key=lambda s: s.number)
        num_to_idx = {s.number: k for k, s in enumerate(segs)}
        for k, s in enumerate(segs):
            sm[iw, k] = True
            so[iw, k] = num_to_idx.get(s.outlet, k)  # top: outlet 0 -> self
            sd[iw, k] = s.depth
            out = next((x for x in segs if x.number == s.outlet), None)
            sl[iw, k] = abs(s.length - out.length) if out else 0.0
            sdi[iw, k] = max(s.diam, 1e-3)
            sr[iw, k] = max(s.rough, 1e-7)
            sa[iw, k] = max(s.area, 1e-6)
        fric[iw] = "F" in (w.pd_model or "HF-")
        accel[iw] = "A" in (w.pd_model or "HF-")

        # map completions to segments by COMPSEGS length interval midpoint
        comps = [c for c in w.completions if c.open]
        for ip, c in enumerate(comps[:pmax]):
            ci = geo.act_index(c.i, c.j, c.k)
            if ci < 0:
                continue
            pc[iw, ip] = ci
            pw[iw, ip] = (c.cf if c.cf is not None
                          else peaceman_well_index(
                              geo, ci, c.diameter, c.skin, c.direction,
                              c.kh)) * getattr(c, "pi_mult", 1.0)
            pd[iw, ip] = geo.depth[ci]
            pm[iw, ip] = True
            seg_idx = 0
            if w.compsegs:
                match = [cs for cs in w.compsegs
                         if (cs.i, cs.j, cs.k) == (c.i, c.j, c.k)]
                if match:
                    cs = match[0]
                    mid = 0.5 * (cs.start + cs.end)
                    # nearest segment node on the same branch by length
                    best, bestd = 0, np.inf
                    for k, s in enumerate(segs):
                        if s.branch != cs.branch:
                            continue
                        dd = abs(s.length - mid)
                        if dd < bestd:
                            best, bestd = k, dd
                    seg_idx = best
            else:
                # no COMPSEGS: nearest segment node by depth
                best, bestd = 0, np.inf
                for k, s in enumerate(segs):
                    dd = abs(s.depth - pd[iw, ip])
                    if dd < bestd:
                        best, bestd = k, dd
                seg_idx = best
            ps[iw, ip] = seg_idx

        inj[iw] = w.is_injector
        open_m[iw] = (w.status == "OPEN") and pm[iw].any()
        mode[iw] = _MODE_IDX.get(w.control_mode, CTRL_BHP)
        if w.is_injector:
            injp[iw] = _PHASE_IDX.get(w.inj_phase or "GAS", 2)
            if w.inj_rate is not None:
                irate[iw] = w.inj_rate
            bhp_l[iw] = w.bhp_limit if w.bhp_limit is not None else 6.9e8
        else:
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

    return MswSet(
        seg_outlet=jnp.asarray(so), seg_mask=jnp.asarray(sm),
        seg_depth=jnp.asarray(sd), seg_dlen=jnp.asarray(sl),
        seg_diam=jnp.asarray(sdi), seg_rough=jnp.asarray(sr),
        seg_area=jnp.asarray(sa),
        perf_cell=jnp.asarray(pc), perf_seg=jnp.asarray(ps),
        perf_wi=jnp.asarray(pw), perf_depth=jnp.asarray(pd),
        perf_mask=jnp.asarray(pm),
        is_injector=jnp.asarray(inj), inj_phase=jnp.asarray(injp),
        ctrl_mode=jnp.asarray(mode), orat=jnp.asarray(orat),
        wrat=jnp.asarray(wrat), grat=jnp.asarray(grat),
        lrat=jnp.asarray(lrat), inj_rate=jnp.asarray(irate),
        bhp_target=jnp.asarray(bhp_t), bhp_limit=jnp.asarray(bhp_l),
        open_mask=jnp.asarray(open_m), use_friction=jnp.asarray(fric),
        use_accel=jnp.asarray(accel),
    )


def init_msw_state(msw: MswSet, u) -> jnp.ndarray:
    """Initial x[M,S,4]: zero rates, hydrostatic-ish segment pressures
    seeded from each well's first perf cell pressure."""
    p0 = u[msw.perf_cell[:, 0], 0]  # [M]
    dp = jnp.where(msw.is_injector[:, None], 1e5, -1e5)
    p_seg = p0[:, None] + dp + 0.0 * msw.seg_depth
    q0 = jnp.zeros(msw.seg_mask.shape + (3,))
    return jnp.concatenate([q0, p_seg[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# Per-well residual (scalar well; vmapped over M)
# ---------------------------------------------------------------------------

def _haaland_dp(q_res, rho, mu, L, D, rough, area):
    """Darcy-Weisbach friction pressure drop, sign following the flow.

    Laminar branch (Re < 2000) is exactly linear in v so the whole
    expression stays smooth through zero rate (MSWellHelpers' Haaland
    formula above)."""
    v = q_res / area
    re = jnp.abs(rho * v * D / jnp.maximum(mu, 1e-12))
    re_safe = jnp.maximum(re, 1e-3)
    inv_sqrt_f = -1.8 * jnp.log10((rough / (3.7 * D)) ** 1.11
                                  + 6.9 / re_safe)
    f_turb = 1.0 / jnp.maximum(inv_sqrt_f, 1e-3) ** 2
    f_lam_dp = 32.0 * mu * L * v / D ** 2          # laminar, linear in v
    turb_dp = f_turb * (L / D) * rho * v * jnp.abs(v) / 2.0
    return jnp.where(re < 2000.0, f_lam_dp, turb_dp)


def _msw_residual(fs: FluidSystem, msw_row, x, u_perf, flag_perf, reg_perf,
                  active_mode, mob_perf):
    """Residual [S,4] of ONE well. x: [S,4] = (qw,qo,qg,p)."""
    (seg_outlet, seg_mask, seg_depth, seg_dlen, seg_diam, seg_rough,
     seg_area, perf_cell, perf_seg, perf_wi, perf_depth, perf_mask,
     is_inj, inj_phase, orat, wrat, grat, lrat, inj_rate, bhp_t,
     use_fric, use_accel) = msw_row
    S = x.shape[0]
    q = x[:, :3]      # [S,3] surface rates toward outlet
    p = x[:, 3]       # [S]

    # --- perforation rates (reuse the standard-well Peaceman kernel;
    # its q is INTO the cell, so the wellbore gains -q) ---
    p_seg_perf = p[perf_seg]           # [P]
    dz = perf_depth - seg_depth[perf_seg]

    def conn_rho(u_c, f_c, rg):
        qq = intensive(fs, u_c, f_c, rg)
        mob_sum = qq.mob[0] + qq.mob[1] + qq.mob[2]
        w = qq.mob / jnp.maximum(mob_sum, 1e-30)
        rho_mix = jnp.sum(w * qq.rho)
        return jnp.where(is_inj, qq.rho[inj_phase], rho_mix)

    rho_conn = jax.vmap(conn_rho)(jax.lax.stop_gradient(u_perf), flag_perf,
                                  reg_perf)

    def one_perf(u_c, f_c, pbh, rho_c, wi, dzc, mask, rg, mm):
        qv = _perf_rates(fs, u_c, f_c, pbh, rho_c, wi, dzc, is_inj,
                         inj_phase, rg, mm)
        return jnp.where(mask, qv, jnp.zeros(3))

    q_cell = jax.vmap(one_perf)(u_perf, flag_perf, p_seg_perf, rho_conn,
                                perf_wi, dz, perf_mask, reg_perf,
                                mob_perf)  # [P,3]
    q_wb = -q_cell  # into the wellbore

    # --- mass balance: q_s - sum(children q) - sum(perf inflow) = 0 ---
    # children: segments whose outlet == s (excluding the top's self-link)
    child_sum = jnp.zeros((S, 3))
    not_top = jnp.arange(S) != 0
    child_sum = child_sum.at[seg_outlet].add(
        jnp.where((seg_mask & not_top)[:, None], q, 0.0))
    perf_sum = jnp.zeros((S, 3)).at[perf_seg].add(q_wb)
    r_mb = q - child_sum - perf_sum  # [S,3]

    # --- segment mixture properties at p_s from its own stream ---
    reg0 = (0, 0)
    bw = 1.0 / jnp.maximum(fs.water.inv_b(p), 1e-12)
    # dissolved gas rides in the oil stream only when both flow the same
    # way; injectors (qo <= 0) carry free gas only
    qo, qg = q[:, 1], q[:, 2]
    both_pos = (qo > 1e-12) & (qg > 0.0)
    gor = jnp.where(both_pos, qg / jnp.where(qo > 1e-12, qo, 1.0), 0.0)
    rs_mix = jnp.minimum(gor, fs.rs_sat(p))
    bo = 1.0 / jnp.maximum(fs.oil_inv_b(p, rs_mix), 1e-12)
    bg = 1.0 / jnp.maximum(fs.gas_inv_b(p, 0.0), 1e-12)
    q_free_gas = qg - rs_mix * qo
    vol_flux = q[:, 0] * bw + q[:, 1] * bo + q_free_gas * bg  # [S] res m3/s
    rho_s = fs.rho_ref(0)
    mass_flux = q[:, 0] * rho_s[0] + q[:, 1] * rho_s[1] + q[:, 2] * rho_s[2]
    eps = 1e-7
    rho_fallback = fs.oil_density(p, rs_mix)
    rho_mix = ((jnp.abs(mass_flux) + eps * rho_fallback)
               / (jnp.abs(vol_flux) + eps))
    mu_mix = (fs.water.viscosity(p) * jnp.abs(q[:, 0] * bw)
              + fs.oil_viscosity(p, rs_mix) * jnp.abs(q[:, 1] * bo)
              + fs.gas_viscosity(p, 0.0) * jnp.abs(q_free_gas * bg)
              + eps * fs.oil_viscosity(p, rs_mix)) \
        / (jnp.abs(vol_flux) + eps)

    # --- pressure equations ---
    p_out = p[seg_outlet]
    dz_seg = seg_depth - seg_depth[seg_outlet]
    dp_hydro = rho_mix * U.GRAVITY * dz_seg
    dp_fric = _haaland_dp(vol_flux, rho_mix, mu_mix, seg_dlen, seg_diam,
                          seg_rough, seg_area)
    dp_fric = jnp.where(use_fric, dp_fric, 0.0)
    r_p = p - p_out - dp_hydro - dp_fric

    # --- acceleration pressure loss ('HFA' drop model; reference:
    # MultisegmentWellEval.cpp:1505 handleAccelerationPressureLoss,
    # velocityHead = mdot^2/(A^2 rho), MSWellHelpers.hpp:255): the
    # velocity head gained across the segment minus its inlets', signed
    # so that accelerating producer flow ADDS pressure drop ---
    vh_seg = mass_flux * mass_flux / (seg_area * seg_area
                                      * jnp.maximum(rho_mix, 1e-12))
    area_out = seg_area[seg_outlet]
    vh_inlet = (mass_flux * mass_flux
                / (jnp.maximum(seg_area, area_out) ** 2
                   * jnp.maximum(rho_mix, 1e-12)))
    inlet_sum = jnp.zeros(S).at[seg_outlet].add(
        jnp.where(seg_mask & not_top, vh_inlet, 0.0))
    accel = vh_seg - inlet_sum
    sign = jnp.where(mass_flux < 0.0, 1.0, -1.0)
    r_p = r_p + jnp.where(use_accel, sign * accel, 0.0) * (-1.0)

    # --- top-segment control equation ---
    q_top = q[0]  # [3] surface rates leaving the well (producer: > 0)
    prod = q_top
    r_ctrl_prod = jnp.select(
        [active_mode == CTRL_ORAT, active_mode == CTRL_WRAT,
         active_mode == CTRL_GRAT, active_mode == CTRL_LRAT],
        [prod[1] - orat, prod[0] - wrat, prod[2] - grat,
         prod[0] + prod[1] - lrat],
        default=p[0] - bhp_t)
    r_ctrl_inj = jnp.where(active_mode == CTRL_RATE,
                           -(q_top[0] + q_top[1] + q_top[2]) - inj_rate,
                           p[0] - bhp_t)
    r_ctrl = jnp.where(is_inj, r_ctrl_inj, r_ctrl_prod)
    r_p = r_p.at[0].set(r_ctrl)

    res = jnp.concatenate([r_mb, r_p[:, None]], axis=-1)  # [S,4]
    # padded segments: pin to identity (x stays frozen)
    res = jnp.where(seg_mask[:, None], res, x)
    return res, q_cell


def _gauss_jordan_inv(a):
    """Dense inverse via Gauss-Jordan with partial pivoting (pure jnp —
    f64 LuDecomposition has no TPU lowering; this is arithmetic only)."""
    n = a.shape[0]
    aug = jnp.concatenate([a, jnp.eye(n, dtype=a.dtype)], axis=1)

    def body(k, aug):
        col = aug[:, k]
        mask = jnp.arange(n) >= k
        piv = jnp.argmax(jnp.where(mask, jnp.abs(col), -1.0))
        # swap rows k <-> piv
        rk = aug[k]
        rp = aug[piv]
        aug = aug.at[k].set(rp).at[piv].set(rk)
        pval = aug[k, k]
        pval = jnp.where(jnp.abs(pval) < 1e-300, 1e-300, pval)
        row_k = aug[k] / pval
        aug = aug.at[k].set(row_k)
        factors = aug[:, k].at[k].set(0.0)
        aug = aug - factors[:, None] * row_k[None, :]
        return aug

    aug = jax.lax.fori_loop(0, n, body, aug)
    return aug[:, n:]


def msw_contributions(fs: FluidSystem, u, flag, x, msw: MswSet,
                      active_mode=None, regs=None,
                      mob_mult=None) -> MswResult:
    """Residual + all Jacobian blocks for one Newton iteration."""
    if active_mode is None:
        active_mode = msw.ctrl_mode
    M, S = msw.seg_mask.shape
    P = msw.perf_cell.shape[1]
    u_perf = u[msw.perf_cell]           # [M,P,3]
    flag_perf = flag[msw.perf_cell]
    reg_perf = (regs[msw.perf_cell] if regs is not None
                else jnp.zeros(msw.perf_cell.shape + (2,), jnp.int32))
    mob_perf = (mob_mult[msw.perf_cell] if mob_mult is not None
                else jnp.ones(msw.perf_cell.shape + (5,)))

    def one_well(row, x_w, u_p, f_p, r_p, am, m_p):
        def f(args):
            xw, up = args
            res, q_cell = _msw_residual(fs, row, xw.reshape(S, 4),
                                        up.reshape(P, 3), f_p, r_p, am, m_p)
            return (res.reshape(-1), q_cell.reshape(-1)), (res, q_cell)

        (jac_res, jac_q), (res, q_cell) = jax.jacfwd(f, has_aux=True)(
            (x_w.reshape(-1), u_p.reshape(-1)))
        d_blk, b_blk = jac_res          # [4S,4S], [4S,3P]
        c_from_x, dq_du_full = jac_q    # [3P,4S], [3P,3P]
        d_inv = _gauss_jordan_inv(d_blk)
        # per-perf diagonal blocks dq_i/du_i (cross-perf-cell terms via
        # different cells are zero; same-cell multi-perf folds in apply)
        dq = dq_du_full.reshape(P, 3, P, 3)
        # q_cell[i] depends only on u_perf[i] -> block-diagonal
        dq_diag = jnp.diagonal(dq, axis1=0, axis2=2).transpose(2, 0, 1)
        return res, q_cell, d_inv, b_blk, c_from_x, dq_diag

    row = (msw.seg_outlet, msw.seg_mask, msw.seg_depth, msw.seg_dlen,
           msw.seg_diam, msw.seg_rough, msw.seg_area, msw.perf_cell,
           msw.perf_seg, msw.perf_wi, msw.perf_depth, msw.perf_mask,
           msw.is_injector, msw.inj_phase, msw.orat, msw.wrat, msw.grat,
           msw.lrat, msw.inj_rate, msw.bhp_target, msw.use_friction,
           msw.use_accel)
    res, q_cell, d_inv, b_blk, c_blk, dq_du = jax.vmap(one_well)(
        row, x, u_perf, flag_perf, reg_perf, active_mode, mob_perf)

    # closed wells contribute nothing; their equations pin x
    open_ = msw.open_mask
    q_cell = jnp.where(open_[:, None, None], q_cell, 0.0)
    dq_du = jnp.where(open_[:, None, None, None], dq_du, 0.0)
    b_blk = jnp.where(open_[:, None, None], b_blk, 0.0)
    c_blk = jnp.where(open_[:, None, None], c_blk, 0.0)
    res = jnp.where(open_[:, None, None], res, 0.0)
    eye = jnp.eye(4 * S)
    d_inv = jnp.where(open_[:, None, None], d_inv, eye[None])

    return MswResult(q_perf_cell=q_cell, res=res, d_inv=d_inv,
                     b_blk=b_blk, c_blk=c_blk, dq_du=dq_du)


# ---------------------------------------------------------------------------
# Coupling into the reservoir system (same shape as standard wells)
# ---------------------------------------------------------------------------

def apply_to_residual(residual, mr: MswResult, msw: MswSet):
    flat_cells = msw.perf_cell.reshape(-1)
    flat_q = mr.q_perf_cell.reshape(-1, 3).astype(residual.dtype)
    return residual.at[flat_cells].add(-flat_q)


def apply_to_diag(diag, mr: MswResult, msw: MswSet):
    flat_cells = msw.perf_cell.reshape(-1)
    flat_j = mr.dq_du.reshape(-1, 3, 3).astype(diag.dtype)
    return diag.at[flat_cells].add(-flat_j)


def schur_matvec(mr: MswResult, msw: MswSet, x):
    """y = -C D^-1 B x on cell vectors (C here maps to the CELL equations:
    dR_cell/dx_w = -c_blk since R_cell -= q)."""
    dt = x.dtype  # f32-native inside the f32 Krylov loop
    x_perf = x[msw.perf_cell].reshape(msw.num_wells, -1)  # [M,3P]
    bx = esum("msp,mp->ms", mr.b_blk.astype(dt), x_perf)
    dinv_bx = esum("mst,mt->ms", mr.d_inv.astype(dt), bx)
    contrib = esum("mps,ms->mp", mr.c_blk.astype(dt), dinv_bx)
    y = jnp.zeros_like(x)
    # R_cell -= q  =>  dR_cell/dx_w = -c_blk; y -= C D^-1 B x
    y = y.at[msw.perf_cell.reshape(-1)].add(
        contrib.reshape(-1, 3))
    return y


def schur_rhs(mr: MswResult, msw: MswSet, residual):
    """Correction to ADD to the rhs b = -r_c: the Schur elimination gives
    b = -r_c + (dR_c/dx_w) D^-1 r_w with dR_c/dx_w = -c_blk (cells see -q),
    i.e. the correction is -c_blk . D^-1 r_w."""
    rw = mr.res.reshape(msw.num_wells, -1)
    dinv_r = esum("mst,mt->ms", mr.d_inv, rw)
    contrib = esum("mps,ms->mp", mr.c_blk, dinv_r)
    corr = jnp.zeros_like(residual)
    corr = corr.at[msw.perf_cell.reshape(-1)].add(
        -contrib.reshape(-1, 3).astype(residual.dtype))
    return corr


def recover_update(mr: MswResult, msw: MswSet, dx):
    """dx_w = -D^-1 (r_w + B dx_cells); returns [M,S,4]."""
    dx_perf = dx[msw.perf_cell].reshape(msw.num_wells, -1)
    bdx = esum("msp,mp->ms", mr.b_blk, dx_perf)
    rhs = mr.res.reshape(msw.num_wells, -1) + bdx
    dxw = -esum("mst,mt->ms", mr.d_inv, rhs)
    M, S = msw.seg_mask.shape
    return dxw.reshape(M, S, 4)


def chop_msw_update(x, dxw, msw: MswSet):
    """Damped update: cap segment pressure changes (the reference damps
    MSW inner updates the same way, MultisegmentWell_impl.hpp inner
    Newton) and keep pressures physical."""
    dq = dxw[..., :3]
    dp = jnp.clip(dxw[..., 3], -5e6, 5e6)
    x_new = jnp.concatenate([x[..., :3] + dq,
                             jnp.clip(x[..., 3] + dp, 1e4, 2e9)[..., None]],
                            axis=-1)
    ok = jnp.isfinite(x_new)
    return jnp.where(ok & msw.seg_mask[..., None], x_new, x)


def msw_convergence(mr: MswResult, msw: MswSet, tol_rate_scale):
    """Scaled max residual over open wells (mass balance scaled by the
    well's target rate, pressure eqs by 1 bar)."""
    r = mr.res
    mb = jnp.abs(r[..., :3])
    rp = jnp.abs(r[..., 3]) / 1e5
    scale = jnp.maximum(tol_rate_scale, 1e-7)[:, None, None]
    err = jnp.maximum((mb / scale).max(axis=(1, 2)), rp.max(axis=1))
    return jnp.where(msw.open_mask, err, 0.0).max()
