"""Newton nonlinear solver: assemble -> converge-check -> solve -> update.

Rebuild of NonlinearSolverEbos::step + BlackoilModelEbos::nonlinearIteration
(reference: opm/simulators/flow/NonlinearSolverEbos.hpp:180,
BlackoilModelEbos.hpp:274) and opm-models' BlackOilNewtonMethod update
chopping ("Appleyard") + primary-variable switching, as one jitted device
mega-step driven by a host loop. Failure surfaces as status flags instead
of exceptions (SURVEY.md §5 failure handling).

Tolerances/defaults mirror BlackoilModelParametersEbos.hpp:178-196 and
NonlinearSolverEbos.hpp:67-73.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.models.assembler import assemble_system
from opm_autodiff_tpu.models.structured import (EmbeddedTopology,
                                                StructuredTopology,
                                                add_extra_faces,
                                                add_extra_faces_packed,
                                                assemble_structured,
                                                embed_cells, pin_inactive)
from opm_autodiff_tpu.models.aquifer import AquiferDevice, aquifer_rates, empty_device
from opm_autodiff_tpu.models.blackoil import (FLAG_RS, FLAG_RV, FLAG_SG,
                                              PrimaryState, intensive)
from opm_autodiff_tpu.solvers.linear import solve_linear
from opm_autodiff_tpu.wells import multisegment as msw_mod
from opm_autodiff_tpu.wells import standard as wells_mod
from opm_autodiff_tpu.wells import standard4 as s4
from opm_autodiff_tpu.wells.standard import CTRL_BHP, WellResult, WellSet


@dataclasses.dataclass(frozen=True)
class NewtonParams:
    # reference: NonlinearSolverEbos.hpp:67-73
    max_iter: int = 20
    min_iter: int = 1
    # reference: BlackoilModelParametersEbos.hpp
    tol_mb: float = 1e-6          # :180 ToleranceMb
    tol_cnv: float = 1e-2         # :185 ToleranceCnv
    tol_cnv_relaxed: float = 1.0  # :190 ToleranceCnvRelaxed
    relaxed_pv_fraction: float = 0.03  # :175 RelaxedMaxPvFraction
    tol_wells: float = 1e-4       # :195 ToleranceWells
    max_residual_allowed: float = 1e7  # :170
    # opm-models BlackOilNewtonMethod chop limits
    ds_max: float = 0.2
    dp_max_rel: float = 0.3
    drs_max_rel: float = 0.2
    # linear solver (FlowLinearSolverParameters.hpp:144,153)
    linear_tol: float = 1e-2
    linear_maxiter: int = 200
    # "zline" = per-column block-tridiagonal solve (exact in z, Jacobi
    # across columns) — 1.85x over plain block-Jacobi on TPU; falls back
    # to block-Jacobi on unstructured (BSR) layouts
    linear_precond: str = "zline"   # "zline" | "jacobi" | "cpr" | "cpramg"
    linear_method: str | None = None  # None = auto (bicgstab/fgmres)
    # inner pressure-stage iterations of the "cpr" fixed-Krylov coarse
    # solve (solve_linear cpr_inner_iters)
    linear_cpr_inner: int = 12
    # preconditioner setup reuse (reference reuse policies,
    # ISTLSolverEbos.hpp:401-426): "never" rebuilds the factorization
    # every Newton iteration; "substep" builds it at iteration 0 and
    # applies the stale factors for the rest of the substep
    # (zline/ilu0/jacobi only; cpr variants always rebuild)
    linear_setup_reuse: str = "never"
    # active phases (static): inactive phases get their equation pinned
    # to the identity (the reference compiles per-phase-set variants,
    # flow/flow_ebos_{gasoil,oilwater,gaswater,...}.cpp; one masked
    # trace here). Gas-water runs (has_oil=False) live in the RV state:
    # sg = 1 - sw structurally, x3 = Rv pinned through the oil equation
    has_water: bool = True
    has_gas: bool = True
    has_oil: bool = True
    # storage dtype of the assembled banded/embedded 3-eq system. True
    # stores it in f32: that matches the fused Pallas kernels' compute
    # precision (the values are f32-rounded either way) and keeps every
    # downstream scatter — well apply, COO extras, inactive pinning,
    # aquifers — off TPU's software-emulated f64 path (~2-4 ms per
    # full-array f64 scatter at 50k cells). The Krylov solve already
    # runs equilibrated f32; convergence metrics accumulate in f64.
    sys_f32: bool = True


class NewtonState(NamedTuple):
    """Dynamic state carried across Newton iterations (device pytree)."""

    u: jnp.ndarray          # [N,3]
    flag: jnp.ndarray       # [N]
    pbh: jnp.ndarray        # [W]
    active_mode: jnp.ndarray  # [W]
    # multisegment wells: [M,S,4] segment unknowns (None when no MSW)
    msw_x: jnp.ndarray | None = None
    # 4-DOF StandardWell unknowns [W,4] (WQTotal/WFrac/GFrac/Bhp;
    # reference StandardWell.hpp:126-133). None selects the 1-DOF
    # Peaceman research-well path; when present, pbh == xw[:,3]
    xw: jnp.ndarray | None = None
    # carried preconditioner factorization when
    # NewtonParams.linear_setup_reuse == "substep" (pytree of arrays;
    # None at the first iteration of each substep)
    lin_setup: object = None


class IterationInfo(NamedTuple):
    cnv: jnp.ndarray          # [3] per-phase max CNV
    mb: jnp.ndarray           # [3] per-phase mass-balance error
    well_err: jnp.ndarray     # max scaled well residual
    relaxed_ok: jnp.ndarray   # bool: CNV passes with PV-fraction relaxation
    converged: jnp.ndarray    # bool
    failed: jnp.ndarray       # bool (NaN / too-large residual)
    linear_iters: jnp.ndarray
    linear_ok: jnp.ndarray
    # per-well scaled residuals [W] — feeds the timestepper's
    # problematic-well shut fallback (AdaptiveTimeSteppingEbos.hpp:549)
    well_err_by_well: jnp.ndarray | None = None


def _convergence(params: NewtonParams, fs, cells, residual, inv_b, dt,
                 wr: WellResult, ws: WellSet, active_mode,
                 well_err_ext=None):
    """CNV / MB metrics (BlackoilModelEbos::getReservoirConvergence
    formulas, reference BlackoilModelEbos.hpp:628-904). ``inv_b`` [N,3]
    comes from the single per-iteration intensive evaluation."""
    pv = cells.pore_vol_ref
    f64 = pv.dtype
    pv_sum = pv.sum()

    if residual.dtype == jnp.float32:
        # fast path (f32-stored system): the residual values are
        # f32-rounded already, so the elementwise scaling runs in f32
        # (f64 is software-emulated on TPU — ~1ms/pass at 50k cells)
        # and only the MB cancellation-sensitive sum accumulates f64
        inv_b32 = inv_b.astype(jnp.float32)
        pv32 = pv.astype(jnp.float32)
        r_scaled = residual / inv_b32
        dt32 = jnp.asarray(dt, jnp.float32)
        cnv_cell = jnp.abs(r_scaled) * dt32 / pv32[:, None]
        cnv = cnv_cell.max(axis=0).astype(f64)
        mb = jnp.abs(jnp.sum(r_scaled, axis=0, dtype=f64)) * dt / pv_sum
        viol = (cnv_cell > params.tol_cnv).any(axis=1)
        pv_frac_viol = (jnp.where(viol, pv32, 0.0).sum()
                        / pv32.sum()).astype(f64)
        max_res = jnp.abs(r_scaled).max().astype(f64)
    else:
        big_b = 1.0 / inv_b  # [N,3]

        # surface-rate residual * B [m^3/s reservoir]; accumulate the
        # MB sums / CNV maxima in f64 even when the system is stored f32
        r_scaled = (big_b * residual).astype(pv.dtype)
        cnv_cell = jnp.abs(r_scaled) * dt / pv[:, None]  # [N,3]
        cnv = cnv_cell.max(axis=0)  # [3]
        mb = jnp.abs(r_scaled.sum(axis=0)) * dt / pv_sum  # [3]

        # relaxed CNV: PV fraction of cells violating the strict
        # tolerance (reference: computeCnvErrorPv :733 + relaxed :791)
        viol = (cnv_cell > params.tol_cnv).any(axis=1)
        pv_frac_viol = jnp.where(viol, pv, 0.0).sum() / pv_sum
        max_res = jnp.abs(r_scaled).max()
    relaxed_ok = jnp.logical_and(pv_frac_viol < params.relaxed_pv_fraction,
                                 (cnv < params.tol_cnv_relaxed).all())

    # well convergence: rate equations scaled by target, bhp by magnitude
    if well_err_ext is not None:
        well_err = well_err_ext
        cnv_ok = jnp.logical_or((cnv < params.tol_cnv).all(), relaxed_ok)
        mb_ok = (mb < params.tol_mb).all()
        wells_ok = well_err < params.tol_wells
        converged = cnv_ok & mb_ok & wells_ok
        failed = jnp.logical_or(
            ~jnp.isfinite(max_res),
            max_res > params.max_residual_allowed * pv_sum)
        return cnv, mb, well_err, relaxed_ok, converged, failed
    rate_scale = jnp.where(
        ws.is_injector, jnp.where(jnp.isfinite(ws.inj_rate), ws.inj_rate, 1.0),
        jnp.select([ws.ctrl_mode == wells_mod.CTRL_ORAT,
                    ws.ctrl_mode == wells_mod.CTRL_WRAT,
                    ws.ctrl_mode == wells_mod.CTRL_GRAT,
                    ws.ctrl_mode == wells_mod.CTRL_LRAT,
                    ws.ctrl_mode == wells_mod.CTRL_RESV],
                   [ws.orat, ws.wrat, ws.grat, ws.lrat, ws.resv_rate],
                   default=1.0))
    rate_scale = jnp.where(jnp.isfinite(rate_scale) & (rate_scale > 0),
                           rate_scale, 1.0)
    from opm_autodiff_tpu.wells.standard import CTRL_THP
    is_bhp_eq = (active_mode == CTRL_BHP) | (active_mode == wells_mod.CTRL_THP)
    scale = jnp.where(is_bhp_eq, jnp.maximum(jnp.abs(ws.bhp_target), 1e5),
                      rate_scale)
    well_err = jnp.where(ws.open_mask,
                         jnp.abs(wr.res_well) / scale, 0.0).max()

    cnv_ok = jnp.logical_or((cnv < params.tol_cnv).all(), relaxed_ok)
    mb_ok = (mb < params.tol_mb).all()
    wells_ok = well_err < params.tol_wells
    converged = cnv_ok & mb_ok & wells_ok

    failed = jnp.logical_or(~jnp.isfinite(max_res),
                            max_res > params.max_residual_allowed * pv_sum)
    return cnv, mb, well_err, relaxed_ok, converged, failed


def _chop_and_update(params: NewtonParams, fs, u, flag, dx, pvtnum=None,
                     x3_cap=None):
    # (inactive-phase pinning means dx for those variables is ~0)
    """Appleyard-chopped update + primary-variable switching
    (opm-models BlackOilNewtonMethod::update_ semantics)."""
    po, sw, x3 = u[:, 0], u[:, 1], u[:, 2]
    dpo, dsw, dx3 = dx[:, 0], dx[:, 1], dx[:, 2]

    dp_lim = jnp.maximum(params.dp_max_rel * jnp.abs(po), 1e5)
    dpo = jnp.clip(dpo, -dp_lim, dp_lim)
    dsw = jnp.clip(dsw, -params.ds_max, params.ds_max)

    is_sg = flag == FLAG_SG
    is_rs = flag == FLAG_RS
    is_rv = flag == FLAG_RV
    x3_lim = jnp.select(
        [is_sg, is_rs],
        [jnp.full_like(x3, params.ds_max),
         jnp.maximum(params.drs_max_rel * jnp.abs(x3), 1.0)],
        default=jnp.maximum(params.drs_max_rel * jnp.abs(x3), 1e-3))
    dx3 = jnp.clip(dx3, -x3_lim, x3_lim)

    po_new = jnp.clip(po + dpo, 1e4, 2e9)
    sw_new = jnp.clip(sw + dsw, 0.0, 1.0)
    x3_new = x3 + dx3

    # --- variable switching (disabled without a gas phase) ---
    # batched masked-region evaluation: vmap(rs_sat) gathers a table
    # row per cell and measured 11ms at 52k cells (fluid.rs_sat_vec)
    # f32 threshold evaluation (values are compared, not accumulated;
    # the assigned switch value carries ~1e-7 relative rounding, which
    # the next Newton iteration corrects)
    po32 = po_new.astype(jnp.float32)
    rs_sat_new = fs.rs_sat_vec(po32, pvtnum).astype(u.dtype)
    rv_sat_new = fs.rv_sat_vec(po32, pvtnum).astype(u.dtype)
    if x3_cap is not None:
        # DRSDT/DRVDT: the switching threshold is the capped saturation
        rs_sat_new = jnp.minimum(rs_sat_new, x3_cap)
        rv_sat_new = jnp.minimum(rv_sat_new, x3_cap)
    gas_on = params.has_gas
    oil_on = params.has_oil
    # oil must actually be present for the Rs meaning to be well-posed:
    # with So=0 nothing depends on Rs (zero Jacobian column), so
    # water-only cells stay in / return to the Sg state (matches the
    # reference's phase-presence switching conditions)
    # SG cell whose Sg went negative: gas dissolves -> switch to RS
    to_rs = is_sg & (x3_new < 0.0) & gas_on & oil_on \
        & (1.0 - sw_new > 1e-6)
    # SG cell whose So went negative (VAPOIL): oil vaporizes -> RV —
    # but only while gas is actually present: a water-only cell (sw ~ 1,
    # sg ~ 0) in the RV state has a zero Rv Jacobian column (every
    # Rv-coupled term rides sg) and the diagonal block goes singular.
    # Gas-water runs (has_oil False) use the RV state as the normal
    # gas-bearing meaning (sg = 1 - sw, Rv pinned), wet gas or not.
    to_rv = is_sg & ~to_rs & (1.0 - sw_new - x3_new < 0.0) & gas_on \
        & (fs.wet_gas or not oil_on) & (1.0 - sw_new > 1e-6)
    # RS cell whose Rs exceeds saturation (free gas appears) or whose
    # oil disappeared (water swept the cell) -> SG
    to_sg_rs = is_rs & ((x3_new > rs_sat_new)
                        | (1.0 - sw_new <= 1e-6)) & gas_on
    # RV cell whose Rv exceeds saturation (oil condenses) or whose gas
    # disappeared (water swept the cell) -> SG. Gas-water runs stay in
    # RV permanently: sg = 1 - sw is the structural meaning there, and
    # the oil-equation pinning on the x3 column keeps the water-swept
    # diagonal block nonsingular (the SG meaning would put the gas
    # equation and the pinned row on the same column instead)
    to_sg_rv = is_rv & ((x3_new > rv_sat_new)
                        | (1.0 - sw_new <= 1e-6)) & gas_on & oil_on

    flag_new = jnp.where(
        to_rs, FLAG_RS,
        jnp.where(to_rv, FLAG_RV,
                  jnp.where(to_sg_rs | to_sg_rv, FLAG_SG, flag)))
    # Sg may overshoot 1-Sw by a small slack (So transiently ~ -1e-3):
    # kro clamps to zero there, and the slightly negative oil
    # accumulation lets swept cells absorb drift/flux demands instead of
    # clip-annihilating the update into a nonzero-residual fixed point
    # (the reference's primary variables are likewise not hard-clipped)
    x3_stay = jnp.where(is_sg, jnp.clip(x3_new, 0.0, 1.0 - sw_new + 1e-3),
                        jnp.maximum(x3_new, 0.0))
    x3_new = jnp.select(
        [to_rs, to_rv, to_sg_rs, to_sg_rv],
        [rs_sat_new, rv_sat_new,
         jnp.zeros_like(x3_new),
         jnp.maximum(1.0 - sw_new - 1e-4, 0.0)],
        default=x3_stay)
    if x3_cap is not None:
        # DRSDT/DRVDT composition-change rate limits (caps built per
        # substep in the driver; +inf where inactive)
        x3_new = jnp.minimum(x3_new, x3_cap)
    u_new = jnp.stack([po_new, sw_new, x3_new], axis=1)
    return u_new, flag_new


def update_well_controls(ws: WellSet, active_mode, pbh, q_tot,
                         vfp_bank=None):
    """Control switching (reference: WellInterface_impl.hpp:155
    updateWellControl): rate-constrained wells falling below/above their
    BHP limit switch to BHP control; BHP-constrained wells exceeding the
    schedule rate target switch back. With VFP tables, THP limits are
    checked the same way (reference checkIndividualConstraints): a
    producer whose BHP falls below the BHP-equivalent of its THP limit
    at current rates switches to THP control — this is also how GRUPNET
    network node pressures constrain wells."""
    prod = -q_tot  # [W,3] positive production
    sched = ws.ctrl_mode

    # THP limit: compare pbh against the limit mapped through the VFP
    # table at current rates
    to_thp = jnp.zeros_like(ws.is_injector)
    if vfp_bank is not None:
        from opm_autodiff_tpu.wells.standard import _split_banks
        from opm_autodiff_tpu.wells.vfp import bank_bhp, bank_inj_bhp

        prod_bank, inj_bank = _split_banks(vfp_bank)
        has_thp = (ws.thp_target > 0) & (ws.vfp_idx >= 0)
        if prod_bank is not None:
            bhp_of_thp = jax.vmap(bank_bhp, in_axes=(None, 0, 0, 0, 0))(
                prod_bank, ws.vfp_idx, ws.thp_target, prod, ws.alq)
            to_thp = (~ws.is_injector) & has_thp & \
                (active_mode != wells_mod.CTRL_THP) & (pbh < bhp_of_thp)
        if inj_bank is not None:
            bhp_inj = jax.vmap(bank_inj_bhp, in_axes=(None, 0, 0, 0))(
                inj_bank, ws.vfp_idx, ws.thp_target, q_tot.sum(axis=1))
            to_thp = to_thp | (ws.is_injector & has_thp
                               & (active_mode != wells_mod.CTRL_THP)
                               & (pbh > bhp_inj))

    # producer: on rate control and pbh below limit -> BHP
    prod_to_bhp = (~ws.is_injector) & (active_mode != CTRL_BHP) & \
        (pbh < ws.bhp_limit)
    # producer on BHP: schedule-rate exceeded -> back to schedule mode
    resv_prod = jnp.einsum("wi,wi->w", ws.voidage_coeff, prod)
    sched_rate = jnp.select(
        [sched == wells_mod.CTRL_ORAT, sched == wells_mod.CTRL_WRAT,
         sched == wells_mod.CTRL_GRAT, sched == wells_mod.CTRL_LRAT,
         sched == wells_mod.CTRL_RESV],
        [prod[:, 1] - ws.orat, prod[:, 0] - ws.wrat, prod[:, 2] - ws.grat,
         prod[:, 0] + prod[:, 1] - ws.lrat, resv_prod - ws.resv_rate],
        default=jnp.full_like(pbh, -1.0))
    limit_active = (active_mode == CTRL_BHP) | (active_mode == wells_mod.CTRL_THP)
    prod_to_rate = (~ws.is_injector) & limit_active & \
        (sched != active_mode) & (sched_rate > 0.0)

    inj_rate_now = q_tot.sum(axis=1)
    inj_resv_now = jnp.einsum("wi,wi->w", ws.voidage_coeff, q_tot)
    inj_target_exceeded = jnp.where(
        sched == wells_mod.CTRL_RESV, inj_resv_now > ws.resv_rate,
        inj_rate_now > ws.inj_rate)
    inj_to_bhp = ws.is_injector & (active_mode != CTRL_BHP) & \
        (pbh > ws.bhp_limit)
    inj_to_rate = ws.is_injector & (active_mode == CTRL_BHP) & \
        (sched != CTRL_BHP) & inj_target_exceeded

    new_mode = jnp.where(to_thp, wells_mod.CTRL_THP, active_mode)
    new_mode = jnp.where(prod_to_bhp | inj_to_bhp, CTRL_BHP, new_mode)
    new_mode = jnp.where(prod_to_rate | inj_to_rate, sched, new_mode)
    # STOP wells never switch controls: the zero-surface-rate constraint
    # is the status itself, not a limit (reference Well::Status::STOP)
    new_mode = jnp.where(sched == wells_mod.CTRL_STOP,
                         wells_mod.CTRL_STOP, new_mode)
    return new_mode


def newton_iteration_impl(params: NewtonParams, fs, cells, faces,
                          st: NewtonState, ws: WellSet, acc0, dt,
                          aq: AquiferDevice | None = None,
                          vfp_bank=None, msw=None, x3_cap=None,
                          relax=1.0, rho_conn=None, drift_vol=None,
                          well_f0=None, poly=None, energy=None,
                          trans4=None, extbo=None, cells_full=None):
    """One full Newton iteration (unjitted core; see ``newton_iteration``).
    Returns (new_state, info, q_tot, q_aquifer).

    ``poly`` (models/polymer.PolymerImplicit) switches the reservoir
    system to the 4-equation fully-implicit polymer assembly: ``u`` is
    [N,4] (po, sw, x3, c), residual/diag are 4-wide, and the wells see
    the current iterate's polymer water-mobility factor (value-exact,
    d q/dc dropped — quasi-Newton). Face-list (BSR) layout only.

    ``energy`` (models/energy.EnergyImplicit) does the same with
    temperature as the 4th unknown (reference: flow_ebos_energy's
    fully-implicit energy equation); mutually exclusive with ``poly``.

    ``trans4`` (models/transport4.TransportImplicit) does the same with
    a carrier-phase component concentration — brine salt or foam
    surfactant (reference: flow_ebos_brine/_foam); mutually exclusive
    with both.

    ``extbo`` (models/extbo.ExtboImplicit) does the same with the
    extended-black-oil solvent zFraction (reference: flow_ebos_extbo,
    Phase::ZFRACTION dispatch Main.hpp:309); mutually exclusive with
    all of the above.
    """
    if aq is None:
        aq = empty_device()
    u, flag, pbh, mode = st.u, st.flag, st.pbh, st.active_mode
    use4 = st.xw is not None  # 4-DOF StandardWell vs 1-DOF research well
    sys_dt = jnp.float32 if params.sys_f32 else u.dtype
    extra4 = next((x for x in (poly, energy, trans4, extbo)
                   if x is not None), None)
    u3 = u[:, :3] if extra4 is not None else u
    well_mob = cells.mob_mult
    if poly is not None:
        # concatenate, not scatter-mul: see polymer._mob_with_polymer
        pf = jax.vmap(poly.water_mob_factor)(
            u[:, 3], poly.ads_prev, cells.regs[:, 1], poly.rrf,
            poly.max_ads)
        well_mob = jnp.concatenate(
            [well_mob[:, :1] * pf[:, None], well_mob[:, 1:]], axis=1)
    elif energy is not None:
        # temperature-dependent viscosity at the perforated cells
        # (value-exact, d q/dT dropped — quasi-Newton, like polymer)
        vf = jax.vmap(energy.visc_factor)(u[:, 3], energy.t0)  # [N,3]
        well_mob = jnp.concatenate(
            [well_mob[:, :3] * vf, well_mob[:, 3:]], axis=1)
    elif trans4 is not None:
        # carrier-phase mobility factor at the perforated cells
        # (value-exact, d q/dc dropped — quasi-Newton, like polymer);
        # TL (solvent) needs the cell pressure too
        from opm_autodiff_tpu.models.transport4 import carrier_factor
        tf = jax.vmap(lambda c, p, r: carrier_factor(fs, trans4, c, p, r)
                      )(u[:, 3], u[:, 0], cells.regs[:, 1])
        m3 = jnp.where(trans4.phase_mask[None, :] > 0.0,
                       well_mob[:, :3] * tf[:, None], well_mob[:, :3])
        well_mob = jnp.concatenate([m3, well_mob[:, 3:]], axis=1)
    elif extbo is not None:
        # (p, z)-dependent oil/gas viscosity factors at the perforated
        # cells (value-exact, d q/dz dropped — quasi-Newton)
        from opm_autodiff_tpu.models import extbo as extbo_mod
        zf = extbo_mod.well_mu_factors(fs, extbo, u, cells.regs)  # [N,3]
        well_mob = jnp.concatenate(
            [well_mob[:, :3] * zf, well_mob[:, 3:]], axis=1)

    # inverse FVFs for the convergence metrics: the structured packed
    # assembly exposes them for free; other layouts do one vmapped sweep
    inv_b_cells = None

    if use4:
        # 4-DOF path: control switching runs on the primary-variable
        # rates (free — no perf pass needed), then ONE full assembly
        # for the updated mode (reference: updateWellControls before
        # assembleWellEq, BlackoilWellModel_impl.hpp:828-834)
        q_tot_pv = s4.xw_surface_rates(st.xw, ws)
        mode = update_well_controls(ws, mode, st.xw[:, 3], q_tot_pv,
                                    vfp_bank)
        # owner-distributed well assembly when a device mesh is active
        # (parallel/shard_wells.py — the ParallelWellInfo analog):
        # per-perf work on the cell's owner, one well-sized psum
        from opm_autodiff_tpu.parallel.mesh import get_active_mesh
        from opm_autodiff_tpu.parallel import shard_wells as sw
        dist_mesh = get_active_mesh()
        if (dist_mesh is not None
                and sw.dist_wells_enabled(dist_mesh, u3.shape[0])):
            wr = sw.well4_contributions_dist(
                dist_mesh, fs, u3, flag, st.xw, ws, mode, vfp_bank,
                cells.regs, well_mob, cells.eps, rho_conn, well_f0, dt)
        else:
            dist_mesh = None
            # deferred: assembled AFTER the reservoir sweep so the
            # packed cellpack planes (when the fast path produces them)
            # replace the per-perf PVT re-evaluation — see
            # well4_contributions_packed. ``wr = None`` marks the
            # deferral; the plain path runs when no planes exist.
            wr = None
        # reported rates come from the primary variables (reference:
        # updateWellStateFromPrimaryVariables — WellState rates are the
        # getQs values, exactly on target under rate control). Inactive
        # phases report identically zero (two-phase variants: the frozen
        # fraction unknown may carry roundoff-scale residue).
        phase_on = jnp.array([params.has_water, params.has_oil,
                              params.has_gas])
        q_tot = jnp.where(ws.open_mask[:, None] & phase_on[None, :],
                          q_tot_pv, 0.0)
        w_api = sw.DistWellApi(dist_mesh) if dist_mesh is not None else s4
    else:
        # --- ONE well assembly: the perforation stage is mode-independent,
        # so control switching runs on its own rates and only the 1x1
        # control equations are (re)built for the new mode (reference:
        # updateWellControls before assembleWellEq,
        # BlackoilWellModel_impl.hpp:828-834 — same data flow, no extra
        # rates pass). ``rho_conn`` is the per-substep explicit connection
        # density (calculateExplicitQuantities analog).
        # deferred like the std4 branch: assembled AFTER the reservoir
        # sweep so the packed cellpack planes replace the per-perf PVT
        # re-evaluation when available
        pr = None
        wr = None
        q_tot = None
        w_api = wells_mod

    # --- reservoir assembly (banded fast path for structured grids;
    # ACTNUM grids embed into the full box with identity rows) ---
    emb = faces if isinstance(faces, EmbeddedTopology) else None
    packed = None  # fused-path cellpack planes (fed to the well sweep)
    ws_sys = ws
    msw_sys = msw
    aq_cell_sys = aq.cell
    c4_wells = u[:, 3] if extra4 is not None else None
    u4_wells = u if extra4 is not None else None
    regs_wells = cells.regs
    if extra4 is not None:
        # 4-equation fully-implicit assembly: banded on cartesian boxes
        # (models/structured.assemble_structured4 — embedded with COO
        # extras on ACTNUM/fault grids, exactly like the 3-eq flagship),
        # face-list (BSR) otherwise. Multisegment wells compose: their
        # mass exchange rides the [:, :3] block and their perf rates
        # feed the 4th equation's source (see the msw block below) —
        # reference: MultisegmentWell under every model variant
        # (flow_ebos_energy.cpp + UseMultisegmentWell=true).
        banded4 = (emb is not None or isinstance(faces,
                                                 StructuredTopology))
        if banded4 and energy is not None and energy.cond_bands is None:
            raise NotImplementedError(
                "implicit energy on the banded layout needs conduction "
                "bands; the simulator routes such decks to the face "
                "list")
        if banded4:
            from opm_autodiff_tpu.models.structured import (
                add_extra_faces4, assemble_structured4)

            fdata, ex_fd = None, None
            if poly is not None:
                from opm_autodiff_tpu.models import polymer as poly_mod

                pa = poly_mod.make_acc4(fs, poly)
                pf = poly_mod.make_flux4(fs, poly)
                acc_fn = pa

                def flux_fn(uL4, uR4, fL, fR, t, g, rL, rR, th, mL, mR,
                            eL, eR, aL, aR, fd):
                    return pf(uL4, uR4, fL, fR, t, g, rL, rR, th,
                              mL, mR, eL, eR, aL, aR)

                aux = poly_mod._cell_aux(poly)
            elif energy is not None:
                from opm_autodiff_tpu.models import energy as energy_mod

                acc_fn = energy_mod.make_acc4(fs, energy)
                enf = energy_mod.make_flux4(fs, energy)

                def flux_fn(uL4, uR4, fL, fR, t, g, rL, rR, th, mL, mR,
                            eL, eR, aL, aR, fd):
                    return enf(uL4, uR4, fL, fR, t, g, rL, rR, th, fd,
                               mL, mR, eL, eR, aL, aR)

                aux = energy_mod._cell_aux(energy)
                fdata = energy.cond_bands
                ex_fd = energy.cond_extras
            elif trans4 is not None:
                from opm_autodiff_tpu.models import transport4 as t4_mod

                t4a = t4_mod.make_acc4(fs, trans4)
                t4f = t4_mod.make_flux4(fs, trans4)

                def acc_fn(u4, fl, pv, rg, ep, ax):
                    return t4a(u4, fl, pv, rg, ep)

                def flux_fn(uL4, uR4, fL, fR, t, g, rL, rR, th, mL, mR,
                            eL, eR, aL, aR, fd):
                    return t4f(uL4, uR4, fL, fR, t, g, rL, rR, th,
                               mL, mR, eL, eR)

                aux = None
            else:
                from opm_autodiff_tpu.models import extbo as extbo_mod

                exa = extbo_mod.make_acc4(fs, extbo)
                exf = extbo_mod.make_flux4(fs, extbo)

                def acc_fn(u4, fl, pv, rg, ep, ax):
                    return exa(u4, fl, pv, rg, ep)

                def flux_fn(uL4, uR4, fL, fR, t, g, rL, rR, th, mL, mR,
                            eL, eR, aL, aR, fd):
                    return exf(uL4, uR4, fL, fR, t, g, rL, rR, th,
                               mL, mR, eL, eR)

                aux = None
            if emb is not None:
                u_f = u[emb.fill]
                flag_f = flag[emb.fill]
                aux_f = None if aux is None else aux[emb.fill]
                if acc0.shape[0] == emb.mask.shape[0]:
                    acc0_f = acc0  # pre-embedded (see _embed_acc0)
                else:
                    acc0_f = jnp.zeros((emb.mask.shape[0], 4),
                                       acc0.dtype).at[emb.act].set(acc0)
                cells_f = cells_full if cells_full is not None \
                    else embed_cells(emb, cells)
                sys = assemble_structured4(acc_fn, flux_fn, cells_f,
                                           emb.topo,
                                           PrimaryState(u_f, flag_f),
                                           acc0_f, dt, aux=aux_f,
                                           fdata=fdata)
                sys = add_extra_faces4(sys, flux_fn, cells_f, emb,
                                       u_f, flag_f, aux_f,
                                       ex_fdata=ex_fd)
                sys = pin_inactive(sys, emb.mask)
                ws_sys = ws._replace(cell=emb.act[ws.cell])
                aq_cell_sys = emb.act[aq.cell]
                c4_wells = u_f[:, 3]
                u4_wells = u_f
                regs_wells = cells_f.regs
            else:
                sys = assemble_structured4(acc_fn, flux_fn, cells, faces,
                                           PrimaryState(u, flag), acc0,
                                           dt, aux=aux, fdata=fdata)
        elif poly is not None:
            from opm_autodiff_tpu.models import polymer as poly_mod

            sys = poly_mod.assemble_system4(fs, poly, cells, faces,
                                            PrimaryState(u, flag), acc0,
                                            dt)
        elif energy is not None:
            from opm_autodiff_tpu.models import energy as energy_mod

            sys = energy_mod.assemble_system4(fs, energy, cells, faces,
                                              PrimaryState(u, flag),
                                              acc0, dt)
        elif trans4 is not None:
            from opm_autodiff_tpu.models import transport4 as t4_mod

            sys = t4_mod.assemble_system4(fs, trans4, cells, faces,
                                          PrimaryState(u, flag), acc0,
                                          dt)
        else:
            from opm_autodiff_tpu.models import extbo as extbo_mod

            sys = extbo_mod.assemble_system4(fs, extbo, cells, faces,
                                             PrimaryState(u, flag), acc0,
                                             dt)
    elif emb is not None:
        u_f = u[emb.fill]
        flag_f = flag[emb.fill]
        if acc0.shape[0] == emb.mask.shape[0]:
            # pre-embedded box layout: the caller hoisted the scatter
            # out of the iteration (acc0 is constant per substep, and a
            # full-box f64 scatter costs ~4 ms at 50k cells on TPU)
            acc0_f = acc0
        else:
            acc0_f = jnp.zeros((emb.mask.shape[0], 3),
                               acc0.dtype).at[emb.act].set(acc0)
        # embed_cells is iteration-invariant (per-substep mob_mult /
        # static eps through the fill map): callers hoist it
        cells_f = cells_full if cells_full is not None \
            else embed_cells(emb, cells)
        sys, packed = assemble_structured(fs, cells_f, emb.topo,
                                          PrimaryState(u_f, flag_f),
                                          acc0_f, dt, want_packed=True,
                                          out_dtype=sys_dt)
        if packed is not None:
            # fused fast path: extras from the packed planes (one
            # gather, no PVT re-evaluation — see add_extra_faces_packed)
            sys = add_extra_faces_packed(sys, packed, emb)
        else:
            sys = add_extra_faces(sys, fs, cells_f, emb, u_f, flag_f)
        sys = pin_inactive(sys, emb.mask)
        inv_b_cells = sys.inv_b[emb.act]
        # linear-system-facing cell indices move to the full box; the
        # physics evaluations above stay on the compressed active arrays
        ws_sys = ws._replace(cell=emb.act[ws.cell])
        if msw is not None:
            msw_sys = msw._replace(perf_cell=emb.act[msw.perf_cell])
        aq_cell_sys = emb.act[aq.cell]
    elif isinstance(faces, StructuredTopology):
        sys, packed = assemble_structured(fs, cells, faces,
                                          PrimaryState(u, flag),
                                          acc0, dt, want_packed=True,
                                          out_dtype=sys_dt)
        inv_b_cells = sys.inv_b
    else:
        sys, packed = assemble_system(fs, cells, faces,
                                      PrimaryState(u, flag), acc0, dt,
                                      want_packed=True, out_dtype=sys_dt)
        inv_b_cells = sys.inv_b  # None on the XLA fallback path
    if use4 and wr is None:
        # deferred single-chip 4-DOF well assembly (see the use4 block
        # above): from the packed planes when the fused path produced
        # them and the explicit rho_conn is available, else the plain
        # intensive-based sweep
        # extra4 is None here by construction (the 4-eq extension
        # branches force the assembly paths where packed stays None and
        # carry the well_mob multiplier chain the packed planes lack) —
        # asserted explicitly so the invariant can't silently rot
        # (ADVICE r4)
        if packed is not None and rho_conn is not None and extra4 is None:
            wr = s4.well4_contributions_packed(
                packed, st.xw, ws, ws_sys.cell, mode, vfp_bank,
                rho_conn, well_f0, dt)
        else:
            wr = s4.well4_contributions(fs, u3, flag, st.xw, ws, mode,
                                        vfp_bank, cells.regs, well_mob,
                                        cells.eps, rho_conn, well_f0, dt)
    elif not use4 and wr is None:
        # deferred 1-DOF research-well assembly (same packed fast path)
        # extra4-is-None guard: same invariant as the std4 branch above
        if packed is not None and rho_conn is not None and extra4 is None:
            pr = wells_mod.well_perf_contributions_packed(
                packed, pbh, ws, ws_sys.cell, rho_conn)
        else:
            pr = wells_mod.well_perf_contributions(fs, u3, flag, pbh,
                                                   ws, cells.regs,
                                                   well_mob, cells.eps,
                                                   rho_conn)
        q_tot = pr.q_perf.sum(axis=1)
        mode = update_well_controls(ws, mode, pbh, q_tot, vfp_bank)
        wr = wells_mod.well_control_contributions(pr, ws, mode, pbh,
                                                  vfp_bank)
    if inv_b_cells is None:
        eps_ax = None if cells.eps is None else 0
        q_all = jax.vmap(intensive, in_axes=(None, 0, 0, 0, None, eps_ax))(
            fs, u3, flag, cells.regs, None, cells.eps)
        inv_b_cells = q_all.inv_b
    if extra4 is not None:
        res3 = w_api.apply_to_residual(sys.residual[:, :3], wr, ws_sys)
        d33 = w_api.apply_to_diag(sys.diag[:, :3, :3], wr, ws_sys)
        residual = jnp.concatenate([res3, sys.residual[:, 3:]], axis=1)
        diag = sys.diag.at[:, :3, :3].set(d33)
        if poly is not None:
            from opm_autodiff_tpu.models import polymer as poly_mod

            residual, diag = poly_mod.apply_wells4(residual, diag,
                                                   wr.q_perf, ws_sys,
                                                   c4_wells, poly)
        elif energy is not None:
            from opm_autodiff_tpu.models import energy as energy_mod

            residual, diag = energy_mod.apply_wells4(fs, residual, diag,
                                                     wr.q_perf, ws_sys,
                                                     c4_wells, energy)
        elif trans4 is not None:
            from opm_autodiff_tpu.models import transport4 as t4_mod

            residual, diag = t4_mod.apply_wells4(residual, diag,
                                                 wr.q_perf, ws_sys,
                                                 c4_wells, trans4)
        else:
            from opm_autodiff_tpu.models import extbo as extbo_mod

            pc = u4_wells[ws_sys.cell]
            rg = regs_wells[ws_sys.cell]
            xv_w, yv_w = jax.vmap(jax.vmap(
                lambda uu, rr: extbo_mod.solvent_fractions(
                    extbo, uu[0], uu[3], rr[1])))(pc, rg)
            residual, diag = extbo_mod.apply_wells4(residual, diag,
                                                    wr.q_perf, ws_sys,
                                                    xv_w, yv_w, extbo)
    else:
        residual = w_api.apply_to_residual(sys.residual, wr, ws_sys)
        diag = w_api.apply_to_diag(sys.diag, wr, ws_sys)
    # --- multisegment wells (reference: MultisegmentWell assemble +
    # Schur via duneB_/C_/D_, MultisegmentWellEval.hpp:272) ---
    mr = None
    if msw is not None:
        mr = msw_mod.msw_contributions(fs, u3, flag, st.msw_x, msw,
                                       regs=cells.regs,
                                       mob_mult=well_mob)
        if extra4 is not None:
            # mass block on [:, :3]; the 4th equation sees the MSW perf
            # rates as a source exactly like the standard wells above
            res3m = msw_mod.apply_to_residual(residual[:, :3], mr,
                                              msw_sys)
            d33m = msw_mod.apply_to_diag(diag[:, :3, :3], mr, msw_sys)
            residual = jnp.concatenate([res3m, residual[:, 3:]], axis=1)
            diag = diag.at[:, :3, :3].set(d33m)
            q_msw_perf = mr.q_perf_cell
            if energy is not None:
                from opm_autodiff_tpu.models import energy as energy_mod

                residual, diag = energy_mod.apply_wells4(
                    fs, residual, diag, q_msw_perf, None, c4_wells,
                    energy, t_inj=energy.msw_inj_temp,
                    cell_idx=msw_sys.perf_cell)
            elif poly is not None:
                from opm_autodiff_tpu.models import polymer as poly_mod

                residual, diag = poly_mod.apply_wells4(
                    residual, diag, q_msw_perf, None, c4_wells, poly,
                    inj_conc=poly.msw_inj_conc,
                    cell_idx=msw_sys.perf_cell)
            elif trans4 is not None:
                from opm_autodiff_tpu.models import transport4 as t4_mod

                residual, diag = t4_mod.apply_wells4(
                    residual, diag, q_msw_perf, None, c4_wells,
                    trans4, inj_conc=trans4.msw_inj_conc,
                    cell_idx=msw_sys.perf_cell)
        else:
            residual = msw_mod.apply_to_residual(residual, mr, msw_sys)
            diag = msw_mod.apply_to_diag(diag, mr, msw_sys)
    # --- aquifer water sources: q = a1 - a2 * p_datum; implicit in p
    # (reference BlackoilAquiferModel::addToSource) ---
    rho_w_g = fs.rho_ref(0)[0] * 9.80665
    q_aq = aquifer_rates(aq, u, rho_w_g)
    residual = residual.at[aq_cell_sys, 0].add(
        (-q_aq).astype(residual.dtype))
    diag = diag.at[aq_cell_sys, 0, 0].add(
        jnp.asarray(aq.a2, diag.dtype))

    # --- drift compensation: the previous substep's converged-but-
    # nonzero residual (times dt) re-enters as a source so the relaxed
    # tolerances do not accumulate mass-balance drift; capped like the
    # reference at 10x the nonlinear tolerance (EclProblem::source drift
    # handling, eclproblem.hh:1848-1874; capture :1127) ---
    if drift_vol is not None:
        rate = drift_vol / dt  # [Na,3] surface m3/s
        # a removal demand (positive corr) larger than the mass present
        # at the start of the substep cannot be absorbed (e.g. oil drift
        # in water-swept So=0 cells) and pins Newton at a nonzero-
        # residual fixed point just above the MB tolerance: cap it by
        # the stored surface volume (active layout even when acc0
        # arrived pre-embedded in the full box)
        acc0_act = (acc0[emb.act]
                    if emb is not None
                    and acc0.shape[0] == emb.mask.shape[0]
                    and acc0.shape[0] != drift_vol.shape[0]
                    else acc0)
        rate = jnp.minimum(rate, acc0_act / dt)
        vols = jnp.abs(rate) * dt
        if energy is not None:
            # the energy row is in J, not surface m3: normalize it to a
            # water-volume equivalent so it doesn't crush the cap
            vols = vols.at[:, 3].multiply(1.0 / energy.res_scale)
        comp_total = (vols / cells.pore_vol_ref[:, None]).sum(axis=1)
        cap = 10.0 * params.tol_cnv
        comp_scale = jnp.where(
            comp_total > cap, cap / jnp.maximum(comp_total, 1e-300), 1.0)
        corr = rate * comp_scale[:, None]
        if emb is not None:
            residual = residual.at[emb.act].add(
                corr.astype(residual.dtype))
        else:
            residual = residual + corr.astype(residual.dtype)

    # --- inactive-phase equation pinning (two-phase variants) ---
    if not (params.has_water and params.has_gas and params.has_oil):
        updates = {}
        for active, eq in ((params.has_water, 0), (params.has_gas, 2),
                           (params.has_oil, 1)):
            if active:
                continue
            # equation `eq` becomes the identity on its primary variable
            # (sw for water, x3 for gas, x3 = Rv for the oil equation in
            # gas-water runs) so the variable stays frozen
            residual = residual.at[:, eq].set(0.0)
            diag = diag.at[:, eq, :].set(0.0)
            var = 1 if eq == 0 else 2
            if eq == 1 and not params.has_gas:
                # single-phase water (flow_onephase.cpp): the gas row
                # already pins x3, so the oil row must freeze sw —
                # otherwise both pinned rows are the x3 identity and
                # the block is singular
                var = 1
            diag = diag.at[:, eq, var].set(1.0)
            for name in ("off_lr", "off_rl", "x_lr", "x_rl", "y_lr",
                         "y_rl", "z_lr", "z_rl", "ex_lr", "ex_rl"):
                if hasattr(sys, name):
                    band = updates.get(name, getattr(sys, name))
                    if band is None:
                        continue
                    updates[name] = band.at[..., eq, :].set(0.0)
        sys = sys._replace(**updates)
    sys = sys._replace(residual=residual, diag=diag)

    # --- convergence (on the active rows) ---
    residual_act = residual[emb.act] if emb is not None else residual
    res_conv = residual_act
    inv_b_conv = inv_b_cells
    if poly is not None:
        # polymer CNV/MB: the mass residual normalized by PLYMAX gives a
        # water-volume-rate equivalent, scaled by the water B factor
        # like the reference's contiPolymerEqIdx row
        res_conv = residual_act.at[:, 3].multiply(1.0 / poly.c_max)
        inv_b_conv = jnp.concatenate([inv_b_cells, inv_b_cells[:, :1]],
                                     axis=1)
    elif energy is not None:
        # energy CNV/MB: the J/s residual scaled to a water-volume-rate
        # equivalent (reference: the energy equation's own relaxed
        # tolerance in EclNewtonMethod; res_scale ~ rho_w cp_w T)
        res_conv = residual_act.at[:, 3].multiply(1.0 / energy.res_scale)
        inv_b_conv = jnp.concatenate(
            [inv_b_cells, jnp.ones_like(inv_b_cells[:, :1])], axis=1)
    elif trans4 is not None:
        # brine/foam CNV/MB: the component residual normalized by the
        # table span gives a carrier-volume-rate equivalent, scaled by
        # the carrier's B factor (reference: contiBrineEqIdx /
        # contiFoamEqIdx rows)
        res_conv = residual_act.at[:, 3].multiply(1.0 / trans4.c_max)
        inv_b_carrier = jnp.where(trans4.phase_mask[None, :] > 0.0,
                                  inv_b_cells, 0.0).sum(axis=1,
                                                        keepdims=True)
        inv_b_conv = jnp.concatenate([inv_b_cells, inv_b_carrier],
                                     axis=1)
    elif extbo is not None:
        # extbo CNV/MB: the solvent row is already a surface-volume
        # rate (gas-like stream); normalize by the composition span and
        # scale by the gas B factor (reference: contiZfracEqIdx row)
        res_conv = residual_act.at[:, 3].multiply(1.0 / extbo.z_max)
        inv_b_conv = jnp.concatenate([inv_b_cells, inv_b_cells[:, 2:3]],
                                     axis=1)
    well_err4 = None
    well_err_vec = None
    if use4:
        # flux rows scaled by field-average B factors (reference:
        # StandardWellEval.cpp:767 getWellConvergence). The 1e-6 floor
        # keeps a cell whose linearly-extrapolated 1/B crossed zero at
        # unphysical pressure from blowing the average up to 1e30 and
        # stalling well convergence on roundoff-size residuals.
        b_avg = (1.0 / jnp.maximum(inv_b_cells, 1e-6)).mean(axis=0)
        well_err_vec = s4.well_convergence(wr, ws, mode, b_avg)
        well_err4 = well_err_vec.max()
    cnv, mb, well_err, relaxed_ok, converged, failed = _convergence(
        params, fs, cells, res_conv, inv_b_conv, dt, wr, ws, mode,
        well_err_ext=well_err4)
    if msw is not None:
        msw_scale = jnp.where(
            msw.is_injector,
            jnp.where(jnp.isfinite(msw.inj_rate), msw.inj_rate, 1e-3),
            jnp.select([msw.ctrl_mode == wells_mod.CTRL_ORAT,
                        msw.ctrl_mode == wells_mod.CTRL_WRAT,
                        msw.ctrl_mode == wells_mod.CTRL_GRAT,
                        msw.ctrl_mode == wells_mod.CTRL_LRAT],
                       [msw.orat, msw.wrat, msw.grat, msw.lrat],
                       default=1e-3))
        msw_scale = jnp.where(jnp.isfinite(msw_scale) & (msw_scale > 0),
                              msw_scale, 1e-3)
        msw_err = msw_mod.msw_convergence(mr, msw, msw_scale)
        well_err = jnp.maximum(well_err, msw_err)
        converged = converged & (msw_err < params.tol_wells * 10)
        failed = failed | ~jnp.isfinite(msw_err)

    # --- linear solve with well Schur complement fused in ---
    if extra4 is not None:
        rhs = (-residual).at[:, :3].add(
            w_api.schur_rhs(residual[:, :3], wr, ws_sys))
        if mr is not None:
            rhs = rhs.at[:, :3].add(
                msw_mod.schur_rhs(mr, msw_sys, residual[:, :3]))

            def extra_mv(x):
                y3 = (w_api.schur_matvec(wr, ws_sys, x[:, :3])
                      + msw_mod.schur_matvec(mr, msw_sys, x[:, :3]))
                return jnp.pad(y3, ((0, 0), (0, 1)))
        else:
            def extra_mv(x):
                y3 = w_api.schur_matvec(wr, ws_sys, x[:, :3])
                return jnp.pad(y3, ((0, 0), (0, 1)))
    elif msw is not None:
        rhs = -residual + w_api.schur_rhs(residual, wr, ws_sys) \
            + msw_mod.schur_rhs(mr, msw_sys, residual)

        def extra_mv(x):
            return (w_api.schur_matvec(wr, ws_sys, x)
                    + msw_mod.schur_matvec(mr, msw_sys, x))
    else:
        rhs = -residual + w_api.schur_rhs(residual, wr, ws_sys)
        extra_mv = partial(w_api.schur_matvec, wr, ws_sys)
    reuse = params.linear_setup_reuse == "substep"
    lin = solve_linear(sys, rhs,
                       extra_matvec=extra_mv,
                       tol=params.linear_tol, maxiter=params.linear_maxiter,
                       precond=params.linear_precond,
                       cpr_inner_iters=params.linear_cpr_inner,
                       method=params.linear_method,
                       setup=st.lin_setup if reuse else None,
                       want_setup=reuse)
    lin_setup_out = None
    if reuse:
        lin, lin_setup_out = lin
    dx = lin.x
    # a diverged/NaN linear solve is a hard iteration failure (the
    # reference throws LinearSolverProblem and the timestepper chops;
    # SURVEY.md §5): zero the update and raise the failed flag
    dx_ok = jnp.all(jnp.isfinite(dx))
    failed = jnp.logical_or(failed, ~dx_ok)
    dx = jnp.where(dx_ok, dx, jnp.zeros_like(dx))
    # oscillation relaxation: the host loop dampens the update when the
    # residual history oscillates (reference: NonlinearSolverEbos
    # stabilizeNonlinearUpdate :315, dampen with relaxMax 0.5)
    dx = dx * jnp.asarray(relax, dx.dtype)
    dx3 = dx[:, :3] if extra4 is not None else dx
    xw_new = st.xw
    if use4:
        dxw = s4.recover_xw_update(wr, ws_sys, dx3)
        dxw = jnp.where(jnp.isfinite(dxw), dxw, 0.0)
        xw_new = s4.chop_xw_update(st.xw, dxw, ws)
    else:
        dpbh = wells_mod.recover_pbh_update(wr, ws_sys, dx3)
        dpbh = jnp.where(jnp.isfinite(dpbh), dpbh, 0.0)

    # --- chopped update + switching (active rows) ---
    dx_act = dx[emb.act] if emb is not None else dx
    u_new, flag_new = _chop_and_update(params, fs, u, flag, dx_act,
                                       cells.regs[:, 1], x3_cap)
    if poly is not None:
        from opm_autodiff_tpu.models import polymer as poly_mod

        c_new = poly_mod.chop_c_update(poly, u[:, 3], dx_act[:, 3])
        u_new = jnp.concatenate([u_new, c_new[:, None]], axis=1)
    elif energy is not None:
        from opm_autodiff_tpu.models import energy as energy_mod

        t_new = energy_mod.chop_T_update(energy, u[:, 3], dx_act[:, 3])
        u_new = jnp.concatenate([u_new, t_new[:, None]], axis=1)
    elif trans4 is not None:
        from opm_autodiff_tpu.models import transport4 as t4_mod

        c_new = t4_mod.chop_c_update(trans4, u[:, 3], dx_act[:, 3])
        u_new = jnp.concatenate([u_new, c_new[:, None]], axis=1)
    elif extbo is not None:
        from opm_autodiff_tpu.models import extbo as extbo_mod

        z_new = extbo_mod.chop_z_update(extbo, u[:, 3], dx_act[:, 3])
        u_new = jnp.concatenate([u_new, z_new[:, None]], axis=1)
    if use4:
        pbh_new = xw_new[:, 3]
    else:
        dpbh = jnp.clip(dpbh, -5e6, 5e6)  # DbhpMaxRel-style damping
        pbh_new = jnp.clip(pbh + dpbh, 1e5, 2e9)

    msw_x_new = st.msw_x
    q_msw = None
    if msw is not None:
        dxw = msw_mod.recover_update(
            mr, msw_sys, dx[:, :3] if extra4 is not None else dx)
        dxw = jnp.where(jnp.isfinite(dxw), dxw, 0.0)
        msw_x_new = msw_mod.chop_msw_update(st.msw_x, dxw, msw)
        q_msw = mr.q_perf_cell.sum(axis=1)  # [M,3] into cells

    info = IterationInfo(cnv=cnv, mb=mb, well_err=well_err,
                         relaxed_ok=relaxed_ok, converged=converged,
                         failed=failed, linear_iters=lin.iterations,
                         linear_ok=lin.converged,
                         well_err_by_well=well_err_vec)
    new_st = NewtonState(u=u_new, flag=flag_new, pbh=pbh_new,
                         active_mode=mode, msw_x=msw_x_new, xw=xw_new,
                         lin_setup=lin_setup_out)
    return new_st, info, (q_tot, wr.q_perf, q_msw, residual_act), q_aq


newton_iteration = jax.jit(newton_iteration_impl,
                           static_argnames=("params",))

_conn_rho = jax.jit(wells_mod.connection_densities)
_embed_cells_jit = jax.jit(embed_cells)
_solve_well_eq = jax.jit(s4.solve_well_eq,
                         static_argnames=("max_iter",))


@dataclasses.dataclass
class NewtonReport:
    converged: bool
    iterations: int
    linear_iterations: int
    failed: bool
    cnv: np.ndarray = None
    mb: np.ndarray = None
    well_err: float = 0.0
    # device [Na,3] residual of the last assembled iteration — the
    # drift-compensation capture (reference: drift_, eclproblem.hh:1127)
    residual: object = None
    # per-well scaled residuals [W] of the last iteration (std4 path) —
    # problematic-well identification for the timestepper shut fallback
    well_errors: np.ndarray = None


def _embed_acc0(faces, acc0):
    """Pre-embed acc0 into the full box ONCE per substep. acc0 is
    constant across the Newton loop, and the full-box f64 scatter costs
    ~4 ms at 50k cells on TPU — newton_iteration_impl detects the box
    layout by shape and skips its own embed."""
    if (isinstance(faces, EmbeddedTopology)
            and acc0.shape[0] != faces.mask.shape[0]):
        return jnp.zeros((faces.mask.shape[0], acc0.shape[1]),
                         acc0.dtype).at[faces.act].set(acc0)
    return acc0


def _wellsets_close(a: WellSet, b: WellSet, rtol: float = 1e-3) -> bool:
    """True when every float leaf of two same-structure WellSets agrees
    to ``rtol`` relative — the group re-apportioning has numerically
    converged and further NUPCOL updates are no-ops (used by the hybrid
    device handoff; see newton_solve)."""
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        x = np.asarray(x)
        y = np.asarray(y)
        if x.dtype.kind not in "fc":
            if not np.array_equal(x, y):
                return False
            continue
        denom = np.maximum(np.abs(x), np.abs(y))
        if (np.abs(x - y) > rtol * denom + 1e-30).any():
            return False
    return True


def newton_solve(params: NewtonParams, fs, cells, faces, st: NewtonState,
                 ws: WellSet, acc0, dt, verbose: bool = False,
                 aq: AquiferDevice | None = None, vfp_bank=None, msw=None,
                 x3_cap=None, drift_vol=None, poly=None, energy=None,
                 trans4=None, extbo=None, group_update=None,
                 nupcol: int = 12, device_after: int | None = None):
    """Host-driven Newton loop (reference: NonlinearSolverEbos::step).

    Returns (final_state, report, q_tot). The state BEFORE the final
    update is returned on convergence (the converged check applies to the
    assembled residual of the incoming state, matching the reference where
    convergence is evaluated pre-update each iteration).

    ``group_update(q_tot) -> WellSet | None`` re-apportions group
    targets from the current iterate's well rates; it is invoked before
    every assembly while the iteration index is < ``nupcol``, then the
    apportioning freezes (reference: BlackoilWellModel::assemble
    updating group controls for iterationIdx < nupcol,
    BlackoilWellModel_impl.hpp:828; NUPCOL consumed from the deck).
    Host-side only — the returned WellSet must keep array shapes, so
    the jitted iteration does not retrace.

    ``device_after``: once the iteration index reaches this value AND
    the group apportioning is done moving — frozen by NUPCOL
    (it >= nupcol) or numerically stabilized (the re-apportioned
    targets changed < 0.1% between consecutive iterations, after which
    further updates are no-ops to solver precision) — hand the
    remainder of the substep to the single-dispatch device loop
    (VERDICT r4 next #4: group decks otherwise pay the per-iteration
    host bubble the device loop was built to remove). Explicit
    quantities, relaxation, and oscillation history carry over, so the
    continuation is the same algorithm minus the (inactive) group hook.
    """
    total_lin = 0
    last_q = None
    last_q_perf = None
    last_q_aq = None
    last_q_msw = None
    # setup reuse is per-substep: iteration 0 always (re)builds
    st = st._replace(lin_setup=None)
    acc0 = _embed_acc0(faces, acc0)
    if aq is None:
        aq = empty_device()
    # oscillation detection over the per-phase CNV history (reference:
    # NonlinearSolverEbos::detectOscillations :278 — an equation
    # oscillates when its residual rose after falling; relaxation backs
    # the update off toward relaxMax 0.5 and recovers when smooth)
    hist: list[np.ndarray] = []
    relax = 1.0
    # explicit connection densities once per substep (reference:
    # calculateExplicitQuantities on iteration 0,
    # BlackoilWellModel_impl.hpp:824)
    u3_host = (st.u[:, :3]
               if (poly is not None or energy is not None
                   or trans4 is not None or extbo is not None) else st.u)
    # iteration-invariant embedded cell statics, hoisted out of the
    # per-iteration device programs (~1.5 ms/iter of gathers at 50k)
    cells_full = (_embed_cells_jit(faces, cells)
                  if isinstance(faces, EmbeddedTopology) else None)
    rho_conn = _conn_rho(fs, u3_host, st.flag, st.pbh, ws, cells.regs)
    well_f0 = None
    if st.xw is not None:
        # inner well solve with the reservoir frozen (reference:
        # prepareTimeStep -> solveWellEqUntilConverged, MaxWelleqIter=30)
        xw0 = _solve_well_eq(fs, u3_host, st.flag, st.xw, ws,
                             st.active_mode, vfp_bank, cells.regs,
                             cells.mob_mult, cells.eps, rho_conn,
                             jnp.asarray(dt))
        st = st._replace(xw=xw0, pbh=xw0[:, 3])
        # wellbore-storage base fractions F0 (StandardWellEval.cpp:710)
        well_f0 = jax.vmap(s4._surface_fractions)(xw0[:, 1], xw0[:, 2])
    groups_stable = False
    for it in range(params.max_iter + 1):
        # NUPCOL-gated per-iteration group re-apportioning: rates from
        # the previous iteration feed the group chains, then freeze
        if group_update is not None and 1 <= it < nupcol \
                and last_q is not None:
            ws_new = group_update(np.asarray(last_q))
            if ws_new is not None:
                groups_stable = _wellsets_close(ws, ws_new)
                ws = ws_new
        # NUPCOL hybrid handoff: groups frozen (>= nupcol) or
        # stabilized -> the remaining iterations run as ONE device
        # program
        if (device_after is not None and it >= max(device_after, 1)
                and (group_update is None or it >= nupcol
                     or groups_stable)):
            # [f0, f1, f2] = newest-first oscillation history, zero-
            # padded when fewer than 3 host iterations ran
            neq = hist[-1].shape[0] if hist else 3
            rows = [np.asarray(hist[-k]) if len(hist) >= k
                    else np.zeros(neq) for k in (1, 2, 3)]
            prep = (rho_conn, well_f0, jnp.asarray(relax),
                    jnp.asarray(np.stack(rows)), it)
            st2, rep2, qs2, q_aq2 = newton_solve_device(
                params, fs, cells, faces, st._replace(lin_setup=None),
                ws, acc0, dt, aq=aq, vfp_bank=vfp_bank, msw=msw,
                x3_cap=x3_cap, drift_vol=drift_vol, poly=poly,
                energy=energy, trans4=trans4, extbo=extbo, prep=prep)
            rep2.linear_iterations += total_lin
            return st2, rep2, qs2, q_aq2
        new_st, info, (q_tot, q_perf, q_msw, res_act), q_aq = \
            newton_iteration(
                params, fs, cells, faces, st, ws, acc0, jnp.asarray(dt), aq,
                vfp_bank, msw, x3_cap, jnp.asarray(relax), rho_conn,
                drift_vol, well_f0, poly, energy, trans4, extbo,
                cells_full=cells_full)
        last_res = res_act
        # reference detectOscillations (NonlinearSolverEbos.hpp:278-309):
        # a phase oscillates when the residual returned to its value two
        # iterations ago (|F0-F2|/F0 < relaxRelTol 0.2) after a large
        # excursion (|F0-F1|/F0 > 0.2); >= 2 phases -> dampen
        hist.append(np.asarray(info.mb))
        if len(hist) >= 3:
            f0, f1, f2 = hist[-1], hist[-2], hist[-3]
            denom = np.where(f0 != 0.0, f0, 1.0)
            d1 = np.abs((f0 - f2) / denom)
            d2 = np.abs((f0 - f1) / denom)
            osc = int(((d1 < 0.2) & (d2 > 0.2)).sum()) >= 2
            relax = max(relax - 0.1, 0.5) if osc else min(relax + 0.1, 1.0)
        last_q_aq = q_aq
        last_q_perf = q_perf
        last_q_msw = q_msw
        failed = bool(info.failed)
        conv = bool(info.converged) and it >= params.min_iter
        total_lin += int(info.linear_iters)
        last_q = q_tot
        if verbose:
            print(f"  newton {it}: cnv={np.asarray(info.cnv)} "
                  f"mb={np.asarray(info.mb)} well={float(info.well_err):.2e} "
                  f"lin={int(info.linear_iters)}")
        werr = (np.asarray(info.well_err_by_well)
                if info.well_err_by_well is not None else None)
        # convergence is evaluated on the ASSEMBLED (pre-update)
        # residual, so it takes precedence over a failed update: a
        # converged state stands even when the (unnecessary) linear
        # solve broke down on its near-zero rhs
        if conv:
            # carry over any control-mode change from the last assembly
            st = st._replace(active_mode=new_st.active_mode,
                             lin_setup=None)
            return st, NewtonReport(True, it, total_lin, False,
                                    np.asarray(info.cnv), np.asarray(info.mb),
                                    float(info.well_err), last_res, werr), \
                (last_q, last_q_perf, last_q_msw), last_q_aq
        if failed:
            st = st._replace(lin_setup=None)
            return st, NewtonReport(False, it, total_lin, True,
                                    np.asarray(info.cnv),
                                    np.asarray(info.mb),
                                    float(info.well_err), last_res, werr), \
                (last_q, last_q_perf, last_q_msw), last_q_aq
        st = new_st
    st = st._replace(lin_setup=None)
    werr = (np.asarray(info.well_err_by_well)
            if info.well_err_by_well is not None else None)
    return st, NewtonReport(False, params.max_iter, total_lin, False,
                            np.asarray(info.cnv), np.asarray(info.mb),
                            float(info.well_err), last_res, werr), \
        (last_q, last_q_perf, last_q_msw), last_q_aq


# ---------------------------------------------------------------------------
# Whole-substep device loop
# ---------------------------------------------------------------------------

def _state_fields(st: NewtonState):
    """The result-facing leaves of NewtonState (drops lin_setup, whose
    pytree structure changes between iteration 0 and 1 under setup
    reuse — it never outlives a substep anyway)."""
    return (st.u, st.flag, st.pbh, st.active_mode, st.msw_x, st.xw)


def _newton_substep_device_impl(params: NewtonParams, fs, cells, faces,
                                st: NewtonState, ws: WellSet, acc0, dt,
                                aq, vfp_bank, msw, x3_cap, drift_vol,
                                poly, energy, trans4, extbo, prep=None):
    """The whole substep — inner well solve + Newton loop with
    oscillation relaxation and convergence exit — as ONE device
    program (lax.while_loop over full iterations).

    The host loop (``newton_solve``) dispatches one device program per
    Newton iteration and syncs on the convergence flags — a
    host-roundtrip bubble per iteration that the reference never pays
    (its loop is all C++; SURVEY.md §1 L4). This variant removes it:
    the only host sync per substep is the final result. Semantics match
    newton_solve exactly (same iteration bodies, same oscillation
    dampening from NonlinearSolverEbos.hpp:278, same pre-update
    convergence rule); it is selected by the simulator whenever no
    per-iteration host logic (NUPCOL group re-apportioning, verbose
    tracing) is requested.

    ``prep`` hands over a mid-substep continuation (the NUPCOL hybrid,
    VERDICT r4 next #4): (rho_conn, well_f0, relax0, hist0 [3,neq],
    it0) from a host loop that ran the group-updating iterations —
    explicit quantities stay frozen at their substep-start values and
    the oscillation history/relaxation carries over, so the device
    remainder is iteration-for-iteration the host loop minus the group
    hook (which NUPCOL has already frozen)."""
    extra4 = next((x for x in (poly, energy, trans4, extbo)
                   if x is not None), None)
    u3 = st.u[:, :3] if extra4 is not None else st.u
    acc0 = _embed_acc0(faces, acc0)
    # iteration-invariant embedded cell statics, hoisted out of the
    # while_loop body (the gathers cost ~1.5 ms/iter at 50k cells)
    cells_full = (embed_cells(faces, cells)
                  if isinstance(faces, EmbeddedTopology) else None)
    if prep is not None:
        rho_conn, well_f0, relax0, hist0, it0 = prep
    else:
        relax0, hist0, it0 = jnp.asarray(1.0), None, 0
        rho_conn = wells_mod.connection_densities(fs, u3, st.flag,
                                                  st.pbh, ws, cells.regs)
        well_f0 = None
        if st.xw is not None:
            xw0 = s4.solve_well_eq(fs, u3, st.flag, st.xw, ws,
                                   st.active_mode, vfp_bank, cells.regs,
                                   cells.mob_mult, cells.eps, rho_conn,
                                   dt)
            st = st._replace(xw=xw0, pbh=xw0[:, 3])
            well_f0 = jax.vmap(s4._surface_fractions)(xw0[:, 1],
                                                      xw0[:, 2])

    def one_iter(st_c, relax_c):
        return newton_iteration_impl(params, fs, cells, faces, st_c, ws,
                                     acc0, dt, aq, vfp_bank, msw, x3_cap,
                                     relax_c, rho_conn, drift_vol,
                                     well_f0, poly, energy, trans4,
                                     extbo, cells_full=cells_full)

    def outcome(st_pre, new_st, info, it):
        """(stop, conv, result fields) under the host loop's rules:
        convergence is pre-update, so the assembled state stands (with
        the control modes the assembly switched to); a failed linear
        solve freezes the pre-update state; otherwise carry on."""
        conv = jnp.logical_and(info.converged, it >= params.min_iter)
        stop = jnp.logical_or(conv, info.failed)
        keep = _state_fields(st_pre._replace(
            active_mode=jnp.where(conv, new_st.active_mode,
                                  st_pre.active_mode)))
        step = _state_fields(new_st)
        res_f = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(stop, (1,) * a.ndim), a, b), keep, step)
        return stop, conv, res_f

    # iteration 0 (or the handoff iteration it0) unrolled: under setup
    # reuse its lin_setup output changes the carry structure
    # (None -> arrays)
    it0 = jnp.asarray(it0)
    new_st, info, (q_tot, q_perf, q_msw, res_act), q_aq = one_iter(
        st, relax0)
    neq = info.mb.shape[0]
    if hist0 is None:
        hist = jnp.stack([info.mb, jnp.zeros(neq), jnp.zeros(neq)])
    else:
        hist = jnp.concatenate([info.mb[None], hist0[:2]], axis=0)
    stop0, conv0, res_f = outcome(st, new_st, info, it0)
    outs = (q_tot, q_perf, q_msw, q_aq, res_act, info.cnv, info.mb,
            info.well_err, info.well_err_by_well)
    carry = (it0, new_st, res_f, stop0, conv0, info.failed,
             relax0, hist, info.linear_iters, outs)

    def cond(c):
        it, _st, _rf, done, *_ = c
        return jnp.logical_and(~done, it < params.max_iter)

    def body(c):
        (it, st_c, _res_f, _done, _conv, _failed, relax, hist, tot_lin,
         _outs) = c
        it = it + 1
        # reference detectOscillations (NonlinearSolverEbos.hpp:278):
        # dampen when >= 2 equations returned to their value two
        # iterations back after a large excursion
        denom = jnp.where(hist[0] != 0.0, hist[0], 1.0)
        d1 = jnp.abs((hist[0] - hist[2]) / denom)
        d2 = jnp.abs((hist[0] - hist[1]) / denom)
        osc = ((d1 < 0.2) & (d2 > 0.2)).sum() >= 2
        # the host loop's history holds 3 entries only after iteration
        # 2, so the first dampening applies from iteration 3 on
        relax = jnp.where(
            it >= 3,
            jnp.where(osc, jnp.maximum(relax - 0.1, 0.5),
                      jnp.minimum(relax + 0.1, 1.0)), relax)
        new_st, info, (q_tot, q_perf, q_msw, res_act), q_aq = one_iter(
            st_c, relax)
        hist = jnp.concatenate([info.mb[None], hist[:2]], axis=0)
        stop, conv, res_f = outcome(st_c, new_st, info, it)
        outs = (q_tot, q_perf, q_msw, q_aq, res_act, info.cnv, info.mb,
                info.well_err, info.well_err_by_well)
        return (it, new_st, res_f, stop, conv, info.failed, relax, hist,
                tot_lin + info.linear_iters, outs)

    (it, _st, res_f, _done, conv, failed, _relax, _hist, tot_lin,
     outs) = jax.lax.while_loop(cond, body, carry)
    return res_f, it, tot_lin, conv, failed, outs


_newton_substep_device = jax.jit(_newton_substep_device_impl,
                                 static_argnames=("params",))


def newton_solve_device(params: NewtonParams, fs, cells, faces,
                        st: NewtonState, ws: WellSet, acc0, dt,
                        aq: AquiferDevice | None = None, vfp_bank=None,
                        msw=None, x3_cap=None, drift_vol=None, poly=None,
                        energy=None, trans4=None, extbo=None, prep=None):
    """newton_solve twin running the whole substep on device (one
    dispatch, one host sync). No per-iteration host hooks: callers with
    NUPCOL group updates use newton_solve(device_after=nupcol), which
    hands the post-NUPCOL remainder here via ``prep``; verbose tracing
    uses the plain host loop."""
    if aq is None:
        aq = empty_device()
    st = st._replace(lin_setup=None)
    res_f, it, tot_lin, conv, failed, outs = _newton_substep_device(
        params, fs, cells, faces, st, ws, acc0, jnp.asarray(dt), aq,
        vfp_bank, msw, x3_cap, drift_vol, poly, energy, trans4, extbo,
        prep=prep)
    (q_tot, q_perf, q_msw, q_aq, res_act, cnv, mb, well_err, werr) = outs
    u, flag, pbh, mode, msw_x, xw = res_f
    st_out = NewtonState(u=u, flag=flag, pbh=pbh, active_mode=mode,
                         msw_x=msw_x, xw=xw, lin_setup=None)
    rep = NewtonReport(bool(conv), int(it), int(tot_lin), bool(failed),
                       np.asarray(cnv), np.asarray(mb), float(well_err),
                       res_act,
                       np.asarray(werr) if werr is not None else None)
    return st_out, rep, (q_tot, q_perf, q_msw), q_aq
