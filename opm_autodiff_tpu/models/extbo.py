"""Fully-implicit extended black-oil (extbo): the solvent zFraction as
the 4th block equation.

Rebuild of the reference's extbo variant (flow/flow_ebos_extbo.cpp,
dispatched by Main.hpp:309 on Phase::ZFRACTION; physics from opm-models'
blackoilextbomodules): an extended black-oil model where a solvent
component (typically CO2) dissolves into BOTH the oil and gas phases and
shifts their PVT behavior. The solvent fraction z is an extra primary
variable with its own conservation equation, and the oil/gas formation
volume factors, saturated Rs/Rv and viscosities become functions of
(p, z) tabulated by the PVTSOL keyword.

PVTSOL table schema (one table per PVTNUM region; each record is one
composition branch, like PVTO's Rs branches):

    z_frac   p  Bo  Bg  Rs  Rv  XVOL  YVOL  mu_o  mu_g
             p  Bo  Bg  Rs  Rv  XVOL  YVOL  mu_o  mu_g ... /

where XVOL / YVOL are the solvent volume fractions (surface basis) of
the oil / gas phase streams at that composition and pressure. The z=0
branch must tabulate the solvent-free behavior (XVOL=YVOL=0); the model
then reduces EXACTLY to standard black-oil at z=0 because all PVT
dependence is applied as factors relative to the z=0 branch:

    inv_Bo(p, Rs, z) = fs.oil_inv_b(p, Rs) * Bo(p,0)/Bo(p,z)
    Rs_sat(p, z)     = fs.rs_sat(p)        * Rs(p,z)/Rs(p,0)
    mu_o(p, Rs, z)   = fs.oil_viscosity()  * mu_o(p,z)/mu_o(p,0)
    (and the gas-phase analogs)

so the full variable-switching / undersaturated machinery of the core
black-oil model (models/blackoil.intensive) keeps working and the PVTSOL
table only has to resolve the composition dependence — the same division
of labor as the reference, where the extbo module's multipliers plug
into the BlackOilFluidSystem evaluations.

Conservation (surface-volume basis) follows the combined-stream
convention of the implicit Todd-Longstaff solvent (models/transport4.py
build_solvent_implicit): the oil/gas equations conserve their FULL
surface streams (solvent included) with (p, z)-shifted PVT, and the z
equation tracks the solvent content riding those streams:

    a_w = pv * sw/Bw
    a_o = pv * (so/Bo + Rv sg/Bg)          (z-shifted Bo/Bg/Rs/Rv)
    a_g = pv * (sg/Bg + Rs so/Bo)
    a_s = pv * (so/Bo xv + sg/Bg yv)       <- the z equation

with the z-row face flux weighting the upwinded phase streams by
(xv, yv). Keeping the oil/gas rows full-stream means the standard wells
contribute with their EXACT Jacobians (no destabilizing value-only row
splits — a (1-f)-scaled residual against a full-magnitude well Jacobian
measurably diverges); only the z row's well source is value-exact with
d(q)/dz dropped (quasi-Newton, like models/polymer.py / transport4.py).
WSOLVENT gives the solvent fraction of a gas injector's stream.

Layouts: the 4x4 system assembles on the banded fast path (via
newton.py's generic structured4 dispatch) and the face-list (BSR)
layout (assemble_system4 below), exactly like polymer/energy/brine/foam.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.models.blackoil import FLAG_RV, FLAG_SG, intensive

NUM_EQ4 = 4


class ExtboImplicit(NamedTuple):
    """Device data for the implicit extbo model (pytree).

    Factor grids ride [R, Z, K] banks (region, composition node,
    pressure node) resampled onto a shared regular (z, p) lattice at
    build time; bilinear interpolation on device. ``fac`` stacks the 6
    PVT factor channels (bo, bg, rs, rv, mu_o, mu_g) as [R, 6, Z, K];
    ``xv``/``yv`` are the absolute solvent volume fractions [R, Z, K].
    """

    z_nodes: jnp.ndarray   # [Z] composition nodes (shared lattice)
    p_nodes: jnp.ndarray   # [K] pressure nodes (shared lattice)
    fac: jnp.ndarray       # [R,6,Z,K] PVT factors vs the z=0 branch
    xv: jnp.ndarray        # [R,Z,K] solvent fraction of the oil stream
    yv: jnp.ndarray        # [R,Z,K] solvent fraction of the gas stream
    z_max: jnp.ndarray     # scalar: chop/convergence scale
    inj_frac: jnp.ndarray  # [W] WSOLVENT fraction per well


def _interp2(z_nodes, p_nodes, grid, z, p):
    """Bilinear grid[..., Z, K] at (z, p); end-clamped both axes."""
    zc = jnp.clip(z, z_nodes[0], z_nodes[-1])
    pc = jnp.clip(p, p_nodes[0], p_nodes[-1])
    iz = jnp.clip(jnp.searchsorted(z_nodes, zc, side="right") - 1,
                  0, z_nodes.shape[0] - 2)
    ip = jnp.clip(jnp.searchsorted(p_nodes, pc, side="right") - 1,
                  0, p_nodes.shape[0] - 2)
    tz = (zc - z_nodes[iz]) / (z_nodes[iz + 1] - z_nodes[iz])
    tp = (pc - p_nodes[ip]) / (p_nodes[ip + 1] - p_nodes[ip])
    g00 = grid[..., iz, ip]
    g01 = grid[..., iz, ip + 1]
    g10 = grid[..., iz + 1, ip]
    g11 = grid[..., iz + 1, ip + 1]
    return ((1 - tz) * ((1 - tp) * g00 + tp * g01)
            + tz * ((1 - tp) * g10 + tp * g11))


def pvt_factors(ex: ExtboImplicit, p, z, reg=0):
    """[6] PVT factor vector (bo, bg, rs, rv, mu_o, mu_g) at (p, z)."""
    from opm_autodiff_tpu.props.pvt import row

    return _interp2(ex.z_nodes, ex.p_nodes, row(ex.fac, reg), z, p)


def solvent_fractions(ex: ExtboImplicit, p, z, reg=0):
    """(xv, yv) solvent volume fractions of the oil/gas streams."""
    from opm_autodiff_tpu.props.pvt import row

    xv = _interp2(ex.z_nodes, ex.p_nodes, row(ex.xv, reg), z, p)
    yv = _interp2(ex.z_nodes, ex.p_nodes, row(ex.yv, reg), z, p)
    return jnp.clip(xv, 0.0, 0.99), jnp.clip(yv, 0.0, 0.99)


def build_extbo_implicit(state, geo, n_wells: int = 0
                         ) -> tuple[ExtboImplicit, np.ndarray]:
    """Device tables from the parsed PVTSOL component (io/state.py).

    Each region's branches are resampled onto the union composition /
    pressure lattice; factors are taken relative to the z=0 branch so a
    z=0 run is exactly standard black-oil. Returns (device data, zero
    initial z per active cell)."""
    regions = state.components["PVTSOL"]
    z_union = np.unique(np.concatenate(
        [np.asarray(r["z"], float) for r in regions]))
    p_union = np.unique(np.concatenate(
        [np.asarray(br[0], float) for r in regions for br in r["branches"]]))
    if z_union[0] > 0.0:
        raise ValueError("PVTSOL must tabulate a z=0 branch "
                         "(the solvent-free baseline)")
    nz, npp = len(z_union), len(p_union)
    nreg = len(regions)
    fac = np.ones((nreg, 6, nz, npp))
    xv = np.zeros((nreg, nz, npp))
    yv = np.zeros((nreg, nz, npp))
    for ri, r in enumerate(regions):
        zb = np.asarray(r["z"], float)
        # per-branch resample onto p_union: cols bo,bg,rs,rv,xv,yv,muo,mug
        vals = np.empty((len(zb), 8, npp))
        for bi, br in enumerate(r["branches"]):
            p = np.asarray(br[0], float)
            for ci in range(8):
                vals[bi, ci] = np.interp(p_union, p,
                                         np.asarray(br[1 + ci], float))
        # then resample composition onto z_union
        full = np.empty((8, nz, npp))
        for ci in range(8):
            for pi in range(npp):
                full[ci, :, pi] = np.interp(z_union, zb, vals[:, ci, pi])
        base = full[:, 0:1, :]  # the z=0 branch
        # factors vs baseline; guard zero baselines (e.g. Rs=0 dead oil)
        for ci, ch in enumerate((0, 1, 2, 3)):   # bo, bg, rs, rv
            b = np.where(np.abs(base[ch]) > 1e-300, base[ch], 1.0)
            f = np.where(np.abs(base[ch]) > 1e-300, full[ch] / b, 1.0)
            fac[ri, ci] = np.clip(f, 1e-3, 1e3)
        for ci, ch in enumerate((6, 7)):          # mu_o, mu_g
            b = np.where(base[ch] > 1e-300, base[ch], 1.0)
            fac[ri, 4 + ci] = np.clip(full[ch] / b, 1e-3, 1e3)
        xv[ri] = np.clip(full[4], 0.0, 0.99)
        yv[ri] = np.clip(full[5], 0.0, 0.99)
    ex = ExtboImplicit(
        z_nodes=jnp.asarray(z_union),
        p_nodes=jnp.asarray(p_union),
        fac=jnp.asarray(fac),
        xv=jnp.asarray(xv),
        yv=jnp.asarray(yv),
        z_max=jnp.asarray(max(float(z_union[-1]), 1e-30)),
        inj_frac=jnp.zeros(max(n_wells, 1)))
    return ex, np.zeros(geo.num_active)


# ----------------------------------------------------------------------
# z-aware intensive quantities
# ----------------------------------------------------------------------

def intensive_z(fs, ex: ExtboImplicit, u4, flag, regs, mob_mult=None,
                eps=None):
    """Per-cell intensive quantities with PVTSOL (p, z) PVT factors
    folded in, plus (xv, yv). Mirrors blackoil.intensive with

        inv_bo /= fac_bo, rs_sat *= fac_rs, mu_o *= fac_muo (etc.)

    applied through the mob_mult channel mechanism where possible and
    by direct post-scaling of the Intensive pytree otherwise."""
    u3, z = u4[:3], u4[3]
    pr = regs[1]
    f = pvt_factors(ex, u3[0], z, pr)  # [6] bo,bg,rs,rv,muo,mug
    q = intensive(fs, u3, flag, regs, mob_mult, eps)
    inv_b = q.inv_b * jnp.stack([jnp.ones(()), 1.0 / f[0], 1.0 / f[1]])
    # saturated-composition shifts: the flag machinery already decided
    # rs/rv; scale the SATURATED values only (an undersaturated cell's
    # rs is the primary variable x3 and must pass through untouched)
    is_sat_rs = (flag == FLAG_SG) | (flag == FLAG_RV)
    rs = jnp.where(is_sat_rs, q.rs * f[2], q.rs)
    rv = jnp.where(flag != FLAG_RV, q.rv * f[3], q.rv)
    # density follows 1/B and the composition shift
    rho_ref = fs.rho_ref(pr)
    rho_o = (rho_ref[1] + rs * rho_ref[2]) * inv_b[1]
    rho_g = (rho_ref[2] + rv * rho_ref[1]) * inv_b[2]
    rho = jnp.stack([q.rho[0], rho_o, rho_g])
    # viscosity factors divide the oil/gas mobilities
    mob = q.mob * jnp.stack([jnp.ones(()), 1.0 / f[4], 1.0 / f[5]])
    xvv, yvv = solvent_fractions(ex, u3[0], z, pr)
    q = q._replace(inv_b=inv_b, rs=rs, rv=rv, rho=rho, mob=mob)
    return q, xvv, yvv


def make_acc4(fs, ex: ExtboImplicit):
    """acc_fn(u4, flag, pv_ref, regs, eps) -> [4] surface volumes with
    the oil/gas streams split into their solvent shares (docstring
    above; reference: blackoilextbomodules' addStorage)."""

    def acc4(u4, flag, pv_ref, regs, eps):
        q, xvv, yvv = intensive_z(fs, ex, u4, flag, regs, None, eps)
        pv = pv_ref * fs.rock.mult(u4[0], regs[1])
        sw, so, sg = q.sat[0], q.sat[1], q.sat[2]
        vo = so * q.inv_b[1]   # oil-phase surface stream
        vg = sg * q.inv_b[2]   # gas-phase surface stream
        aw = pv * sw * q.inv_b[0]
        ao = pv * (vo + q.rv * vg)
        ag = pv * (vg + q.rs * vo)
        # tiny storage floor: z is undetermined where no hydrocarbon
        # stream exists (cf. transport4.make_acc4's degenerate-carrier
        # regularization)
        a_s = pv * (vo * xvv + vg * yvv) + 1e-8 * pv_ref * u4[3]
        return jnp.stack([aw, ao, ag, a_s])

    return acc4


def make_flux4(fs, ex: ExtboImplicit):
    """flux_fn(uL4, uR4, flagL, flagR, trans_f, gdz, regsL, regsR,
    thpres, mobL, mobR, epsL, epsR) -> [4].

    Reimplements the TPFA upwinded flux of blackoil.face_flux (semantics
    of EclTransFluxModule::calculateGradients_, eclfluxmodule.hh:212-356)
    because the extbo partition needs the raw per-phase surface fluxes
    before the Rs/Rv mixing — with upwinded xv/yv splitting the oil/gas
    streams into their solvent shares."""

    def flux4(uL4, uR4, flagL, flagR, trans_f, gdz, regsL, regsR, thpres,
              mobL, mobR, epsL, epsR):
        qL, xvL, yvL = intensive_z(fs, ex, uL4, flagL, regsL, mobL, epsL)
        qR, xvR, yvR = intensive_z(fs, ex, uR4, flagR, regsR, mobR, epsR)
        rho_avg = 0.5 * (qL.rho + qR.rho)
        dphi = (qL.p - qR.p) - rho_avg * gdz
        dphi = jnp.where(
            thpres > 0.0,
            jnp.sign(dphi) * jnp.maximum(jnp.abs(dphi) - thpres, 0.0),
            dphi)
        upwind_L = dphi >= 0.0
        mob_up = jnp.where(upwind_L, qL.mob, qR.mob)
        inv_b_up = jnp.where(upwind_L, qL.inv_b, qR.inv_b)
        rs_up = jnp.where(upwind_L[1], qL.rs, qR.rs)
        rv_up = jnp.where(upwind_L[2], qL.rv, qR.rv)
        xv_up = jnp.where(upwind_L[1], xvL, xvR)
        yv_up = jnp.where(upwind_L[2], yvL, yvR)
        surf = trans_f * mob_up * dphi * inv_b_up   # per-phase streams
        fw = surf[0]
        fo = surf[1] + rv_up * surf[2]
        fg = surf[2] + rs_up * surf[1]
        fz = surf[1] * xv_up + surf[2] * yv_up
        return jnp.stack([fw, fo, fg, fz])

    return flux4


def accumulation_all4(fs, ex: ExtboImplicit, u4, flag, pore_vol_ref,
                      regs, eps=None):
    """Vmapped 4-wide accumulation [N,4] (the simulator's acc0 sweep)."""
    acc4 = make_acc4(fs, ex)
    eps_ax = None if eps is None else 0
    return jax.vmap(acc4, in_axes=(0, 0, 0, 0, eps_ax))(
        u4, flag, pore_vol_ref, regs, eps)


def assemble_system4(fs, ex: ExtboImplicit, cells, faces, state, acc0,
                     dt):
    """4-equation BSR assembly (mirrors transport4.assemble_system4)."""
    from opm_autodiff_tpu.models.assembler import BsrSystem

    u4, flag = state.u, state.flag
    acc4 = make_acc4(fs, ex)
    flux4 = make_flux4(fs, ex)

    def acc_vj(u, fl, pv, rg, ep):
        def f(uu):
            a = acc4(uu, fl, pv, rg, ep)
            return a, a
        jac, val = jax.jacfwd(f, has_aux=True)(u)
        return val, jac

    eps_ax = None if cells.eps is None else 0
    acc, acc_jac = jax.vmap(acc_vj, in_axes=(0, 0, 0, 0, eps_ax))(
        u4, flag, cells.pore_vol_ref, cells.regs, cells.eps)

    residual = (acc - acc0) / dt
    diag = acc_jac / dt

    lf, rt = faces.left, faces.right
    uL, uR = u4[lf], u4[rt]

    def flux_vj(uLv, uRv, fl, fr, tr, gz, rl, rr, th, ml, mr, el, er):
        def f(u8):
            fx = flux4(u8[:4], u8[4:], fl, fr, tr, gz, rl, rr, th,
                       ml, mr, el, er)
            return fx, fx
        jac, val = jax.jacfwd(f, has_aux=True)(jnp.concatenate([uLv, uRv]))
        return val, jac[:, :4], jac[:, 4:]

    epsL = None if cells.eps is None else cells.eps[lf]
    epsR = None if cells.eps is None else cells.eps[rt]
    flux, jac_l, jac_r = jax.vmap(
        flux_vj,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, eps_ax, eps_ax))(
        uL, uR, flag[lf], flag[rt], faces.trans, faces.gdz,
        cells.regs[lf], cells.regs[rt], faces.thpres,
        cells.mob_mult[lf], cells.mob_mult[rt], epsL, epsR)

    ell = getattr(faces, "ell_face", None)
    if ell is not None:
        from opm_autodiff_tpu.models.assembler import _pad_face0

        sgn = jnp.where(faces.ell_left, 1.0, -1.0)
        residual = residual + (sgn[..., None]
                               * _pad_face0(flux)[ell]).sum(axis=1)
        dsel = jnp.where(faces.ell_left[..., None, None],
                         _pad_face0(jac_l)[ell], -_pad_face0(jac_r)[ell])
        diag = diag + dsel.sum(axis=1)
    else:
        residual = residual.at[lf].add(flux)
        residual = residual.at[rt].add(-flux)
        diag = diag.at[lf].add(jac_l)
        diag = diag.at[rt].add(-jac_r)

    return BsrSystem(residual=residual, diag=diag, off_lr=jac_r,
                     off_rl=-jac_l, left=lf, right=rt, acc_jac=acc_jac,
                     ell_face=ell,
                     ell_nbr=getattr(faces, "ell_nbr", None),
                     ell_left=getattr(faces, "ell_left", None))


# ----------------------------------------------------------------------
# Well coupling (value-exact, d q / dz dropped — quasi-Newton)
# ----------------------------------------------------------------------

def apply_wells4(residual4, diag4, q_perf, ws, xv_w, yv_w,
                 ex: ExtboImplicit):
    """Solvent source terms from the standard wells.

    WSOLVENT injectors carry fraction ``inj_frac`` of solvent in their
    gas stream (reference: WellInterface's solvent handling under
    has_zFraction, StandardWell_impl.hpp:250); producers remove solvent
    with the produced streams at the perforated cell's (xv, yv) —
    ``xv_w``/``yv_w`` [W,P] precomputed by the caller at the current
    iterate. The oil/gas rows conserve the FULL streams (combined-
    stream convention, module docstring), so only the z row is
    touched."""
    flat_cells = ws.cell.reshape(-1)
    q_o = q_perf[..., 1]
    q_g = q_perf[..., 2]
    # injection: fraction of the positive gas stream is solvent
    inj = jnp.maximum(q_g, 0.0) * ws.is_injector[:, None] \
        * ex.inj_frac[:, None]
    # production: the negative streams carry the cell's fractions
    prod = jnp.minimum(q_o, 0.0) * xv_w + jnp.minimum(q_g, 0.0) * yv_w
    q_z = (inj + prod).reshape(-1)
    residual4 = residual4.at[flat_cells, 3].add(-q_z)
    return residual4, diag4


def well_mu_factors(fs, ex: ExtboImplicit, u4, regs):
    """[N,3] viscosity-driven mobility factors for the wells at the
    current iterate's z (value-exact, d q/dz dropped)."""

    def one(u, r):
        f = pvt_factors(ex, u[0], u[3], r[1])
        return jnp.stack([jnp.ones(()), 1.0 / f[4], 1.0 / f[5]])

    return jax.vmap(one)(u4, regs)


def chop_z_update(ex: ExtboImplicit, z, dz):
    """Appleyard-style chop: 20% of the composition span per iteration,
    clamped into [0, z_max]."""
    lim = 0.2 * ex.z_max
    dz = jnp.clip(dz, -lim, lim)
    return jnp.clip(z + dz, 0.0, ex.z_max)
