"""Fully-implicit brine/foam: a carrier-phase component as the 4th
block equation.

Rebuild of the reference's implicit brine and foam couplings
(flow/flow_ebos_brine.cpp, flow/flow_ebos_foam.cpp dispatched by
Main.hpp; physics from opm-models blackoilbrinemodules /
blackoilfoammodules: the component concentration is conserved in its
carrier phase's storage, transported with the upwinded carrier flux,
and feeds back on the carrier's mobility — water viscosity from the
PVTWSALT table for brine, the FOAMMOB gas-mobility reduction for foam).
The reference solves these inside its 4x4-block fully-implicit system;
this module does the same on the face-list (BSR) layout, exactly like
models/polymer.py:

  unknowns per cell:   u = (po, sw, x3, c)          [N,4]
  equations per cell:  R = (water, oil, gas, component)
  blocks:              diag [N,4,4], off-diag [F,4,4]

One module covers both extensions because they differ only in (a) which
phase carries the component and (b) the mobility-factor table; the
carrier is a one-hot ``phase_mask`` leaf in the pytree so the same
traced kernels serve both (no retrace between brine and foam decks
beyond the usual shape-driven compile).

The component rows/columns come from the SAME vmap(jacfwd) sweeps as
the black-oil rows, so the couplings d(carrier flux)/dc (viscosified
water / foam-thinned gas) and d(component flux)/d(po,sw,x3) are exact.
Well coupling is value-exact with d(q)/dc dropped (quasi-Newton), like
polymer.

The operator-split transport (models/components.py) remains the
fallback (SimulatorOptions.brine_implicit / foam_implicit = False) and
the solvent implementation. Feature parity with the split model is
deliberate: brine feedback covers water viscosity (not Bw/density —
documented in io/validation.py), foam covers the FOAMMOB reduction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.models.blackoil import (accumulation, face_flux,
                                              intensive)
from opm_autodiff_tpu.props.tables import interp1d

NUM_EQ4 = 4


class TlMix(NamedTuple):
    """Todd-Longstaff mixing data for the implicit solvent variant
    (reference: blackoilsolventmodules' effective viscosities; the
    immiscible PVDS + TLMIXPAR + SSFN core — MISCIBLE decks route to
    the operator-split model which owns the full MISC/PMISC/MSFN
    machinery)."""

    pvds_p: jnp.ndarray   # [K] pressure nodes
    pvds_mu: jnp.ndarray  # [K] solvent viscosity
    ssfn_c: jnp.ndarray   # [K2] solvent-fraction nodes
    ssfn_kg: jnp.ndarray  # [K2] gas relperm multiplier
    ssfn_ks: jnp.ndarray  # [K2] solvent relperm multiplier
    omega: jnp.ndarray    # TLMIXPAR mixing exponent


class TransportImplicit(NamedTuple):
    """Device data for an implicit carrier-phase component (pytree).

    ``mob_m`` is the multiplicative factor applied to the carrier
    phase's mobility at concentration node ``mob_c`` (brine:
    mu_w(salt_ref)/mu_w(c) <= 1 from PVTWSALT col 3; foam: the FOAMMOB
    reduction in [1e-3, 1]). Tables ride [R,K] banks per PVTNUM region.
    With ``tl`` set (solvent), the factor is the Todd-Longstaff
    gas-stream mobility multiplier instead and depends on pressure too.
    """

    mob_c: jnp.ndarray      # [R,K] concentration nodes
    mob_m: jnp.ndarray      # [R,K] carrier mobility factors
    phase_mask: jnp.ndarray  # [3] one-hot carrier phase (w=0, g=2)
    c_max: jnp.ndarray      # scalar: chop/convergence scale
    inj_conc: jnp.ndarray   # [W] WSALT/WFOAM/WSOLVENT injection values
    # [M] injection values of multisegment wells (MSW x variant
    # composition; None when the deck has no WELSEGS)
    msw_inj_conc: jnp.ndarray | None = None
    tl: TlMix | None = None

    # ------------------------------------------------------------------
    def mob_factor(self, c, reg=0):
        """Carrier-phase mobility factor at concentration c (clamped to
        (0, inf); tables are end-clamped). Table variant only — the TL
        (solvent) factor needs pressure: use ``carrier_factor``."""
        from opm_autodiff_tpu.props.pvt import row

        return jnp.maximum(
            interp1d(c, row(self.mob_c, reg), row(self.mob_m, reg),
                     extrapolate=False), 1e-3)


def tl_factor(fs, tl: TlMix, c, p, reg=0):
    """Todd-Longstaff total gas-stream mobility multiplier on
    krg(Sg_total)/mu_g: mu_g * (kg/mu_g_eff + ks/mu_s_eff) with the
    quarter-power mixed viscosity (matches the split implementation,
    models/components.py mobility_multipliers, sans MISC scaling)."""
    c = jnp.clip(c, 0.0, 1.0)
    mu_g = fs.gas_viscosity(p, 0.0, reg)
    mu_s = jnp.maximum(
        interp1d(p, tl.pvds_p, tl.pvds_mu, extrapolate=False), 1e-12)
    w = tl.omega
    inv4 = (1.0 - c) * mu_g ** -0.25 + c * mu_s ** -0.25
    mu_mix = inv4 ** -4.0
    mu_g_eff = jnp.maximum(mu_g ** (1.0 - w) * mu_mix ** w, 1e-12)
    mu_s_eff = jnp.maximum(mu_s ** (1.0 - w) * mu_mix ** w, 1e-12)
    kg = jnp.clip(interp1d(c, tl.ssfn_c, tl.ssfn_kg,
                           extrapolate=False), 0.0, 1.0)
    ks = jnp.clip(interp1d(c, tl.ssfn_c, tl.ssfn_ks,
                           extrapolate=False), 0.0, 1.0)
    return jnp.maximum(mu_g * (kg / mu_g_eff + ks / mu_s_eff), 1e-3)


def carrier_factor(fs, trans: TransportImplicit, c, p, reg=0):
    """The carrier-phase mobility factor — TL (pressure-dependent) for
    solvent, table interp otherwise. Static branch on the pytree
    structure."""
    if trans.tl is not None:
        return tl_factor(fs, trans.tl, c, p, reg)
    return trans.mob_factor(c, reg)


def build_brine_implicit(state, geo, n_wells: int = 0
                         ) -> tuple[TransportImplicit, np.ndarray]:
    """Brine: salt conserved in water, water viscosity from PVTWSALT
    (reference: blackoilbrinemodules saltConcentration + PVTWSALT mu
    column). Returns (device data, initial salt per active cell from
    SALTVD or zeros)."""
    ps = state.components["PVTWSALT"]
    tab = np.asarray(ps["table"])
    raw_nodes = tab[:, 0]
    raw_mu = np.maximum(tab[:, 3], 1e-12)
    # the reference (and the split model) interpolate mu(c) linearly and
    # take mu0/mu; interpolating the precomputed FACTOR linearly is a
    # different interpolant between nodes (1/x vs x). Resample the
    # factor densely from the linear-in-mu curve so the implicit and
    # split paths share the same physics to ~1e-4.
    nodes = np.linspace(raw_nodes[0], raw_nodes[-1],
                        max(64, 8 * len(raw_nodes)))
    mu = np.interp(nodes, raw_nodes, raw_mu)
    factor = raw_mu[0] / mu  # viscosity rise -> mobility drop
    n = geo.num_active
    if "SALTVD" in state.components:
        t = np.asarray(state.components["SALTVD"][0])
        c0 = np.interp(np.asarray(geo.depth), t[:, 0], t[:, 1])
    else:
        c0 = np.zeros(n)
    trans = TransportImplicit(
        mob_c=jnp.asarray(nodes)[None, :],
        mob_m=jnp.asarray(factor)[None, :],
        phase_mask=jnp.asarray([1.0, 0.0, 0.0]),
        c_max=jnp.asarray(max(float(nodes[-1]), 1e-30)),
        inj_conc=jnp.zeros(max(n_wells, 1)))
    return trans, c0


def build_foam_implicit(state, geo, n_wells: int = 0
                        ) -> tuple[TransportImplicit, np.ndarray]:
    """Foam: the surfactant conserved in gas, gas mobility times the
    FOAMMOB reduction (reference: blackoilfoammodules, TRANSPORT_PHASE
    GAS default). Returns (device data, zero initial concentration)."""
    tabs = [np.asarray(t) for t in state.components["FOAMMOB"]]
    k = max(t.shape[0] for t in tabs)
    nodes = np.empty((len(tabs), k))
    vals = np.empty((len(tabs), k))
    for i, t in enumerate(tabs):
        m = t.shape[0]
        nodes[i, :m] = t[:, 0]
        vals[i, :m] = np.clip(t[:, 1], 1e-3, 1.0)
        if m < k:
            nodes[i, m:] = t[-1, 0] + np.arange(1, k - m + 1)
            vals[i, m:] = vals[i, m - 1]
    n = geo.num_active
    trans = TransportImplicit(
        mob_c=jnp.asarray(nodes),
        mob_m=jnp.asarray(vals),
        phase_mask=jnp.asarray([0.0, 0.0, 1.0]),
        c_max=jnp.asarray(max(float(nodes[0, -1]), 1e-30)),
        inj_conc=jnp.zeros(max(n_wells, 1)))
    return trans, np.zeros(n)


def build_solvent_implicit(state, geo, n_wells: int = 0
                           ) -> tuple[TransportImplicit, np.ndarray]:
    """Immiscible Todd-Longstaff solvent: the solvent fraction of the
    gas stream conserved in gas, the gas-stream mobility multiplied by
    the TL factor (reference: flow/flow_ebos_solvent.cpp + opm-models
    blackoilsolventmodules, the immiscible PVDS+TLMIXPAR+SSFN core).
    Semantics match the operator-split model (models/components.py):
    the black-oil gas equation conserves the combined gas+solvent
    stream at the gas surface basis and ``c`` in [0,1] is the solvent
    fraction. MISCIBLE decks route to the split model, which owns
    MISC/PMISC/MSFN. Returns (device data, zero initial fraction)."""
    comp = state.components
    t = np.asarray(comp["PVDS"][0])
    if "SSFN" in comp:
        ts = np.asarray(comp["SSFN"][0])
        ssfn_c, ssfn_kg, ssfn_ks = ts[:, 0], ts[:, 1], ts[:, 2]
    else:
        # default: linear split of the gas-stream relperm
        ssfn_c = np.asarray([0.0, 1.0])
        ssfn_kg = np.asarray([1.0, 0.0])
        ssfn_ks = np.asarray([0.0, 1.0])
    tl = TlMix(
        pvds_p=jnp.asarray(t[:, 0]),
        pvds_mu=jnp.asarray(np.maximum(t[:, 2], 1e-12)),
        ssfn_c=jnp.asarray(ssfn_c),
        ssfn_kg=jnp.asarray(ssfn_kg),
        ssfn_ks=jnp.asarray(ssfn_ks),
        omega=jnp.asarray(float(comp.get("TLMIXPAR", 1.0))))
    n = geo.num_active
    trans = TransportImplicit(
        mob_c=jnp.asarray([0.0, 1.0])[None, :],
        mob_m=jnp.ones((1, 2)),
        phase_mask=jnp.asarray([0.0, 0.0, 1.0]),
        c_max=jnp.asarray(1.0),
        inj_conc=jnp.zeros(max(n_wells, 1)),
        tl=tl)
    return trans, np.zeros(n)


# ----------------------------------------------------------------------
# 4-equation scalar kernels (vmapped + jacfwd'd like models/polymer.py)
# ----------------------------------------------------------------------

def _mob_with_factor(fs, trans: TransportImplicit, mob_mult, c, p, reg):
    """Fold the carrier mobility factor into the [5] dynamic channel
    vector. The select is a where on the finite channels [0:3] only —
    the inf miscibility channels [3:5] pass through a concatenation so
    their tangents stay clean (see polymer._mob_with_polymer)."""
    f = carrier_factor(fs, trans, c, p, reg)
    if mob_mult is None:
        m3 = jnp.where(trans.phase_mask > 0.0, f, 1.0)
        return jnp.concatenate([m3, jnp.full((2,), jnp.inf)])
    m3 = jnp.where(trans.phase_mask > 0.0, mob_mult[:3] * f, mob_mult[:3])
    return jnp.concatenate([m3, mob_mult[3:]])


def make_acc4(fs, trans: TransportImplicit):
    """acc_fn(u4, flag, pv_ref, regs, eps) -> [4]; row 3 is the
    component mass per surface carrier volume basis: pv * mult * s_c /
    B_c * c (reference: blackoilbrinemodules::addStorage)."""

    def acc4(u4, flag, pv_ref, regs, eps):
        base = accumulation(fs, u4[:3], flag, pv_ref, regs, eps)  # [3]
        c = u4[3]
        q = intensive(fs, u4[:3], flag, regs, None, eps)
        sv = jnp.where(trans.phase_mask > 0.0, q.sat * q.inv_b, 0.0).sum()
        # degenerate-carrier regularization: where the carrier phase
        # vanishes (a gas-free cell under foam) the component equation
        # has a ZERO diagonal — the concentration is physically
        # undetermined and the 4x4 block is singular (NaN in the block
        # inversion). A tiny storage floor (1e-8 pore volumes) makes
        # the equation "c holds its value" there, exactly conserving
        # the slightly-augmented mass (vc + eps) c.
        vc = pv_ref * fs.rock.mult(u4[0], regs[1]) * sv + 1e-8 * pv_ref
        return jnp.concatenate([base, (vc * c)[None]])

    return acc4


def make_flux4(fs, trans: TransportImplicit):
    """flux_fn(uL4, uR4, flagL, flagR, trans_f, gdz, regsL, regsR,
    thpres, mobL, mobR, epsL, epsR) -> [4]; factor-adjusted carrier flux
    for rows 0-2, upwinded component advection for row 3."""

    def flux4(uL4, uR4, flagL, flagR, trans_f, gdz, regsL, regsR, thpres,
              mobL, mobR, epsL, epsR):
        cL, cR = uL4[3], uR4[3]
        mobL_eff = _mob_with_factor(fs, trans, mobL, cL, uL4[0], regsL[1])
        mobR_eff = _mob_with_factor(fs, trans, mobR, cR, uR4[0], regsR[1])
        base = face_flux(fs, uL4[:3], uR4[:3], flagL, flagR, trans_f,
                         gdz, regsL, regsR, thpres, mobL_eff, mobR_eff,
                         epsL, epsR)  # [3]
        fc = jnp.where(trans.phase_mask > 0.0, base, 0.0).sum()
        c_up = jnp.where(fc >= 0.0, cL, cR)
        return jnp.concatenate([base, (c_up * fc)[None]])

    return flux4


def accumulation_all4(fs, trans: TransportImplicit, u4, flag,
                      pore_vol_ref, regs, eps=None):
    """Vmapped 4-wide accumulation [N,4] (the simulator's acc0 sweep)."""
    acc4 = make_acc4(fs, trans)
    eps_ax = None if eps is None else 0
    return jax.vmap(acc4, in_axes=(0, 0, 0, 0, eps_ax))(
        u4, flag, pore_vol_ref, regs, eps)


def assemble_system4(fs, trans: TransportImplicit, cells, faces, state,
                     acc0, dt):
    """4-equation BSR assembly (mirrors polymer.assemble_system4;
    reference: the 4x4 block linearization of flow_ebos_brine/_foam)."""
    from opm_autodiff_tpu.models.assembler import BsrSystem

    u4, flag = state.u, state.flag
    acc4 = make_acc4(fs, trans)
    flux4 = make_flux4(fs, trans)

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
# Well coupling (value-exact, d q / dc dropped — quasi-Newton)
# ----------------------------------------------------------------------

def apply_wells4(residual4, diag4, q_perf, ws, c_cells,
                 trans: TransportImplicit, inj_conc=None,
                 cell_idx=None):
    """Component source terms from the standard wells: injection (q_c >
    0 in the carrier phase) carries WSALT/WFOAM; production removes at
    the cell concentration — implicit in c (diagonal entry)."""
    cells_wp = ws.cell if cell_idx is None else cell_idx
    flat_cells = cells_wp.reshape(-1)
    qc = (q_perf * trans.phase_mask[None, None, :]).sum(axis=-1)  # [W,P]
    if inj_conc is None:
        inj_conc = trans.inj_conc
    inj = jnp.maximum(qc, 0.0) * inj_conc[:, None]
    prod = jnp.minimum(qc, 0.0) * c_cells[cells_wp]
    q_comp = (inj + prod).reshape(-1)
    residual4 = residual4.at[flat_cells, 3].add(-q_comp)
    diag4 = diag4.at[flat_cells, 3, 3].add(
        -jnp.minimum(qc, 0.0).reshape(-1))
    return residual4, diag4


def chop_c_update(trans: TransportImplicit, c, dc):
    """Appleyard-style chop: limit the step to 20% of the table span per
    iteration, clamp into [0, 1.1 * c_max]."""
    lim = 0.2 * trans.c_max
    dc = jnp.clip(dc, -lim, lim)
    return jnp.clip(c + dc, 0.0, 1.1 * trans.c_max)
