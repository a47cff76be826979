"""Fully-implicit polymer: 4th conservation equation in the block system.

Rebuild of the reference's implicit polymer coupling
(flow/flow_ebos_polymer.cpp dispatched by Main.hpp:240; physics from
opm-models blackoilpolymermodules: storage with dead-pore exclusion and
Langmuir adsorption, transport riding the upwinded water flux, water
mobility divided by the PLYVISC viscosity multiplier times the
adsorption-scaled RRF permeability reduction). The reference solves the
polymer equation inside its 4x4-block fully-implicit system; this module
does the same on the face-list (BSR) layout:

  unknowns per cell:   u = (po, sw, x3, c)          [N,4]
  equations per cell:  R = (water, oil, gas, polymer)
  blocks:              diag [N,4,4], off-diag [F,4,4]

The polymer rows/columns are produced by the SAME vmap(jacfwd) sweeps as
the black-oil rows (models/assembler.py is block-size generic), so the
coupling d(water flux)/dc (thickened water) and d(polymer flux)/d(po,sw)
are exact. Well coupling is value-exact with the d(q_w)/dc off-diagonal
dropped (quasi-Newton; the well water mobility still sees the current
iterate's concentration through the folded multiplier).

The operator-split transport (models/components.py) remains the
implementation for brine/foam/solvent and the polymer fallback
(SimulatorOptions.polymer_implicit=False); tests/test_polymer_implicit.py
documents the split-vs-implicit deltas (VERDICT round-1 item 8).
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


class PolymerImplicit(NamedTuple):
    """Device data for the implicit polymer model (pytree).

    PLYVISC/PLYADS ride [R,K] banks per PVTNUM region (reference:
    TABDIMS-banked polymer tables); the PLYROCK constants are gathered
    to per-cell arrays by SATNUM at build. ``ads_prev`` is the
    committed adsorbed mass per rock mass — the no-desorption floor
    (PLYROCK ads_index 1).
    """

    visc_c: jnp.ndarray   # [R,K] PLYVISC concentration nodes
    visc_m: jnp.ndarray   # [R,K] viscosity multipliers
    ads_c: jnp.ndarray    # [R,K2] PLYADS nodes
    ads_a: jnp.ndarray    # [R,K2] adsorbed mass per rock mass
    rock_mass: jnp.ndarray  # [N] rock mass per cell (kg)
    # committed adsorption floor [N]: PLYROCK ads_index 1 means no
    # desorption — the simulator advances this to the committed ads(c)
    # after each substep; with desorption allowed it stays zero and the
    # max() below is a no-op (table values are nonnegative)
    ads_prev: jnp.ndarray
    dead_pore: jnp.ndarray  # [N] dead pore volume fraction (PLYROCK)
    rrf: jnp.ndarray        # [N] residual resistance factor
    max_ads: jnp.ndarray    # [N] maximum adsorption
    c_max: jnp.ndarray      # scalar: PLYMAX (chop/clamp scale)
    inj_conc: jnp.ndarray   # [W] WPOLYMER injection concentrations
    # [M] WPOLYMER concentrations of multisegment wells (MSW x variant
    # composition; None when the deck has no WELSEGS)
    msw_inj_conc: jnp.ndarray | None = None

    # ------------------------------------------------------------------
    def visc_mult(self, c, reg=0):
        """PLYVISC viscosity multiplier (>= 1) for PVTNUM region reg."""
        from opm_autodiff_tpu.props.pvt import row

        return jnp.maximum(
            interp1d(c, row(self.visc_c, reg), row(self.visc_m, reg),
                     extrapolate=False), 1.0)

    def adsorption(self, c, ads_prev=0.0, reg=0):
        """Langmuir-table adsorbed mass per rock mass at concentration c
        (instantaneous equilibrium, the reference's PLYADS model), with
        the committed no-desorption floor."""
        from opm_autodiff_tpu.props.pvt import row

        a = interp1d(jnp.maximum(c, 0.0), row(self.ads_c, reg),
                     row(self.ads_a, reg), extrapolate=False)
        return jnp.maximum(a, ads_prev)

    def rk(self, c, ads_prev=0.0, reg=0, rrf=None, max_ads=None):
        """Adsorption-scaled permeability reduction (RRF). ``rrf`` /
        ``max_ads`` are the CELL's PLYROCK values (scalars in the
        per-cell kernels; defaults use cell 0 for hand-built tests)."""
        rrf = self.rrf[0] if rrf is None else rrf
        max_ads = self.max_ads[0] if max_ads is None else max_ads
        ads = self.adsorption(c, ads_prev, reg)
        frac = jnp.where(max_ads > 0.0,
                         jnp.clip(ads / jnp.maximum(max_ads, 1e-300),
                                  0.0, 1.0), 0.0)
        return 1.0 + (rrf - 1.0) * frac

    def water_mob_factor(self, c, ads_prev=0.0, reg=0, rrf=None,
                         max_ads=None):
        """Water mobility divisor: mob_w -> mob_w * factor, factor =
        1 / (visc_mult(c) * RK(ads(c)))."""
        return 1.0 / (self.visc_mult(c, reg)
                      * self.rk(c, ads_prev, reg, rrf, max_ads))


def _bank(tables: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Pad per-region 2-column tables to one [R,K] node/value bank
    (nodes extended strictly increasing, values constant — matches the
    end-clamped interpolation)."""
    k = max(t.shape[0] for t in tables)
    nodes = np.empty((len(tables), k))
    vals = np.empty((len(tables), k))
    for i, t in enumerate(tables):
        n = t.shape[0]
        nodes[i, :n] = t[:, 0]
        vals[i, :n] = t[:, 1]
        if n < k:
            nodes[i, n:] = t[-1, 0] + np.arange(1, k - n + 1)
            vals[i, n:] = t[-1, 1]
    return nodes, vals


def build_polymer_implicit(comp_tables: dict, geo, n_wells: int = 0
                           ) -> tuple[PolymerImplicit, bool]:
    """Construct from the parsed deck component tables (io/state.py
    layout, same fields the split ComponentModel reads). Returns
    (device data, no_desorption flag) — the flag (PLYROCK ads_index 1,
    from the first record) tells the simulator to advance ``ads_prev``
    after each substep."""
    visc_tabs = [np.asarray(t) for t in comp_tables["PLYVISC"]]
    rocks = list(comp_tables.get("PLYROCK") or [{}])
    if "PLYADS" in comp_tables:
        ads_tabs = [np.asarray(t) for t in comp_tables["PLYADS"]]
    else:
        ads_tabs = [np.asarray([[0.0, 0.0], [1.0, 0.0]])]
    plymax = comp_tables.get("PLYMAX")  # scalar (io/state.py:1429)
    c_max = (float(plymax) if plymax is not None
             else max(float(t[-1, 0]) for t in visc_tabs))
    n = geo.num_active
    # PLYROCK constants per cell (records bank by SATNUM)
    satnum = getattr(geo, "satnum", None)
    sreg = (np.zeros(n, int) if satnum is None
            else np.minimum(np.asarray(satnum), len(rocks) - 1))
    dead_pore = np.asarray([float(r.get("dead_pore", 0.0))
                            for r in rocks])[sreg]
    rrf = np.asarray([float(r.get("rrf", 1.0)) for r in rocks])[sreg]
    max_ads = np.asarray([float(r.get("max_ads", 0.0))
                          for r in rocks])[sreg]
    rho_rock = np.asarray([float(r.get("rock_density", 0.0))
                           for r in rocks])[sreg]
    rock_mass = (rho_rock * (1.0 - np.asarray(geo.poro))
                 * np.asarray(geo.volume))
    vc, vm = _bank(visc_tabs)
    ac, aa = _bank(ads_tabs)
    poly = PolymerImplicit(
        visc_c=jnp.asarray(vc), visc_m=jnp.asarray(vm),
        ads_c=jnp.asarray(ac), ads_a=jnp.asarray(aa),
        rock_mass=jnp.asarray(rock_mass),
        ads_prev=jnp.zeros(n),
        dead_pore=jnp.asarray(dead_pore),
        rrf=jnp.asarray(rrf),
        max_ads=jnp.asarray(max_ads),
        c_max=jnp.asarray(max(c_max, 1e-30)),
        inj_conc=jnp.zeros(max(n_wells, 1)))
    return poly, int(rocks[0].get("ads_index", 2)) == 1


# ----------------------------------------------------------------------
# 4-equation scalar kernels (vmapped + jacfwd'd by models/assembler.py)
# ----------------------------------------------------------------------

def _mob_with_polymer(poly: PolymerImplicit, mob_mult, c, aux, reg):
    """Fold the polymer water-mobility factor into the [5] dynamic
    channel vector (channels [0:3] are phase mobility multipliers).
    ``aux`` is the cell's PLYROCK row (see _cell_aux).
    Built by concatenation, NOT ``.at[0].multiply``: the scatter-mul JVP
    with a traced factor poisons the tangents of the untouched inf
    channels (inf * 0 = NaN) and with them every phase's flux jacobian."""
    f = poly.water_mob_factor(c, aux[1], reg, aux[3], aux[4])
    if mob_mult is None:
        return jnp.stack([f, jnp.ones_like(f), jnp.ones_like(f),
                          jnp.full_like(f, jnp.inf),
                          jnp.full_like(f, jnp.inf)])
    return jnp.concatenate([mob_mult[:1] * f, mob_mult[1:]])


def _cell_aux(poly: PolymerImplicit):
    """[N,5] per-cell channels: rock_mass, ads_prev (dynamic floor),
    dead_pore, rrf, max_ads (PLYROCK by SATNUM)."""
    return jnp.stack([poly.rock_mass, poly.ads_prev, poly.dead_pore,
                      poly.rrf, poly.max_ads], axis=1)


def make_acc4(fs, poly: PolymerImplicit):
    """Returns acc_fn(u4, flag, pv_ref, regs, eps, aux) with aux the
    cell's _cell_aux row; signature matches the assembler's sweep."""

    def acc4(u4, flag, pv_ref, regs, eps, aux):
        base = accumulation(fs, u4[:3], flag, pv_ref, regs, eps)  # [3]
        c = u4[3]
        q = intensive(fs, u4[:3], flag, regs, None, eps)
        vw = pv_ref * fs.rock.mult(u4[0], regs[1]) * q.sat[0] * q.inv_b[0]
        m_p = (1.0 - aux[2]) * vw * c \
            + aux[0] * poly.adsorption(c, aux[1], regs[1])
        return jnp.concatenate([base, m_p[None]])

    return acc4


def make_flux4(fs, poly: PolymerImplicit):
    """Returns flux_fn(uL4, uR4, flagL, flagR, trans, gdz, regsL, regsR,
    thpres, mobL, mobR, epsL, epsR, auxL, auxR) -> [4]; polymer-
    viscosified water flux for rows 0-2, upwinded polymer advection for
    row 3. aux = _cell_aux rows per side."""

    def flux4(uL4, uR4, flagL, flagR, trans, gdz, regsL, regsR, thpres,
              mobL, mobR, epsL, epsR, auxL, auxR):
        cL, cR = uL4[3], uR4[3]
        mobL_eff = _mob_with_polymer(poly, mobL, cL, auxL, regsL[1])
        mobR_eff = _mob_with_polymer(poly, mobR, cR, auxR, regsR[1])
        base = face_flux(fs, uL4[:3], uR4[:3], flagL, flagR, trans, gdz,
                         regsL, regsR, thpres, mobL_eff, mobR_eff,
                         epsL, epsR)  # [3]
        fw = base[0]
        c_up = jnp.where(fw >= 0.0, cL, cR)
        return jnp.concatenate([base, (c_up * fw)[None]])

    return flux4


def accumulation_all4(fs, poly: PolymerImplicit, u4, flag, pore_vol_ref,
                      regs, eps=None):
    """Vmapped 4-wide accumulation [N,4] (the simulator's acc0 sweep;
    jit with poly as an argument so ads_prev/inj_conc updates retrace
    nothing)."""
    acc4 = make_acc4(fs, poly)
    aux = _cell_aux(poly)
    eps_ax = None if eps is None else 0
    return jax.vmap(acc4, in_axes=(0, 0, 0, 0, eps_ax, 0))(
        u4, flag, pore_vol_ref, regs, eps, aux)


def assemble_system4(fs, poly: PolymerImplicit, cells, faces, state,
                     acc0, dt):
    """4-equation BSR assembly (mirrors assembler.assemble_system with
    the polymer-aware scalar kernels; reference: the 4x4 block
    linearization of flow_ebos_polymer)."""
    from opm_autodiff_tpu.models.assembler import BsrSystem

    u4, flag = state.u, state.flag
    acc4 = make_acc4(fs, poly)
    flux4 = make_flux4(fs, poly)
    aux = _cell_aux(poly)  # [N,5]

    def acc_vj(u, fl, pv, rg, ep, ax):
        def f(uu):
            a = acc4(uu, fl, pv, rg, ep, ax)
            return a, a
        jac, val = jax.jacfwd(f, has_aux=True)(u)
        return val, jac

    eps_ax = None if cells.eps is None else 0
    acc, acc_jac = jax.vmap(acc_vj, in_axes=(0, 0, 0, 0, eps_ax, 0))(
        u4, flag, cells.pore_vol_ref, cells.regs, cells.eps, aux)

    residual = (acc - acc0) / dt
    diag = acc_jac / dt

    lf, rt = faces.left, faces.right
    uL, uR = u4[lf], u4[rt]

    def flux_vj(uLv, uRv, fl, fr, tr, gz, rl, rr, th, ml, mr, el, er,
                al, ar):
        def f(u8):
            fx = flux4(u8[:4], u8[4:], fl, fr, tr, gz, rl, rr, th,
                       ml, mr, el, er, al, ar)
            return fx, fx
        jac, val = jax.jacfwd(f, has_aux=True)(jnp.concatenate([uLv, uRv]))
        return val, jac[:, :4], jac[:, 4:]

    epsL = None if cells.eps is None else cells.eps[lf]
    epsR = None if cells.eps is None else cells.eps[rt]
    flux, jac_l, jac_r = jax.vmap(
        flux_vj,
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, eps_ax, eps_ax, 0, 0))(
        uL, uR, flag[lf], flag[rt], faces.trans, faces.gdz,
        cells.regs[lf], cells.regs[rt], faces.thpres,
        cells.mob_mult[lf], cells.mob_mult[rt], epsL, epsR,
        aux[lf], aux[rt])

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
# Well coupling (value-exact, d q_w / dc dropped — quasi-Newton)
# ----------------------------------------------------------------------

def apply_wells4(residual4, diag4, q_perf, ws, c_cells,
                 poly: PolymerImplicit, inj_conc=None, cell_idx=None):
    """Polymer source terms from the standard wells.

    q_perf [W,P,3] are surface rates INTO cells (wells apply -q to the
    black-oil rows). Injection (q_w > 0) carries the well's WPOLYMER
    concentration; production (q_w < 0) removes at the cell
    concentration — that term is implicit in c (diagonal [3,3] entry).
    """
    cells_wp = ws.cell if cell_idx is None else cell_idx
    flat_cells = cells_wp.reshape(-1)
    qw = q_perf[:, :, 0]
    if inj_conc is None:
        inj_conc = poly.inj_conc
    inj = jnp.maximum(qw, 0.0) * inj_conc[:, None]
    prod = jnp.minimum(qw, 0.0) * c_cells[cells_wp]
    q_poly = (inj + prod).reshape(-1)
    residual4 = residual4.at[flat_cells, 3].add(-q_poly)
    # d(-q_poly)/dc = -min(qw,0) >= 0: strengthens the diagonal
    diag4 = diag4.at[flat_cells, 3, 3].add(
        -jnp.minimum(qw, 0.0).reshape(-1))
    return residual4, diag4


def chop_c_update(poly: PolymerImplicit, c, dc):
    """Appleyard-style chop for the concentration column: limit the step
    to 20% of PLYMAX per iteration, clamp into [0, 1.1*PLYMAX]."""
    lim = 0.2 * poly.c_max
    dc = jnp.clip(dc, -lim, lim)
    return jnp.clip(c + dc, 0.0, 1.1 * poly.c_max)
