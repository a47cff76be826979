"""Saturation functions: relative permeability and capillary pressure.

Rebuild of the slice of opm-material's ``EclMaterialLawManager`` that the
SPE-class decks exercise: SWOF/SGOF family tables with the ECLIPSE default
three-phase oil relperm model (saturation-weighted interpolation between
krow and krog), plus two-point horizontal end-point scaling (EPS: SWL/
SWCR/SWU/SGCR/SGU/SOWCR/SOGCR grid arrays remap the table saturation
axis per cell) and vertical scaling (KRW/KRO/KRG maxima, PCW/PCG
capillary multipliers) — reference: opm-material EclEpsScalingPoints.

Multi-region (SATNUM) support: tables are banked into [R, n] arrays
padded with +inf saturation nodes / edge values, so a per-cell region
index selects rows inside jitted/vmapped code (interpolation past the
last real node sees a zero slope and clamps — exactly the
``extrapolate=False`` behavior wanted for relperm/Pc).

Pure jnp table lookups — differentiable, vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.io.state import PropsSection
from opm_autodiff_tpu.props.tables import interp1d


def _pad_bank(tables: list, col: int) -> np.ndarray:
    """Stack column `col` of per-region tables, padded to max rows."""
    m = max(t.shape[0] for t in tables)
    out = np.empty((len(tables), m))
    for i, t in enumerate(tables):
        n = t.shape[0]
        out[i, :n] = t[:, col]
        out[i, n:] = np.inf if col == 0 else t[-1, col]
    return out


class SatFunc(NamedTuple):
    # water-oil (SWOF), banked per SATNUM region: [R, n]
    sw: jnp.ndarray
    krw_tab: jnp.ndarray
    krow_tab: jnp.ndarray
    pcow_tab: jnp.ndarray
    # gas-oil (SGOF): [R, n]
    sg: jnp.ndarray
    krg_tab: jnp.ndarray
    krog_tab: jnp.ndarray
    pcog_tab: jnp.ndarray
    swco: jnp.ndarray  # [R] connate water saturation per region
    # --- unscaled table end points per region [R] (EPS reference frame;
    # opm-material EclEpsScalingPoints "unscaled points") ---
    t_swl: jnp.ndarray     # first sw node (connate)
    t_swcr: jnp.ndarray    # largest sw with krw == 0
    t_swu: jnp.ndarray     # last sw node
    t_sw0w: jnp.ndarray    # smallest sw with krow == 0 (1 - sowcr - swl)
    t_sgcr: jnp.ndarray    # largest sg with krg == 0
    t_sgu: jnp.ndarray     # last sg node
    t_sg0g: jnp.ndarray    # smallest sg with krog == 0
    t_krw_mx: jnp.ndarray  # krw at swu
    t_kro_mx: jnp.ndarray  # krow at swl
    t_krg_mx: jnp.ndarray  # krg at sgu
    # Killough capillary-pressure hysteresis curvature (EHYSTR item 1)
    # — None disables Pc scanning (EHYSTR model flag != 1)
    hyst_pc_curv: jnp.ndarray | None = None

    @property
    def num_regions(self) -> int:
        return self.sw.shape[0]

    def _row(self, bank, reg):
        # static fast path: with a single region the row index is a
        # compile-time constant — no gather in the hot loop (a traced
        # per-cell `reg` would turn every lookup into a dynamic-slice,
        # costing ~4x on TPU)
        if bank.shape[0] == 1:
            return bank[0]
        return bank[reg]

    @staticmethod
    def _remap(s, a_c, b_c, a_t, b_t):
        """Two-point horizontal EPS: cell interval [a_c,b_c] -> table
        interval [a_t,b_t] (opm-material EclEpsTwoPhaseLaw)."""
        den = jnp.maximum(b_c - a_c, 1e-12)
        return a_t + (s - a_c) * (b_t - a_t) / den

    def _e(self, eps, idx, default):
        """EPS channel with table default (NaN in the channel = default)."""
        v = eps[idx]
        return jnp.where(jnp.isnan(v), default, v)

    def krw(self, sw, reg=0, eps=None):
        if eps is not None:
            swcr_t = self._row(self.t_swcr, reg)
            swu_t = self._row(self.t_swu, reg)
            kmx_t = self._row(self.t_krw_mx, reg)
            swcr_c = self._e(eps, 1, swcr_t)
            swu_c = self._e(eps, 2, swu_t)
            kmx_c = self._e(eps, 7, kmx_t)
            sw = self._remap(sw, swcr_c, swu_c, swcr_t, swu_t)
            scale = kmx_c / jnp.maximum(kmx_t, 1e-12)
        else:
            scale = 1.0
        return scale * jnp.maximum(interp1d(sw, self._row(self.sw, reg),
                                            self._row(self.krw_tab, reg),
                                            extrapolate=False), 0.0)

    def _krow_raw(self, sw, reg, eps):
        if eps is not None:
            swl_t = self._row(self.t_swl, reg)
            sw0_t = self._row(self.t_sw0w, reg)
            kmx_t = self._row(self.t_kro_mx, reg)
            swl_c = self._e(eps, 0, swl_t)
            sw0_c = self._e(eps, 3, sw0_t)
            kmx_c = self._e(eps, 8, kmx_t)
            sw = self._remap(sw, swl_c, sw0_c, swl_t, sw0_t)
            scale = kmx_c / jnp.maximum(kmx_t, 1e-12)
        else:
            scale = 1.0
        return scale * jnp.maximum(interp1d(sw, self._row(self.sw, reg),
                                            self._row(self.krow_tab, reg),
                                            extrapolate=False), 0.0)

    def _ow_land(self, reg, imb, sw_min):
        """Land trapping of the oil/water system's non-wetting phase
        (oil): returns (so_tr, so_max, socr_i, sou_i). so_max is the
        historical maximum oil saturation 1 - sw_min; so_tr the trapped
        oil from Land's relation between the drainage and imbibition
        residual-oil end points."""
        so_max = 1.0 - sw_min
        socr_d = 1.0 - self._row(self.t_sw0w, reg)   # residual oil, drainage
        socr_i = 1.0 - self.t_sw0w[imb]              # max trapped, imbibition
        so_mx_d = 1.0 - self._row(self.t_swl, reg)   # max oil in the table
        denom_tr = jnp.maximum(socr_i - socr_d, 1e-6)
        denom_mx = jnp.maximum(so_mx_d - socr_d, 1e-6)
        c_land = jnp.maximum(1.0 / denom_tr - 1.0 / denom_mx, 1e-6)
        dso = jnp.maximum(so_max - socr_d, 0.0)
        so_tr = socr_d + dso / (1.0 + c_land * dso)
        sou_i = 1.0 - self.t_swl[imb]
        return so_tr, so_max, socr_i, sou_i

    def krow(self, sw, reg=0, eps=None):
        """Oil relperm vs water; with hysteresis channels present (eps
        has >= 15 entries: [13] = IMBNUM, [14] = historical min Sw) the
        Killough scanning-curve model applies to the non-wetting (oil)
        phase on rising water saturation — the oil/water twin of the gas
        model below (reference: opm-material EclHysteresisTwoPhaseLaw
        applied by EclMaterialLawManager to both two-phase systems;
        trapped oil from Land's relation)."""
        drain = self._krow_raw(sw, reg, eps)
        if eps is None or eps.shape[-1] < 15:
            return drain
        sw_min = eps[14]
        imb = jnp.asarray(eps[13], jnp.int32)
        so = 1.0 - sw
        so_tr, so_max, socr_i, sou_i = self._ow_land(reg, imb, sw_min)
        span = jnp.maximum(so_max - so_tr, 1e-6)
        so_norm = socr_i + (so - so_tr) * (sou_i - socr_i) / span
        krow_i = jnp.maximum(
            interp1d(1.0 - so_norm, self.sw[imb], self.krow_tab[imb],
                     extrapolate=False), 0.0)
        krow_i_mx = jnp.maximum(self.t_kro_mx[imb], 1e-12)
        krow_at_max = self._krow_raw(sw_min, reg, eps)
        scan = krow_i * krow_at_max / krow_i_mx
        socr_d = 1.0 - self._row(self.t_sw0w, reg)
        on_drainage = (sw <= sw_min + 1e-9) | jnp.isnan(sw_min) \
            | (so_max <= socr_d + 1e-9)
        return jnp.where(on_drainage, drain, jnp.clip(scan, 0.0, drain))

    def _pcow_raw(self, sw, reg, eps, imb_row=None):
        if imb_row is None:
            sw_bank = self._row(self.sw, reg)
            pc_bank = self._row(self.pcow_tab, reg)
            swl_t = self._row(self.t_swl, reg)
            swu_t = self._row(self.t_swu, reg)
        else:
            sw_bank = self.sw[imb_row]
            pc_bank = self.pcow_tab[imb_row]
            swl_t = self.t_swl[imb_row]
            swu_t = self.t_swu[imb_row]
        if eps is not None:
            swl_c = self._e(eps, 0, swl_t)
            swu_c = self._e(eps, 2, swu_t)
            sw = self._remap(sw, swl_c, swu_c, swl_t, swu_t)
            mult = self._e(eps, 10, 1.0)
        else:
            mult = 1.0
        return mult * interp1d(sw, sw_bank, pc_bank, extrapolate=False)

    def pcow(self, sw, reg=0, eps=None):
        """Capillary pressure Po - Pw; with EHYSTR model 1 and the
        hysteresis channels present, Killough's wetting-phase scanning
        interpolates between the drainage and imbibition curves with
        the EHYSTR curvature parameter (F-factor form of Killough 1976;
        reference: EclHysteresisTwoPhaseLaw pcnw scanning)."""
        drain = self._pcow_raw(sw, reg, eps)
        if (self.hyst_pc_curv is None or eps is None
                or eps.shape[-1] < 15):
            return drain
        sw_min = eps[14]
        imb = jnp.asarray(eps[13], jnp.int32)
        imbc = self._pcow_raw(sw, reg, eps, imb_row=imb)
        so_tr, _so_max, _ci, _ui = self._ow_land(reg, imb, sw_min)
        sw_mx = 1.0 - so_tr  # scanning terminates at the trapped-oil end
        e = self.hyst_pc_curv
        num = 1.0 / (jnp.maximum(sw - sw_min, 0.0) + e) - 1.0 / e
        den = 1.0 / (jnp.maximum(sw_mx - sw_min, 1e-6) + e) - 1.0 / e
        f = jnp.clip(num / jnp.where(jnp.abs(den) > 0, den, 1.0), 0.0, 1.0)
        scan = drain + f * (imbc - drain)
        on_drainage = (sw <= sw_min + 1e-9) | jnp.isnan(sw_min)
        return jnp.where(on_drainage, drain, scan)

    def _krg_raw(self, sg, reg, eps):
        if eps is not None:
            sgcr_t = self._row(self.t_sgcr, reg)
            sgu_t = self._row(self.t_sgu, reg)
            kmx_t = self._row(self.t_krg_mx, reg)
            sgcr_c = self._e(eps, 4, sgcr_t)
            sgu_c = self._e(eps, 5, sgu_t)
            kmx_c = self._e(eps, 9, kmx_t)
            sg = self._remap(sg, sgcr_c, sgu_c, sgcr_t, sgu_t)
            scale = kmx_c / jnp.maximum(kmx_t, 1e-12)
        else:
            scale = 1.0
        return scale * jnp.maximum(interp1d(sg, self._row(self.sg, reg),
                                            self._row(self.krg_tab, reg),
                                            extrapolate=False), 0.0)

    def krg(self, sg, reg=0, eps=None):
        """Gas relperm; with hysteresis channels present (eps has >= 14
        entries: [12] = historical max Sg, [13] = IMBNUM region) the
        Killough scanning-curve model applies on decreasing gas
        saturation (reference: opm-material EclHysteresisTwoPhaseLaw,
        Killough option of EHYSTR; trapped gas from Land's relation).
        """
        drain = self._krg_raw(sg, reg, eps)
        if eps is None or eps.shape[-1] < 14:
            return drain
        sg_max = eps[12]
        imb = jnp.asarray(eps[13], jnp.int32)
        sgcr_d = self._row(self.t_sgcr, reg)
        sgcr_i = self.t_sgcr[imb]          # max trapped gas (imbibition)
        sgu_d = self._row(self.t_sgu, reg)
        # Land parameter from the drainage/imbibition critical points
        denom_tr = jnp.maximum(sgcr_i - sgcr_d, 1e-6)
        denom_mx = jnp.maximum(sgu_d - sgcr_d, 1e-6)
        c_land = jnp.maximum(1.0 / denom_tr - 1.0 / denom_mx, 1e-6)
        dsg = jnp.maximum(sg_max - sgcr_d, 0.0)
        sgtr = sgcr_d + dsg / (1.0 + c_land * dsg)
        # scanning curve: imbibition shape through (sgtr, 0) and
        # (sg_max, krg_drain(sg_max))
        sgu_i = self.t_sgu[imb]
        span = jnp.maximum(sg_max - sgtr, 1e-6)
        sg_norm = sgcr_i + (sg - sgtr) * (sgu_i - sgcr_i) / span
        krg_i = jnp.maximum(
            interp1d(sg_norm, self.sg[imb], self.krg_tab[imb],
                     extrapolate=False), 0.0)
        krg_i_mx = jnp.maximum(self.t_krg_mx[imb], 1e-12)
        krg_at_max = self._krg_raw(sg_max, reg, eps)
        scan = krg_i * krg_at_max / krg_i_mx
        on_drainage = (sg >= sg_max - 1e-9) | (sg_max <= sgcr_d + 1e-9) \
            | jnp.isnan(sg_max)
        return jnp.where(on_drainage, drain,
                         jnp.clip(scan, 0.0, drain))

    def krog(self, sg, reg=0, eps=None):
        if eps is not None:
            sg0_t = self._row(self.t_sg0g, reg)
            kmx_t = self._row(self.t_kro_mx, reg)
            sg0_c = self._e(eps, 6, sg0_t)
            kmx_c = self._e(eps, 8, kmx_t)
            sg = self._remap(sg, 0.0, sg0_c, 0.0, sg0_t)
            scale = kmx_c / jnp.maximum(kmx_t, 1e-12)
        else:
            scale = 1.0
        return scale * jnp.maximum(interp1d(sg, self._row(self.sg, reg),
                                            self._row(self.krog_tab, reg),
                                            extrapolate=False), 0.0)

    def pcog(self, sg, reg=0, eps=None):
        """Capillary pressure Pg - Po."""
        mult = self._e(eps, 11, 1.0) if eps is not None else 1.0
        return mult * interp1d(sg, self._row(self.sg, reg),
                               self._row(self.pcog_tab, reg),
                               extrapolate=False)

    def kro(self, sw, sg, reg=0, eps=None):
        """Three-phase oil relperm, ECLIPSE default model:

        kro = (sg * krog + (sw - swco) * krow) / (sg + sw - swco)

        with the denominator guarded: as sg + (sw - swco) -> 0 the oil is
        the only mobile phase and kro -> krow(swco) = krog(0).
        """
        krow = self.krow(sw, reg, eps)
        krog = self.krog(sg, reg, eps)
        swco = self.swco[0] if self.swco.shape[0] == 1 else self.swco[reg]
        if eps is not None:
            swco = self._e(eps, 0, swco)
        swn = jnp.maximum(sw - swco, 0.0)
        den = sg + swn
        safe_den = jnp.where(den > 1e-12, den, 1.0)
        mixed = (sg * krog + swn * krow) / safe_den
        return jnp.where(den > 1e-12, mixed, self.krow(swco, reg, eps))

    @staticmethod
    def from_props(props: PropsSection, phases=None,
                   ehystr=None) -> "SatFunc":
        phases = phases or frozenset({"OIL", "WATER", "GAS"})
        swof_regions = list(props.swof_regions)
        sgof_regions = list(props.sgof_regions)
        inert = np.asarray([[0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
        # single-phase decks carry no saturation functions at all
        # (reference: flow_onephase.cpp / flow_onephase_energy.cpp);
        # the lone phase is fully mobile at its saturation
        mobile = np.asarray([[0.0, 0.0, 1.0, 0.0], [1.0, 1.0, 0.0, 0.0]])
        if not swof_regions and "WATER" not in phases:
            swof_regions = [inert]
        if not sgof_regions and "GAS" not in phases:
            sgof_regions = [inert]
        if len(phases) == 1:
            if not swof_regions:
                swof_regions = [mobile]
            if not sgof_regions:
                sgof_regions = [mobile]
        if not swof_regions or not sgof_regions:
            raise NotImplementedError(
                "only SWOF/SGOF family supported in this round")
        # both banks must have the same region count: recycle the last
        # table (ECL defaults a missing region table to the previous one)
        nr = max(len(swof_regions), len(sgof_regions))
        while len(swof_regions) < nr:
            swof_regions.append(swof_regions[-1])
        while len(sgof_regions) < nr:
            sgof_regions.append(sgof_regions[-1])
        # unscaled table end points per region (the EPS reference frame)
        def endpoints(t, kr_col):
            s_nodes = t[:, 0]
            kr = t[:, kr_col]
            nz = np.nonzero(kr > 0)[0]
            scr = s_nodes[nz[0] - 1] if len(nz) and nz[0] > 0 else s_nodes[0]
            return scr

        t_swl = [t[0, 0] for t in swof_regions]
        t_swcr = [endpoints(t, 1) for t in swof_regions]
        t_swu = [t[-1, 0] for t in swof_regions]
        t_krw_mx = [t[-1, 1] for t in swof_regions]
        t_kro_mx = [t[0, 2] for t in swof_regions]

        def zero_point(t, col):
            # smallest s where the (decreasing) curve reaches zero
            z = np.nonzero(t[:, col] <= 0)[0]
            return t[z[0], 0] if len(z) else t[-1, 0]

        t_sw0w = [zero_point(t, 2) for t in swof_regions]
        t_sgcr = [endpoints(t, 1) for t in sgof_regions]
        t_sgu = [t[-1, 0] for t in sgof_regions]
        t_krg_mx = [t[-1, 1] for t in sgof_regions]
        t_sg0g = [zero_point(t, 2) for t in sgof_regions]

        return SatFunc(
            sw=jnp.asarray(_pad_bank(swof_regions, 0)),
            krw_tab=jnp.asarray(_pad_bank(swof_regions, 1)),
            krow_tab=jnp.asarray(_pad_bank(swof_regions, 2)),
            pcow_tab=jnp.asarray(_pad_bank(swof_regions, 3)),
            sg=jnp.asarray(_pad_bank(sgof_regions, 0)),
            krg_tab=jnp.asarray(_pad_bank(sgof_regions, 1)),
            krog_tab=jnp.asarray(_pad_bank(sgof_regions, 2)),
            pcog_tab=jnp.asarray(_pad_bank(sgof_regions, 3)),
            swco=jnp.asarray([t[0, 0] for t in swof_regions]),
            t_swl=jnp.asarray(t_swl), t_swcr=jnp.asarray(t_swcr),
            t_swu=jnp.asarray(t_swu), t_sw0w=jnp.asarray(t_sw0w),
            t_sgcr=jnp.asarray(t_sgcr), t_sgu=jnp.asarray(t_sgu),
            t_sg0g=jnp.asarray(t_sg0g), t_krw_mx=jnp.asarray(t_krw_mx),
            t_kro_mx=jnp.asarray(t_kro_mx), t_krg_mx=jnp.asarray(t_krg_mx),
            # Killough Pc scanning only for EHYSTR model flag 1
            hyst_pc_curv=(jnp.asarray(float(ehystr[0]))
                          if ehystr is not None and int(ehystr[1]) == 1
                          else None),
        )
