"""Black-oil PVT: water / dry gas / dead oil / live oil.

Functional rebuild of opm-material's ``BlackOilFluidSystem`` PVT classes
(reference consumes them via opm-models intensive quantities; SURVEY.md
§0.1). Each phase PVT is a NamedTuple of jnp arrays (a pytree — passes
through jit untouched) plus pure functions of pressure (and Rs). All SI.

Conventions (matching the reference):
  * b = 1/B, the *inverse* formation volume factor — tables store and
    interpolate b, not B (opm-material's inverseFormationVolumeFactor).
  * Live oil: undersaturated behavior is modeled per-Rs-branch with
    d(b)/dp and d(mu)/dp slopes taken from the deck's undersaturated
    branch data and interpolated in Rs. Saturated cells have dp=0 so a
    single code path covers both states (no branching under jit).

Multi-region (PVTNUM) support mirrors the SATNUM banking in satfunc.py:
tables are stacked into [R, n] banks, padded by *extending the last
segment's slope* (so linear extrapolation semantics survive padding), and
a per-cell region index selects rows inside jitted code. With a single
region the row index is a compile-time constant — no gather in the hot
loop (a traced region index costs ~4.5x on TPU).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.io.state import PropsSection, PvtoTable
from opm_autodiff_tpu.props.tables import interp1d


def row(bank, reg):
    """Select a region row with the static single-region fast path."""
    if bank.shape[0] == 1:
        return bank[0]
    return bank[reg]


def _pad_bank_linear(cols: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Pad per-region 1D node/value arrays to a common length.

    ``cols[r]`` is the list of column arrays for region r (column 0 is the
    strictly-increasing node axis). Padding continues the last segment's
    slope in every column, so interpolation AND linear extrapolation are
    unchanged by the padding.
    """
    nreg = len(cols)
    ncol = len(cols[0])
    m = max(len(c[0]) for c in cols)
    out = [np.empty((nreg, m)) for _ in range(ncol)]
    for r, c in enumerate(cols):
        n = len(c[0])
        x = np.asarray(c[0], float)
        dx = (x[-1] - x[-2]) if n > 1 else max(abs(x[-1]), 1.0)
        ext = dx * np.arange(1, m - n + 1)
        for j in range(ncol):
            y = np.asarray(c[j], float)
            out[j][r, :n] = y
            if n < m:
                slope = (y[-1] - y[-2]) / dx if n > 1 else 0.0
                out[j][r, n:] = y[-1] + slope * ext
    return out


class WaterPvt(NamedTuple):
    """PVTW per region: fields are [R] arrays."""

    p_ref: jnp.ndarray
    inv_b_ref: jnp.ndarray
    comp: jnp.ndarray
    mu_ref: jnp.ndarray
    viscosibility: jnp.ndarray

    def inv_b(self, p, reg=0):
        x = row(self.comp, reg) * (p - row(self.p_ref, reg))
        return row(self.inv_b_ref, reg) * (1.0 + x + 0.5 * x * x)

    def viscosity(self, p, reg=0):
        y = -row(self.viscosibility, reg) * (p - row(self.p_ref, reg))
        return row(self.mu_ref, reg) / (1.0 + y + 0.5 * y * y)


class DryGasPvt(NamedTuple):
    """PVDG, banked per PVTNUM region: [R, n] arrays."""

    p: jnp.ndarray
    inv_b_tab: jnp.ndarray
    mu_tab: jnp.ndarray

    def inv_b(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.inv_b_tab, reg))

    def viscosity(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.mu_tab, reg),
                        extrapolate=False)

    @staticmethod
    def from_table(pvdg: np.ndarray) -> "DryGasPvt":
        return DryGasPvt.from_tables([np.asarray(pvdg)])

    @staticmethod
    def from_tables(tables: list) -> "DryGasPvt":
        cols = [[t[:, 0], 1.0 / t[:, 1], t[:, 2]] for t in tables]
        p, invb, mu = _pad_bank_linear(cols)
        return DryGasPvt(p=jnp.asarray(p), inv_b_tab=jnp.asarray(invb),
                         mu_tab=jnp.asarray(mu))


class DeadOilPvt(NamedTuple):
    """PVDO, banked per PVTNUM region: [R, n] arrays."""

    p: jnp.ndarray
    inv_b_tab: jnp.ndarray
    mu_tab: jnp.ndarray

    def inv_b(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.inv_b_tab, reg))

    def viscosity(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.mu_tab, reg),
                        extrapolate=False)

    @staticmethod
    def from_table(pvdo: np.ndarray) -> "DeadOilPvt":
        return DeadOilPvt.from_tables([np.asarray(pvdo)])

    @staticmethod
    def from_tables(tables: list) -> "DeadOilPvt":
        cols = [[t[:, 0], 1.0 / t[:, 1], t[:, 2]] for t in tables]
        p, invb, mu = _pad_bank_linear(cols)
        return DeadOilPvt(p=jnp.asarray(p), inv_b_tab=jnp.asarray(invb),
                          mu_tab=jnp.asarray(mu))


class LiveOilPvt(NamedTuple):
    """PVTO live oil, banked per PVTNUM region: [R, nb] arrays.

    Saturated curve sampled at the deck's branch heads; undersaturated
    d/dp slopes per branch, interpolated in Rs.
    """

    p_sat: jnp.ndarray        # [R,nb] bubble-point pressure nodes
    rs_tab: jnp.ndarray       # [R,nb] Rs at those nodes
    inv_b_sat: jnp.ndarray    # [R,nb] 1/Bo on the saturated curve
    mu_sat: jnp.ndarray       # [R,nb]
    slope_inv_b: jnp.ndarray  # [R,nb] d(1/Bo)/dp undersaturated at each Rs
    slope_mu: jnp.ndarray     # [R,nb] d(mu)/dp undersaturated

    # --- saturated properties ---
    def rs_sat(self, p, reg=0):
        """Saturated (maximum) dissolved GOR at pressure p."""
        return jnp.maximum(
            interp1d(p, row(self.p_sat, reg), row(self.rs_tab, reg)), 0.0)

    def p_bub(self, rs, reg=0):
        """Bubble-point (saturation) pressure for a given Rs."""
        return interp1d(rs, row(self.rs_tab, reg), row(self.p_sat, reg))

    # --- properties at (p, rs); rs <= rs_sat(p) means undersaturated ---
    def inv_b(self, p, rs, reg=0):
        pb = self.p_bub(rs, reg)
        dp = jnp.maximum(p - pb, 0.0)
        base = interp1d(pb, row(self.p_sat, reg), row(self.inv_b_sat, reg))
        slope = interp1d(rs, row(self.rs_tab, reg),
                         row(self.slope_inv_b, reg), extrapolate=False)
        return base + slope * dp

    def viscosity(self, p, rs, reg=0):
        pb = self.p_bub(rs, reg)
        dp = jnp.maximum(p - pb, 0.0)
        base = interp1d(pb, row(self.p_sat, reg), row(self.mu_sat, reg),
                        extrapolate=False)
        slope = interp1d(rs, row(self.rs_tab, reg),
                         row(self.slope_mu, reg), extrapolate=False)
        return base + slope * dp

    @staticmethod
    def from_table(pvto: PvtoTable) -> "LiveOilPvt":
        return LiveOilPvt.from_tables([pvto])

    @staticmethod
    def from_tables(pvtos: list) -> "LiveOilPvt":
        cols = []
        for pvto in pvtos:
            nb = len(pvto.rs)
            p_sat = np.empty(nb)
            inv_b_sat = np.empty(nb)
            mu_sat = np.empty(nb)
            slope_b = np.full(nb, np.nan)
            slope_m = np.full(nb, np.nan)
            for i, (p, bo, mu) in enumerate(pvto.branches):
                p_sat[i] = p[0]
                inv_b_sat[i] = 1.0 / bo[0]
                mu_sat[i] = mu[0]
                if len(p) > 1:
                    # least-squares linear slope through the branch points
                    dp = p - p[0]
                    db = 1.0 / bo - 1.0 / bo[0]
                    dm = mu - mu[0]
                    denom = np.sum(dp * dp)
                    slope_b[i] = np.sum(dp * db) / denom
                    slope_m[i] = np.sum(dp * dm) / denom
            # fill missing slopes from the nearest branch that has data
            # (ECLIPSE extrapolates undersaturated data between branches)
            have = ~np.isnan(slope_b)
            if have.any():
                idx = np.arange(nb)
                slope_b = np.interp(idx, idx[have], slope_b[have])
                slope_m = np.interp(idx, idx[have], slope_m[have])
            else:
                slope_b[:] = 0.0
                slope_m[:] = 0.0
            # node axis for the bank is p_sat (strictly increasing); rs
            # rides along as a data column and keeps increasing under the
            # slope-extension padding
            cols.append([p_sat, np.asarray(pvto.rs), inv_b_sat, mu_sat,
                         slope_b, slope_m])
        p_sat, rs, invb, mu, sb, sm = _pad_bank_linear(cols)
        return LiveOilPvt(
            p_sat=jnp.asarray(p_sat), rs_tab=jnp.asarray(rs),
            inv_b_sat=jnp.asarray(invb), mu_sat=jnp.asarray(mu),
            slope_inv_b=jnp.asarray(sb), slope_mu=jnp.asarray(sm))


class WetGasPvt(NamedTuple):
    """PVTG wet gas with vaporized oil, banked per PVTNUM region.

    Mirrors LiveOilPvt's structure with the roles of p and Rv swapped:
    the saturated curve is sampled at the deck's pressure nodes; the
    undersaturated behavior (rv below rv_sat at fixed p) is a linear
    d/d(rv) slope per pressure node taken from the branch rows.
    """

    p: jnp.ndarray            # [R,np] pressure nodes
    rv_tab: jnp.ndarray       # [R,np] saturated Rv at those nodes
    inv_b_sat: jnp.ndarray    # [R,np] 1/Bg on the saturated curve
    mu_sat: jnp.ndarray       # [R,np]
    slope_inv_b: jnp.ndarray  # [R,np] d(1/Bg)/d(rv) undersaturated
    slope_mu: jnp.ndarray     # [R,np]

    def rv_sat(self, pres, reg=0):
        """Saturated (maximum) vaporized OGR at pressure p."""
        return jnp.maximum(
            interp1d(pres, row(self.p, reg), row(self.rv_tab, reg)), 0.0)

    def inv_b(self, pres, rv, reg=0):
        rvs = self.rv_sat(pres, reg)
        drv = jnp.minimum(rv - rvs, 0.0)  # undersaturated: rv < rv_sat
        base = interp1d(pres, row(self.p, reg), row(self.inv_b_sat, reg))
        slope = interp1d(pres, row(self.p, reg),
                         row(self.slope_inv_b, reg), extrapolate=False)
        return base + slope * drv

    def viscosity(self, pres, rv, reg=0):
        rvs = self.rv_sat(pres, reg)
        drv = jnp.minimum(rv - rvs, 0.0)
        base = interp1d(pres, row(self.p, reg), row(self.mu_sat, reg),
                        extrapolate=False)
        slope = interp1d(pres, row(self.p, reg), row(self.slope_mu, reg),
                         extrapolate=False)
        return base + slope * drv

    @staticmethod
    def from_tables(pvtgs: list) -> "WetGasPvt":
        cols = []
        for pvtg in pvtgs:
            npn = len(pvtg.p)
            rv_sat = np.empty(npn)
            inv_b_sat = np.empty(npn)
            mu_sat = np.empty(npn)
            slope_b = np.full(npn, np.nan)
            slope_m = np.full(npn, np.nan)
            for i, (rv, bg, mu) in enumerate(pvtg.branches):
                rv_sat[i] = rv[0]
                inv_b_sat[i] = 1.0 / bg[0]
                mu_sat[i] = mu[0]
                if len(rv) > 1:
                    drv = rv - rv[0]
                    db = 1.0 / bg - 1.0 / bg[0]
                    dm = mu - mu[0]
                    denom = np.sum(drv * drv)
                    if denom > 0:
                        slope_b[i] = np.sum(drv * db) / denom
                        slope_m[i] = np.sum(drv * dm) / denom
            have = ~np.isnan(slope_b)
            if have.any():
                idx = np.arange(npn)
                slope_b = np.interp(idx, idx[have], slope_b[have])
                slope_m = np.interp(idx, idx[have], slope_m[have])
            else:
                slope_b[:] = 0.0
                slope_m[:] = 0.0
            cols.append([pvtg.p, rv_sat, inv_b_sat, mu_sat, slope_b,
                         slope_m])
        p, rv, invb, mu, sb, sm = _pad_bank_linear(cols)
        return WetGasPvt(
            p=jnp.asarray(p), rv_tab=jnp.asarray(rv),
            inv_b_sat=jnp.asarray(invb), mu_sat=jnp.asarray(mu),
            slope_inv_b=jnp.asarray(sb), slope_mu=jnp.asarray(sm))


def water_pvt_from_props(props: PropsSection) -> WaterPvt:
    recs = props.pvtw_regions or [props.pvtw]
    return WaterPvt(
        p_ref=jnp.asarray([w.p_ref for w in recs]),
        inv_b_ref=jnp.asarray([1.0 / w.b_ref for w in recs]),
        comp=jnp.asarray([w.comp for w in recs]),
        mu_ref=jnp.asarray([w.visc for w in recs]),
        viscosibility=jnp.asarray([w.viscosibility for w in recs]),
    )
