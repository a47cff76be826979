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
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.io.state import PropsSection, PvtoTable
from opm_autodiff_tpu.props.tables import interp1d


class WaterPvt(NamedTuple):
    p_ref: jnp.ndarray
    inv_b_ref: jnp.ndarray
    comp: jnp.ndarray
    mu_ref: jnp.ndarray
    viscosibility: jnp.ndarray

    def inv_b(self, p):
        x = self.comp * (p - self.p_ref)
        return self.inv_b_ref * (1.0 + x + 0.5 * x * x)

    def viscosity(self, p):
        y = -self.viscosibility * (p - self.p_ref)
        return self.mu_ref / (1.0 + y + 0.5 * y * y)


class DryGasPvt(NamedTuple):
    p: jnp.ndarray       # pressure nodes
    inv_b_tab: jnp.ndarray
    mu_tab: jnp.ndarray

    def inv_b(self, pres):
        return interp1d(pres, self.p, self.inv_b_tab)

    def viscosity(self, pres):
        return interp1d(pres, self.p, self.mu_tab, extrapolate=False)

    @staticmethod
    def from_table(pvdg: np.ndarray) -> "DryGasPvt":
        return DryGasPvt(
            p=jnp.asarray(pvdg[:, 0]),
            inv_b_tab=jnp.asarray(1.0 / pvdg[:, 1]),
            mu_tab=jnp.asarray(pvdg[:, 2]),
        )


class DeadOilPvt(NamedTuple):
    p: jnp.ndarray
    inv_b_tab: jnp.ndarray
    mu_tab: jnp.ndarray

    def inv_b(self, pres):
        return interp1d(pres, self.p, self.inv_b_tab)

    def viscosity(self, pres):
        return interp1d(pres, self.p, self.mu_tab, extrapolate=False)

    @staticmethod
    def from_table(pvdo: np.ndarray) -> "DeadOilPvt":
        return DeadOilPvt(
            p=jnp.asarray(pvdo[:, 0]),
            inv_b_tab=jnp.asarray(1.0 / pvdo[:, 1]),
            mu_tab=jnp.asarray(pvdo[:, 2]),
        )


class LiveOilPvt(NamedTuple):
    """PVTO live oil.

    Saturated curve sampled at the deck's branch heads; undersaturated
    d/dp slopes per branch, interpolated in Rs.
    """

    p_sat: jnp.ndarray        # [nb] bubble-point pressure nodes
    rs_tab: jnp.ndarray       # [nb] Rs at those nodes
    inv_b_sat: jnp.ndarray    # [nb] 1/Bo on the saturated curve
    mu_sat: jnp.ndarray       # [nb]
    slope_inv_b: jnp.ndarray  # [nb] d(1/Bo)/dp undersaturated at each Rs
    slope_mu: jnp.ndarray     # [nb] d(mu)/dp undersaturated

    # --- saturated properties ---
    def rs_sat(self, p):
        """Saturated (maximum) dissolved GOR at pressure p."""
        return jnp.maximum(interp1d(p, self.p_sat, self.rs_tab), 0.0)

    def p_bub(self, rs):
        """Bubble-point (saturation) pressure for a given Rs."""
        return interp1d(rs, self.rs_tab, self.p_sat)

    # --- properties at (p, rs); rs <= rs_sat(p) means undersaturated ---
    def inv_b(self, p, rs):
        pb = self.p_bub(rs)
        dp = jnp.maximum(p - pb, 0.0)
        base = interp1d(pb, self.p_sat, self.inv_b_sat)
        slope = interp1d(rs, self.rs_tab, self.slope_inv_b, extrapolate=False)
        return base + slope * dp

    def viscosity(self, p, rs):
        pb = self.p_bub(rs)
        dp = jnp.maximum(p - pb, 0.0)
        base = interp1d(pb, self.p_sat, self.mu_sat, extrapolate=False)
        slope = interp1d(rs, self.rs_tab, self.slope_mu, extrapolate=False)
        return base + slope * dp

    @staticmethod
    def from_table(pvto: PvtoTable) -> "LiveOilPvt":
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
        return LiveOilPvt(
            p_sat=jnp.asarray(p_sat),
            rs_tab=jnp.asarray(pvto.rs),
            inv_b_sat=jnp.asarray(inv_b_sat),
            mu_sat=jnp.asarray(mu_sat),
            slope_inv_b=jnp.asarray(slope_b),
            slope_mu=jnp.asarray(slope_m),
        )


def water_pvt_from_props(props: PropsSection) -> WaterPvt:
    w = props.pvtw
    return WaterPvt(
        p_ref=jnp.asarray(w.p_ref),
        inv_b_ref=jnp.asarray(1.0 / w.b_ref),
        comp=jnp.asarray(w.comp),
        mu_ref=jnp.asarray(w.visc),
        viscosibility=jnp.asarray(w.viscosibility),
    )
