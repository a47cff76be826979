"""Saturation functions: relative permeability and capillary pressure.

Rebuild of the slice of opm-material's ``EclMaterialLawManager`` that the
SPE-class decks exercise: SWOF/SGOF family tables with the ECLIPSE default
three-phase oil relperm model (saturation-weighted interpolation between
krow and krog). End-point scaling and hysteresis come later rounds.

Pure jnp table lookups — differentiable, vmappable.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.io.state import PropsSection
from opm_autodiff_tpu.props.tables import interp1d


class SatFunc(NamedTuple):
    # water-oil (SWOF)
    sw: jnp.ndarray
    krw_tab: jnp.ndarray
    krow_tab: jnp.ndarray
    pcow_tab: jnp.ndarray
    # gas-oil (SGOF)
    sg: jnp.ndarray
    krg_tab: jnp.ndarray
    krog_tab: jnp.ndarray
    pcog_tab: jnp.ndarray
    swco: jnp.ndarray  # connate water saturation (first SWOF node)

    def krw(self, sw):
        return jnp.maximum(interp1d(sw, self.sw, self.krw_tab,
                                    extrapolate=False), 0.0)

    def krow(self, sw):
        return jnp.maximum(interp1d(sw, self.sw, self.krow_tab,
                                    extrapolate=False), 0.0)

    def pcow(self, sw):
        """Capillary pressure Po - Pw."""
        return interp1d(sw, self.sw, self.pcow_tab, extrapolate=False)

    def krg(self, sg):
        return jnp.maximum(interp1d(sg, self.sg, self.krg_tab,
                                    extrapolate=False), 0.0)

    def krog(self, sg):
        return jnp.maximum(interp1d(sg, self.sg, self.krog_tab,
                                    extrapolate=False), 0.0)

    def pcog(self, sg):
        """Capillary pressure Pg - Po."""
        return interp1d(sg, self.sg, self.pcog_tab, extrapolate=False)

    def kro(self, sw, sg):
        """Three-phase oil relperm, ECLIPSE default model:

        kro = (sg * krog + (sw - swco) * krow) / (sg + sw - swco)

        with the denominator guarded: as sg + (sw - swco) -> 0 the oil is
        the only mobile phase and kro -> krow(swco) = krog(0).
        """
        krow = self.krow(sw)
        krog = self.krog(sg)
        swn = jnp.maximum(sw - self.swco, 0.0)
        den = sg + swn
        safe_den = jnp.where(den > 1e-12, den, 1.0)
        mixed = (sg * krog + swn * krow) / safe_den
        return jnp.where(den > 1e-12, mixed, self.krow(self.swco))

    @staticmethod
    def from_props(props: PropsSection, phases=None) -> "SatFunc":
        phases = phases or frozenset({"OIL", "WATER", "GAS"})
        swof = props.swof
        sgof = props.sgof
        if swof is None and "WATER" not in phases:
            # inert water: immobile, zero capillary pressure
            swof = np.asarray([[0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
        if sgof is None and "GAS" not in phases:
            sgof = np.asarray([[0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
        if swof is None or sgof is None:
            raise NotImplementedError(
                "only SWOF/SGOF family supported in this round")
        swof = np.asarray(swof)
        sgof = np.asarray(sgof)
        return SatFunc(
            sw=jnp.asarray(swof[:, 0]),
            krw_tab=jnp.asarray(swof[:, 1]),
            krow_tab=jnp.asarray(swof[:, 2]),
            pcow_tab=jnp.asarray(swof[:, 3]),
            sg=jnp.asarray(sgof[:, 0]),
            krg_tab=jnp.asarray(sgof[:, 1]),
            krog_tab=jnp.asarray(sgof[:, 2]),
            pcog_tab=jnp.asarray(sgof[:, 3]),
            swco=jnp.asarray(swof[0, 0]),
        )
