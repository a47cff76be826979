"""Saturation functions: relative permeability and capillary pressure.

Rebuild of the slice of opm-material's ``EclMaterialLawManager`` that the
SPE-class decks exercise: SWOF/SGOF family tables with the ECLIPSE default
three-phase oil relperm model (saturation-weighted interpolation between
krow and krog). End-point scaling and hysteresis come later rounds.

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

    def krw(self, sw, reg=0):
        return jnp.maximum(interp1d(sw, self._row(self.sw, reg),
                                    self._row(self.krw_tab, reg),
                                    extrapolate=False), 0.0)

    def krow(self, sw, reg=0):
        return jnp.maximum(interp1d(sw, self._row(self.sw, reg),
                                    self._row(self.krow_tab, reg),
                                    extrapolate=False), 0.0)

    def pcow(self, sw, reg=0):
        """Capillary pressure Po - Pw."""
        return interp1d(sw, self._row(self.sw, reg),
                        self._row(self.pcow_tab, reg), extrapolate=False)

    def krg(self, sg, reg=0):
        return jnp.maximum(interp1d(sg, self._row(self.sg, reg),
                                    self._row(self.krg_tab, reg),
                                    extrapolate=False), 0.0)

    def krog(self, sg, reg=0):
        return jnp.maximum(interp1d(sg, self._row(self.sg, reg),
                                    self._row(self.krog_tab, reg),
                                    extrapolate=False), 0.0)

    def pcog(self, sg, reg=0):
        """Capillary pressure Pg - Po."""
        return interp1d(sg, self._row(self.sg, reg),
                        self._row(self.pcog_tab, reg), extrapolate=False)

    def kro(self, sw, sg, reg=0):
        """Three-phase oil relperm, ECLIPSE default model:

        kro = (sg * krog + (sw - swco) * krow) / (sg + sw - swco)

        with the denominator guarded: as sg + (sw - swco) -> 0 the oil is
        the only mobile phase and kro -> krow(swco) = krog(0).
        """
        krow = self.krow(sw, reg)
        krog = self.krog(sg, reg)
        swco = self.swco[0] if self.swco.shape[0] == 1 else self.swco[reg]
        swn = jnp.maximum(sw - swco, 0.0)
        den = sg + swn
        safe_den = jnp.where(den > 1e-12, den, 1.0)
        mixed = (sg * krog + swn * krow) / safe_den
        return jnp.where(den > 1e-12, mixed, self.krow(swco, reg))

    @staticmethod
    def from_props(props: PropsSection, phases=None) -> "SatFunc":
        phases = phases or frozenset({"OIL", "WATER", "GAS"})
        swof_regions = list(props.swof_regions)
        sgof_regions = list(props.sgof_regions)
        inert = np.asarray([[0.0, 0.0, 1.0, 0.0], [1.0, 0.0, 0.0, 0.0]])
        if not swof_regions and "WATER" not in phases:
            swof_regions = [inert]
        if not sgof_regions and "GAS" not in phases:
            sgof_regions = [inert]
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
        )
