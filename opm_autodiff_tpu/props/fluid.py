"""FluidSystem: the bundle of PVT + saturation functions + densities.

The TPU analog of opm-material's ``BlackOilFluidSystem``: a single pytree
handed to every jitted kernel. Phase indexing convention throughout the
framework (matches the reference's water/oil/gas ordering in
BlackoilPhases): 0 = WATER, 1 = OIL, 2 = GAS.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from opm_autodiff_tpu.io.state import EclState
from opm_autodiff_tpu.props.pvt import (DeadOilPvt, DryGasPvt, LiveOilPvt,
                                        WaterPvt, water_pvt_from_props)
from opm_autodiff_tpu.props.satfunc import SatFunc

WATER, OIL, GAS = 0, 1, 2


class RockParams(NamedTuple):
    p_ref: jnp.ndarray
    comp: jnp.ndarray

    def mult(self, p):
        """Pore-volume multiplier (ECL ROCK second-order expansion)."""
        x = self.comp * (p - self.p_ref)
        return 1.0 + x + 0.5 * x * x


class FluidSystem(NamedTuple):
    water: WaterPvt
    oil: LiveOilPvt | DeadOilPvt
    gas: DryGasPvt
    sat: SatFunc
    rock: RockParams
    # surface densities [WATER, OIL, GAS] kg/m^3
    rho_surf: jnp.ndarray

    # --- oil properties dispatch (live vs dead). The *type* of self.oil
    # is static pytree structure, so this branch resolves at trace time.
    @property
    def live_oil(self) -> bool:
        return isinstance(self.oil, LiveOilPvt)

    def oil_inv_b(self, p, rs):
        if self.live_oil:
            return self.oil.inv_b(p, rs)
        return self.oil.inv_b(p)

    def oil_viscosity(self, p, rs):
        if self.live_oil:
            return self.oil.viscosity(p, rs)
        return self.oil.viscosity(p)

    def rs_sat(self, p):
        if self.live_oil:
            return self.oil.rs_sat(p)
        return jnp.zeros_like(p)

    # --- phase mass densities at reservoir conditions ---
    def water_density(self, p):
        return self.rho_surf[WATER] * self.water.inv_b(p)

    def oil_density(self, p, rs):
        # live oil carries dissolved gas mass
        return (self.rho_surf[OIL] + rs * self.rho_surf[GAS]) * self.oil_inv_b(p, rs)

    def gas_density(self, p):
        return self.rho_surf[GAS] * self.gas.inv_b(p)

    @staticmethod
    def from_state(state: EclState) -> "FluidSystem":
        """Build the fluid system; absent phases get inert stub tables
        (zero mobility, unit FVF) so the 3-equation layout is uniform —
        the model pins the inactive equations (the reference instead
        compiles per-phase-set variants, flow/flow_ebos_*.cpp; here one
        trace with static masks covers all of them)."""
        import numpy as np

        props = state.props
        phases = state.runspec.phases
        if props.pvto is not None:
            oil = LiveOilPvt.from_table(props.pvto)
        elif props.pvdo is not None:
            oil = DeadOilPvt.from_table(props.pvdo)
        else:
            raise NotImplementedError("need PVTO or PVDO")
        if props.pvdg is not None:
            gas = DryGasPvt.from_table(props.pvdg)
        elif "GAS" not in phases:
            gas = DryGasPvt.from_table(np.asarray(
                [[1e5, 1.0, 1e-3], [1e9, 1.0, 1e-3]]))
        else:
            raise NotImplementedError("need PVDG (wet gas PVTG later)")
        return FluidSystem(
            water=water_pvt_from_props(props),
            oil=oil,
            gas=gas,
            sat=SatFunc.from_props(props, phases),
            rock=RockParams(jnp.asarray(props.rock.p_ref),
                            jnp.asarray(props.rock.comp)),
            rho_surf=jnp.asarray([props.density.water, props.density.oil,
                                  props.density.gas]),
        )
