"""Analytic aquifers: Carter-Tracy and Fetkovich.

Rebuild of the reference's BlackoilAquiferModel
(opm/simulators/aquifers/BlackoilAquiferModel.hpp:80 with
AquiferCarterTracy.hpp:37 and AquiferFetkovich.hpp:36): analytic aquifers
attached to boundary cells (AQUANCON), contributing water source terms.

TPU design: per-substep the host computes two coefficient arrays so the
device sees a *linear* (hence differentiable, implicit-in-pressure)
source per connection:

    q_w,j = alpha_j * (C1 - C2 * p_datum_j),
    p_datum_j = p_cell_j + rho_w g (d_aq - d_j)

For Carter-Tracy, C1/C2 come from the van Everdingen-Hurst
constant-terminal-rate influence function (dimensionless-time table
interpolation, reference AquiferCarterTracy.hpp:114-128) and the W_flux
recurrence (:65-69); for Fetkovich from the material-balance aquifer
pressure and PI. The cumulative flux W advances host-side at commit.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import numpy as np

import jax.numpy as jnp

from opm_autodiff_tpu import units as U

# van Everdingen & Hurst constant-terminal-rate influence function
# (dimensionless pressure vs dimensionless time; published table, e.g.
# Dake "Fundamentals of Reservoir Engineering"). Beyond the table the
# log-approximation pD = (ln tD + 0.80907)/2 applies.
_VEH_TD = np.asarray([
    0.01, 0.05, 0.1, 0.15, 0.2, 0.25, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9,
    1.0, 1.5, 2.0, 2.5, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 15.0,
    20.0, 25.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0, 90.0, 100.0])
_VEH_PD = np.asarray([
    0.112, 0.229, 0.315, 0.376, 0.424, 0.469, 0.503, 0.564, 0.616, 0.659,
    0.702, 0.735, 0.772, 0.802, 0.927, 1.020, 1.101, 1.169, 1.275, 1.362,
    1.436, 1.500, 1.556, 1.604, 1.651, 1.829, 1.960, 2.067, 2.147, 2.282,
    2.388, 2.476, 2.550, 2.615, 2.672, 2.723])


def _veh_pd(td: float) -> tuple[float, float]:
    """(pD, dpD/dtD) of the constant-terminal-rate solution."""
    td = max(td, 1e-12)
    if td >= _VEH_TD[-1]:
        return 0.5 * (np.log(td) + 0.80907), 0.5 / td
    pd = float(np.interp(td, _VEH_TD, _VEH_PD))
    i = int(np.searchsorted(_VEH_TD, td))
    i = min(max(i, 1), len(_VEH_TD) - 1)
    dpd = float((_VEH_PD[i] - _VEH_PD[i - 1]) / (_VEH_TD[i] - _VEH_TD[i - 1]))
    return pd, dpd


@dataclasses.dataclass
class CarterTracyAquifer:
    aq_id: int
    datum_depth: float
    p0: float            # initial aquifer pressure at datum (SI)
    perm: float
    poro: float
    ct: float            # total compressibility [1/Pa]
    r0: float            # inner (reservoir) radius [m]
    h: float             # thickness [m]
    theta_frac: float    # angle fraction of full circle
    # dynamic
    w_flux: float = 0.0  # cumulative influx [m^3]
    td: float = 0.0      # dimensionless time at the last commit

    @property
    def time_constant(self) -> float:  # Tc [s]
        return self.poro * self.ct * self.r0 ** 2 / max(
            self.perm / 1.0, 1e-300) * 1.0  # mu folded into perm usage below

    def coefficients(self, dt: float, mu_w: float) -> tuple[float, float]:
        """(C1, C2) of q_total = C1 - C2 * p_datum over this substep."""
        tc = mu_w * self.poro * self.ct * self.r0 ** 2 / self.perm
        beta = 2.0 * np.pi * self.theta_frac * self.h * self.poro \
            * self.ct * self.r0 ** 2
        td_new = self.td + dt / tc
        pd, dpd = _veh_pd(td_new)
        denom = pd - self.td * dpd
        denom = max(denom, 1e-12)
        # q = [beta (p0 - p) - W*dpd] / (denom * tc)
        c1 = (beta * self.p0 - self.w_flux * dpd) / (denom * tc)
        c2 = beta / (denom * tc)
        return c1, c2

    def commit(self, q_total: float, dt: float, mu_w: float):
        tc = mu_w * self.poro * self.ct * self.r0 ** 2 / self.perm
        self.w_flux += q_total * dt
        self.td += dt / tc


@dataclasses.dataclass
class FetkovichAquifer:
    aq_id: int
    datum_depth: float
    p0: float
    v0: float   # initial aquifer water volume [m^3]
    ct: float
    pi: float   # productivity index [m^3/s/Pa]
    w_flux: float = 0.0

    @property
    def wei(self) -> float:  # encroachable water [m^3]
        return self.ct * self.v0 * self.p0

    def aquifer_pressure(self) -> float:
        return self.p0 * (1.0 - self.w_flux / max(self.wei, 1e-300))

    def coefficients(self, dt: float, mu_w: float) -> tuple[float, float]:
        """Exponentially-averaged Fetkovich rate over the substep
        (reference AquiferFetkovich.hpp): q = e*(Wei/(p0 dt))*(pa - p),
        e = 1 - exp(-J p0 dt / Wei)."""
        pa = self.aquifer_pressure()
        x = self.pi * self.p0 * dt / max(self.wei, 1e-300)
        e = 1.0 - np.exp(-x)
        coef = e * self.wei / (self.p0 * dt)
        return coef * pa, coef

    def commit(self, q_total: float, dt: float, mu_w: float):
        self.w_flux += q_total * dt


@dataclasses.dataclass
class AquiferConnections:
    """AQUANCON: cells attached to each aquifer with influx fractions."""
    aq_id: np.ndarray      # [A] int
    cell: np.ndarray       # [A] int (active index)
    alpha: np.ndarray      # [A] influx fraction (sums to 1 per aquifer)
    depth: np.ndarray      # [A] cell depth


class AquiferDevice(NamedTuple):
    """Per-substep device coefficients: q_j = a1_j - a2_j * p_datum_j."""
    cell: jnp.ndarray   # [A] int32
    a1: jnp.ndarray     # [A]
    a2: jnp.ndarray     # [A]
    dz: jnp.ndarray     # [A] (d_aq - d_cell) for the datum correction


def empty_device() -> AquiferDevice:
    z = jnp.zeros(0)
    return AquiferDevice(cell=jnp.zeros(0, jnp.int32), a1=z, a2=z, dz=z)


class AquiferManager:
    """Host-side aquifer bookkeeping; produces AquiferDevice per substep."""

    def __init__(self, aquifers: list, conns: AquiferConnections,
                 rho_w: float, mu_w: float):
        self.aquifers = {a.aq_id: a for a in aquifers}
        self.conns = conns
        self.rho_w = rho_w
        self.mu_w = mu_w

    @property
    def active(self) -> bool:
        return len(self.aquifers) > 0 and len(self.conns.cell) > 0

    def device_coefficients(self, dt: float) -> AquiferDevice:
        n = len(self.conns.cell)
        a1 = np.zeros(n)
        a2 = np.zeros(n)
        dz = np.zeros(n)
        for aq_id, aq in self.aquifers.items():
            sel = self.conns.aq_id == aq_id
            c1, c2 = aq.coefficients(dt, self.mu_w)
            a1[sel] = self.conns.alpha[sel] * c1
            a2[sel] = self.conns.alpha[sel] * c2
            dz[sel] = aq.datum_depth - self.conns.depth[sel]
        return AquiferDevice(cell=jnp.asarray(self.conns.cell, jnp.int32),
                             a1=jnp.asarray(a1), a2=jnp.asarray(a2),
                             dz=jnp.asarray(dz))

    def commit(self, q_conn: np.ndarray, dt: float):
        """Advance W_flux from the accepted substep's connection rates."""
        for aq_id, aq in self.aquifers.items():
            sel = self.conns.aq_id == aq_id
            aq.commit(float(q_conn[sel].sum()), dt, self.mu_w)


def aquifer_rates(aq: AquiferDevice, u, rho_w_g: float):
    """Water influx per connection [A] (differentiable in cell pressure)."""
    p_cell = u[aq.cell, 0]
    p_datum = p_cell + rho_w_g * aq.dz
    return aq.a1 - aq.a2 * p_datum


def build_from_state(state, geo, fs) -> AquiferManager | None:
    """Construct from parsed AQUCT/AQUFETP/AQUANCON keywords."""
    from opm_autodiff_tpu.io.deck import DEFAULT
    from opm_autodiff_tpu.io.state import item

    deck_aq = getattr(state, "aquifers", None)
    if not deck_aq:
        return None
    aquifers = []
    u = state.runspec.unit_system
    for rec in deck_aq.get("AQUCT", []):
        aquifers.append(CarterTracyAquifer(
            aq_id=int(item(rec, 0, 1)),
            datum_depth=item(rec, 1, 0.0) * u.length,
            p0=item(rec, 2, 0.0) * u.pressure,
            perm=item(rec, 3, 100.0) * u.permeability,
            poro=item(rec, 4, 0.25),
            ct=item(rec, 5, 1e-5 / u.pressure) * u.compressibility,
            r0=item(rec, 6, 100.0) * u.length,
            h=item(rec, 7, 10.0) * u.length,
            theta_frac=item(rec, 8, 1.0),
        ))
    for rec in deck_aq.get("AQUFETP", []):
        aquifers.append(FetkovichAquifer(
            aq_id=int(item(rec, 0, 1)),
            datum_depth=item(rec, 1, 0.0) * u.length,
            p0=item(rec, 2, 0.0) * u.pressure,
            v0=item(rec, 3, 0.0) * u.reservoir_volume,
            ct=item(rec, 4, 1e-5 / u.pressure) * u.compressibility,
            pi=item(rec, 5, 0.0) * u.liquid_rate / u.pressure,
        ))

    aq_ids, cells, alphas, depths = [], [], [], []
    for rec in deck_aq.get("AQUANCON", []):
        aq_id = int(item(rec, 0, 1))
        i1, i2 = int(item(rec, 1, 1)) - 1, int(item(rec, 2, 1)) - 1
        j1, j2 = int(item(rec, 3, 1)) - 1, int(item(rec, 4, 1)) - 1
        k1, k2 = int(item(rec, 5, 1)) - 1, int(item(rec, 6, 1)) - 1
        coeff = item(rec, 8, None)
        for k in range(k1, k2 + 1):
            for j in range(j1, j2 + 1):
                for i in range(i1, i2 + 1):
                    c = geo.act_index(i, j, k)
                    if c < 0:
                        continue
                    aq_ids.append(aq_id)
                    cells.append(c)
                    # influx coefficient: deck value or face-area default
                    area = (coeff * u.length ** 2 if coeff is not None
                            else float(geo.dy[c] * geo.dz[c]))
                    alphas.append(area)
                    depths.append(float(geo.depth[c]))
    if not cells:
        return None
    aq_ids = np.asarray(aq_ids)
    alphas = np.asarray(alphas, float)
    for aq_id in set(aq_ids.tolist()):
        sel = aq_ids == aq_id
        alphas[sel] /= alphas[sel].sum()
    conns = AquiferConnections(aq_id=aq_ids,
                               cell=np.asarray(cells, np.int64),
                               alpha=alphas, depth=np.asarray(depths))
    import jax.numpy as jnp_  # noqa: F401

    rho_w = float(fs.rho_surf[0][0])
    mu_w = float(fs.water.mu_ref[0])
    return AquiferManager(aquifers, conns, rho_w, mu_w)
