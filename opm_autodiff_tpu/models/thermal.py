"""Thermal (energy) option: temperature transport with viscosity feedback.

Rebuild of the reference's energy variant (flow/flow_ebos_energy.cpp,
onephase_energy; physics from opm-models blackoilenergymodules +
opm-material thermal laws). The reference carries energy as an extra
fully-implicit conservation equation; here temperature is advanced by an
implicit advection-conduction solve after each converged substep (the
same operator-split as the other extended components) and feeds back
into phase mobilities through the WATVISCT/OILVISCT/GASVISCT
viscosity-temperature ratios.

Energy balance per cell (backward Euler, conservative
"explicit heat capacity, implicit temperature" form like
components._transport):

  (C_tot T)_t + div( sum_ph F_ph rho_ph c_ph T_up ) - div(k grad T) = q_H

with C_tot = SPECROCK * bulk rock volume + sum_ph mass_ph * SPECHEAT_ph.
Conduction transmissibility reuses the Darcy transmissibility's geometric
factor: T_cond = THCONR * (trans / k_face), with k_face the harmonic
PERMX mean — exact for the same TPFA stencil.

Injection wells deliver heat at WTEMP/WINJTEMP; producers remove it at
the cell temperature (cancels in the conservative form).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.models.blackoil import face_flux, intensive
from opm_autodiff_tpu.props.tables import interp1d
from opm_autodiff_tpu.solvers.linear import bicgstab


class ThermalModel:
    def __init__(self, state, geo, fs, cells, faces):
        self.active = "THERMAL" in state.runspec.extensions
        if not self.active:
            return
        self.fs = fs
        self.cells = cells
        self.faces = faces
        self.geo = geo
        u = state.runspec.unit_system
        comp = state.components
        n = geo.num_active

        def to_K(t_deck):
            return (np.asarray(t_deck, float) * u.temperature_scale
                    + u.temperature_offset)

        # initial temperature: TEMPI array, TEMPVD depth table, or a
        # uniform default (reference: EclThermal initial conditions)
        tempi = comp.get("TEMPI")
        tempvd = comp.get("TEMPVD")
        if tempi is not None:
            self.T = jnp.asarray(to_K(np.asarray(tempi)[geo.act_to_glob]))
        elif tempvd is not None:
            t0 = np.asarray(tempvd[0])
            self.T = jnp.asarray(to_K(np.interp(
                np.asarray(geo.depth), t0[:, 0], t0[:, 1])))
        else:
            self.T = jnp.full(n, 366.48)  # 200 F default
        self.T0 = self.T

        # rock volumetric heat capacity (SPECROCK: T -> J/m3rock/K)
        if "SPECROCK" in comp:
            t = np.asarray(comp["SPECROCK"][0])
            self.rock_cT = jnp.asarray(to_K(t[:, 0]))
            self.rock_cv = jnp.asarray(t[:, 1])
        else:
            self.rock_cT = jnp.asarray([250.0, 500.0])
            self.rock_cv = jnp.asarray([2.1e6, 2.1e6])  # ~typical rock
        # fluid specific heats (SPECHEAT: T -> J/kg/K per phase o,w,g)
        if "SPECHEAT" in comp:
            t = np.asarray(comp["SPECHEAT"][0])
            self.ch_T = jnp.asarray(to_K(t[:, 0]))
            self.ch_oil = jnp.asarray(t[:, 1])
            self.ch_wat = jnp.asarray(t[:, 2])
            self.ch_gas = jnp.asarray(t[:, 3])
        else:
            self.ch_T = jnp.asarray([250.0, 500.0])
            self.ch_oil = jnp.asarray([2000.0, 2000.0])
            self.ch_wat = jnp.asarray([4180.0, 4180.0])
            self.ch_gas = jnp.asarray([2200.0, 2200.0])
        # viscosity-temperature ratio tables (deck temp axis -> K)
        self.visct = {}
        for ph, nm in ((0, "WATVISCT"), (1, "OILVISCT"), (2, "GASVISCT")):
            if nm in comp:
                t = np.asarray(comp[nm][0])
                self.visct[ph] = (jnp.asarray(to_K(t[:, 0])),
                                  jnp.asarray(t[:, 1]))
        # conduction transmissibility per face
        thconr = comp.get("THCONR")
        if thconr is not None:
            k_cond = np.asarray(thconr, float)[geo.act_to_glob] \
                * u.energy / (u.length * u.time * u.temperature_scale)
        else:
            k_cond = np.full(n, 2.0)  # W/m/K typical rock
        fl = np.asarray(faces.left)
        fr = np.asarray(faces.right)
        th_l = getattr(geo.faces, "th_left", None)
        if th_l is not None and len(th_l) == len(fl):
            # exact thermal half-transmissibilities (reference:
            # ecltransmissibility.cc thermalHalfTrans_ — geometric A/d
            # halves x each cell's conductivity, combined harmonically)
            hl = np.asarray(th_l) * k_cond[fl]
            hr = np.asarray(geo.faces.th_right) * k_cond[fr]
            with np.errstate(divide="ignore"):
                t_cond = np.where((hl > 0) & (hr > 0),
                                  hl * hr / np.maximum(hl + hr, 1e-300),
                                  0.0)
            self.cond_trans = jnp.asarray(t_cond)
        else:
            # fallback (corner-point): recover A/d from the Darcy trans
            # divided by the harmonic permeability
            permx = np.maximum(np.asarray(geo.permx), 1e-20)
            k_face = 2.0 / (1.0 / permx[fl] + 1.0 / permx[fr])
            kc_face = 0.5 * (k_cond[fl] + k_cond[fr])
            self.cond_trans = jnp.asarray(
                np.asarray(faces.trans) / k_face * kc_face)
        self._c_old = None

    # ------------------------------------------------------------------
    def _heat_capacity(self, u, flag):
        """Total heat capacity per cell [N] (J/K)."""
        q = jax.vmap(intensive, in_axes=(None, 0, 0, 0))(
            self.fs, u, flag, self.cells.regs)
        pv = self.cells.pore_vol_ref
        rho0 = self.fs.rho_ref(0)
        mass = pv[:, None] * q.sat * q.inv_b * rho0[None, :]  # [N,3] kg
        cw = interp1d(self.T, self.ch_T, self.ch_wat, extrapolate=False)
        co = interp1d(self.T, self.ch_T, self.ch_oil, extrapolate=False)
        cg = interp1d(self.T, self.ch_T, self.ch_gas, extrapolate=False)
        c_fluid = mass[:, 0] * cw + mass[:, 1] * co + mass[:, 2] * cg
        bulk_rock = jnp.asarray(self.geo.volume) - pv
        c_rock = bulk_rock * interp1d(self.T, self.rock_cT, self.rock_cv,
                                      extrapolate=False)
        return c_fluid + c_rock

    def initialize(self, u, flag):
        if self.active:
            self._c_old = self._heat_capacity(u, flag)

    # ------------------------------------------------------------------
    def mobility_multipliers(self):
        """[N,3] phase mobility multipliers mu(T0)/mu(T)."""
        n = self.T.shape[0]
        out = jnp.ones((n, 3))
        for ph, (tn, mu) in self.visct.items():
            mu_T = interp1d(self.T, tn, mu, extrapolate=False)
            mu_0 = interp1d(self.T0, tn, mu, extrapolate=False)
            out = out.at[:, ph].mul(mu_0 / jnp.maximum(mu_T, 1e-12))
        return out

    # ------------------------------------------------------------------
    def advance(self, u, flag, dt, q_perf, ws, well_confs):
        if not self.active:
            return
        f = self.faces
        rg = self.cells.regs
        mm = self.cells.mob_mult
        flux = jax.vmap(face_flux,
                        in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, None, 0, 0))(
            self.fs, u[f.left], u[f.right], flag[f.left], flag[f.right],
            f.trans, f.gdz, rg[f.left], rg[f.right], 0.0,
            mm[f.left], mm[f.right])  # [F,3] surface-volume fluxes
        rho0 = self.fs.rho_ref(0)
        cw = float(self.ch_wat[0])
        co = float(self.ch_oil[0])
        cg = float(self.ch_gas[0])
        # advective heat-capacity flux per face (J/K/s)
        h_flux = (flux[:, 0] * rho0[0] * cw + flux[:, 1] * rho0[1] * co
                  + flux[:, 2] * rho0[2] * cg)

        c_new = self._heat_capacity(u, flag)
        c_old = self._c_old if self._c_old is not None else c_new

        diag = c_old / dt
        rhs = c_old * self.T / dt

        pos = jnp.maximum(h_flux, 0.0)
        neg = jnp.maximum(-h_flux, 0.0)
        diag = diag.at[f.left].add(neg)
        diag = diag.at[f.right].add(pos)
        off_lr = -neg
        off_rl = -pos
        # conduction: symmetric
        diag = diag.at[f.left].add(self.cond_trans)
        diag = diag.at[f.right].add(self.cond_trans)
        off_lr = off_lr - self.cond_trans
        off_rl = off_rl - self.cond_trans

        # wells: injectors deliver heat at WTEMP
        if q_perf is not None:
            q = np.asarray(q_perf)
            cells_w = np.asarray(ws.cell)
            for iw, w in enumerate(well_confs):
                t_inj = getattr(w, "temp_inj", None)
                if t_inj is None:
                    t_inj = float(self.T0.mean())
                for ip in range(q.shape[1]):
                    h = (max(q[iw, ip, 0], 0.0) * rho0[0] * cw
                         + max(q[iw, ip, 1], 0.0) * rho0[1] * co
                         + max(q[iw, ip, 2], 0.0) * rho0[2] * cg)
                    if h > 0.0:
                        cell = int(cells_w[iw, ip])
                        diag = diag.at[cell].add(h)
                        rhs = rhs.at[cell].add(h * float(t_inj))

        def matvec(x):
            y = diag * x
            y = y.at[f.left].add(off_lr * x[f.right])
            y = y.at[f.right].add(off_rl * x[f.left])
            return y

        inv_d = 1.0 / diag
        res = bicgstab(matvec, lambda r: inv_d * r, rhs, x0=self.T,
                       tol=1e-9, maxiter=300)
        self.T = jnp.clip(res.x, 250.0, 700.0)
        self._c_old = c_new
