"""Extended black-oil components: polymer, brine (salt), foam.

Rebuild of the reference's extended-model variants
(flow/flow_ebos_{polymer,brine,foam}.cpp dispatched by Main.hpp:240-279;
physics from opm-models' blackoilpolymermodules/blackoilbrinemodules/
blackoilfoammodules). The reference solves the extra conservation
equation fully implicitly inside the 4x4-block system; here the component
is transported **implicitly after each converged substep** on the
converged phase fluxes (the same operator-split the tracer model uses,
ebos/ecltracermodel.hh:362) and couples BACK into the black-oil equations
through per-cell phase-mobility multipliers evaluated at the lagged
concentration (CellStatic.mob_mult):

  * polymer: water viscosity multiplier from PLYVISC + permeability
    reduction RRF scaled by adsorbed fraction (PLYROCK/PLYADS), i.e.
    mob_w /= visc_mult(c) * RK(ads); adsorption storage enters the
    transport equation semi-implicitly; dead pore volume shrinks the
    polymer-accessible PV.
  * brine: water viscosity from the PVTWSALT table vs the transported
    salt concentration (relative to the table's reference salt).
  * foam: gas mobility multiplied by the FOAMMOB reduction factor of the
    transported (gas-phase) surfactant concentration.
  * solvent: the solvent fraction of the gas stream is transported and
    feeds a Todd-Longstaff 1/4-power viscosity mixing rule (TLMIXPAR
    omega) against the PVDS solvent viscosity; the gas mobility picks up
    mu_g / mu_eff (reference: flow_ebos_solvent.cpp + opm-models
    blackoilsolventmodules' Todd-Longstaff model).

The split is first-order in dt — the same order as the reference's
explicit connection densities and drift compensation — and converges to
the reference's behavior at the timestep sizes the regression decks use.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.models.blackoil import face_flux, intensive
from opm_autodiff_tpu.props.tables import interp1d
from opm_autodiff_tpu.solvers.linear import bicgstab


class ComponentModel:
    """Owns the concentration fields and the mobility feedback."""

    def __init__(self, state, geo, fs, cells, faces,
                 polymer_external: bool = False,
                 brine_external: bool = False,
                 foam_external: bool = False,
                 solvent_external: bool = False):
        """``polymer_external`` / ``brine_external`` / ``foam_external``
        / ``solvent_external`` disable the split handling of that
        component when the simulator runs it fully implicitly in the
        block system (models/polymer.py, models/transport4.py); the
        others still split here."""
        self.fs = fs
        self.cells = cells
        self.faces = faces
        self.geo = geo
        ext = state.runspec.extensions
        comp = state.components
        n = geo.num_active

        self.has_polymer = ("POLYMER" in ext and "PLYVISC" in comp
                            and not polymer_external)
        self.has_brine = ("BRINE" in ext and "PVTWSALT" in comp
                          and not brine_external)
        self.has_foam = ("FOAM" in ext and "FOAMMOB" in comp
                         and not foam_external)
        self.has_solvent = ("SOLVENT" in ext and "PVDS" in comp
                            and not solvent_external)

        # --- polymer tables (region 1; PLY* region banking later) ---
        if self.has_polymer:
            t = np.asarray(comp["PLYVISC"][0])
            self.plyvisc_c = jnp.asarray(t[:, 0])
            self.plyvisc_m = jnp.asarray(t[:, 1])
            rock = (comp.get("PLYROCK") or [{}])[0]
            self.dead_pore = float(rock.get("dead_pore", 0.0))
            self.rrf = float(rock.get("rrf", 1.0))
            self.rock_density = float(rock.get("rock_density", 0.0))
            self.ads_index = int(rock.get("ads_index", 1))
            self.max_ads = float(rock.get("max_ads", 0.0))
            if "PLYADS" in comp:
                ta = np.asarray(comp["PLYADS"][0])
                self.plyads_c = jnp.asarray(ta[:, 0])
                self.plyads_a = jnp.asarray(ta[:, 1])
            else:
                self.plyads_c = jnp.asarray([0.0, 1.0])
                self.plyads_a = jnp.asarray([0.0, 0.0])
            self.c_poly = jnp.zeros(n)
            self.ads = jnp.zeros(n)  # adsorbed mass per rock mass
        # --- brine tables ---
        if self.has_brine:
            ps = comp["PVTWSALT"]
            tab = np.asarray(ps["table"])
            self.salt_nodes = jnp.asarray(tab[:, 0])
            self.salt_mu = jnp.asarray(tab[:, 3])
            self.salt_ref_mu = float(tab[0, 3])
            # initial salt from SALTVD (depth table) or zero
            if "SALTVD" in comp:
                t = np.asarray(comp["SALTVD"][0])
                self.c_salt = jnp.asarray(
                    np.interp(np.asarray(geo.depth), t[:, 0], t[:, 1]))
            else:
                self.c_salt = jnp.zeros(n)
        # --- foam tables ---
        if self.has_foam:
            t = np.asarray(comp["FOAMMOB"][0])
            self.foam_c = jnp.asarray(t[:, 0])
            self.foam_m = jnp.asarray(t[:, 1])
            self.c_foam = jnp.zeros(n)
        # --- solvent tables ---
        self.has_misc = False
        if self.has_solvent:
            t = np.asarray(comp["PVDS"][0])
            self.pvds_p = jnp.asarray(t[:, 0])
            self.pvds_mu = jnp.asarray(t[:, 2])
            self.tl_omega = float(comp.get("TLMIXPAR", 1.0))
            self.c_solv = jnp.zeros(n)  # solvent fraction of gas stream
            # full miscible model (MISCIBLE + MISC/PMISC/SSFN; reference:
            # opm-material blackoilsolventmodules isMiscible() path):
            # MISC scales the Todd-Longstaff mixing by the miscibility
            # function of the solvent fraction, PMISC by pressure; SSFN
            # splits the gas-stream relperm between gas and solvent.
            self.has_misc = "MISCIBLE" in ext
            self.misc_tab = None
            self.pmisc_tab = None
            self.ssfn_tab = None
            if self.has_misc and "MISC" in comp:
                tm = np.asarray(comp["MISC"][0])
                self.misc_tab = (jnp.asarray(tm[:, 0]), jnp.asarray(tm[:, 1]))
            if self.has_misc and "PMISC" in comp:
                tp = np.asarray(comp["PMISC"][0])
                self.pmisc_tab = (jnp.asarray(tp[:, 0]),
                                  jnp.asarray(tp[:, 1]))
            # miscible endpoint shifts (SORWMIS/SGCWMIS): interpolated
            # into the cells' EPS channels each substep (reference:
            # blackoilsolventmodules miscibleResidualOilSaturation /
            # miscibleCriticalGasSaturation)
            self.sorwmis = None
            self.sgcwmis = None
            self.msfn_tab = None
            if self.has_misc and "MSFN" in comp:
                tn = np.asarray(comp["MSFN"][0])
                self.msfn_tab = (jnp.asarray(tn[:, 0]),
                                 jnp.asarray(tn[:, 1]),
                                 jnp.asarray(tn[:, 2]))
            if self.has_misc and "SORWMIS" in comp:
                tw = np.asarray(comp["SORWMIS"][0])
                self.sorwmis = (jnp.asarray(tw[:, 0]), jnp.asarray(tw[:, 1]))
            if self.has_misc and "SGCWMIS" in comp:
                tg = np.asarray(comp["SGCWMIS"][0])
                self.sgcwmis = (jnp.asarray(tg[:, 0]), jnp.asarray(tg[:, 1]))
            if "SSFN" in comp:
                ts = np.asarray(comp["SSFN"][0])
                self.ssfn_tab = (jnp.asarray(ts[:, 0]),
                                 jnp.asarray(ts[:, 1]),
                                 jnp.asarray(ts[:, 2]))

        self._m_old = None
        self._sat = None
        self._rs = None

    @property
    def active(self) -> bool:
        return (self.has_polymer or self.has_brine or self.has_foam
                or self.has_solvent)

    # ------------------------------------------------------------------
    def mobility_multipliers(self) -> jnp.ndarray:
        """Per-cell [N,3] phase mobility multipliers at current concs."""
        n = self.cells.pore_vol_ref.shape[0]
        mw = jnp.ones(n)
        mg = jnp.ones(n)
        if self.has_polymer:
            visc_mult = jnp.maximum(
                interp1d(self.c_poly, self.plyvisc_c, self.plyvisc_m,
                         extrapolate=False), 1.0)
            if self.max_ads > 0:
                rk = 1.0 + (self.rrf - 1.0) * jnp.clip(
                    self.ads / self.max_ads, 0.0, 1.0)
            else:
                rk = jnp.ones(n)
            mw = mw / (visc_mult * rk)
        if self.has_brine:
            mu_salt = interp1d(self.c_salt, self.salt_nodes, self.salt_mu,
                               extrapolate=False)
            mw = mw * (self.salt_ref_mu / jnp.maximum(mu_salt, 1e-12))
        if self.has_foam:
            mr = jnp.clip(interp1d(self.c_foam, self.foam_c, self.foam_m,
                                   extrapolate=False), 1e-3, 1.0)
            mg = mg * mr
        mo = jnp.ones(n)
        if self.has_solvent:
            # Todd-Longstaff: mu_mix^(-1/4) = (1-c) mu_g^(-1/4)
            #                               + c mu_s^(-1/4);
            # per-component effective viscosities
            #   mu_g_eff = mu_g^(1-w) mu_mix^w, mu_s_eff = mu_s^(1-w) mu_mix^w
            # with the mixing exponent w scaled by the MISC/PMISC
            # miscibility under the full miscible model.
            p_cell = self._p_cell
            mu_g = jax.vmap(lambda pp, rr: self.fs.gas_viscosity(pp, 0.0, rr[1])
                            )(p_cell, self.cells.regs)
            mu_s = jnp.maximum(interp1d(p_cell, self.pvds_p, self.pvds_mu,
                                        extrapolate=False), 1e-12)
            c = jnp.clip(self.c_solv, 0.0, 1.0)
            w = self.tl_omega * self._misc_factor(c, p_cell)
            inv4 = ((1.0 - c) * mu_g ** -0.25 + c * mu_s ** -0.25)
            mu_mix = inv4 ** -4.0
            mu_g_eff = jnp.maximum(mu_g ** (1.0 - w) * mu_mix ** w, 1e-12)
            mu_s_eff = jnp.maximum(mu_s ** (1.0 - w) * mu_mix ** w, 1e-12)
            # SSFN: split of the gas-stream relperm between gas and
            # solvent as a function of the solvent fraction (defaults to
            # the linear split)
            if self.ssfn_tab is not None:
                nodes, kg_m, ks_m = self.ssfn_tab
                kg = jnp.clip(interp1d(c, nodes, kg_m, extrapolate=False),
                              0.0, 1.0)
                ks = jnp.clip(interp1d(c, nodes, ks_m, extrapolate=False),
                              0.0, 1.0)
            else:
                kg, ks = 1.0 - c, c
            # total stream mobility multiplier on krg(Sg_total)/mu_g
            mg = mg * mu_g * (kg / mu_g_eff + ks / mu_s_eff)
            if self.has_misc and self.msfn_tab is not None \
                    and self._sat is not None:
                # MSFN miscible saturation functions: under miscibility
                # the hydrocarbon relperm krn (= krow at the water
                # saturation) splits between oil and gas+solvent by the
                # MSFN multipliers of the normalized gas+solvent
                # fraction (reference: blackoilsolventmodules' miscible
                # relative permeability path). Expressed as lagged
                # mobility-multiplier blends; the endpoint effects ride
                # the SORWMIS/SGCWMIS EPS channels.
                sw_l = self._sat[:, 0]
                so_l = self._sat[:, 1]
                sg_l = self._sat[:, 2]
                sn = sg_l / jnp.maximum(so_l + sg_l, 1e-12)
                regs0 = self.cells.regs[:, 0]
                sat = self.fs.sat
                krn = jax.vmap(lambda s, r: sat.krow(s, r))(sw_l, regs0)
                krg_now = jax.vmap(lambda s, r: sat.krg(s, r))(sg_l, regs0)
                kro_now = jax.vmap(lambda s, g, r: sat.kro(s, g, r))(
                    sw_l, sg_l, regs0)
                nodes, krsg_mult, kro_mult = self.msfn_tab
                kg_mis = jnp.clip(interp1d(sn, nodes, krsg_mult,
                                           extrapolate=False), 0.0, 1.0)
                ko_mis = jnp.clip(interp1d(sn, nodes, kro_mult,
                                           extrapolate=False), 0.0, 1.0)
                m_here = self._misc_factor(c, p_cell)
                krg_eff = (1.0 - m_here) * krg_now + m_here * kg_mis * krn
                kro_eff = (1.0 - m_here) * kro_now + m_here * ko_mis * krn
                # a multiplicative correction is only well-defined where
                # the immiscible relperm is alive: gate it off smoothly
                # as kr -> 0 (the 0/0 limit at phase appearance must
                # leave the mobility untouched, not zero it), and cap
                # the swing between lagged substeps
                def blend(kr_eff, kr_now):
                    ratio = jnp.clip(kr_eff / jnp.maximum(kr_now, 1e-4),
                                     0.0, 20.0)
                    alpha = kr_now / (kr_now + 1e-3)
                    return 1.0 + alpha * (ratio - 1.0)

                mg = mg * blend(krg_eff, krg_now)
                mo = mo * blend(kro_eff, kro_now)
            if self.has_misc and self._sat is not None:
                # miscible oil: TL mixing of the oil viscosity with the
                # solvent by the solvent fraction of the oil+solvent
                # volume (reference blackoilsolventmodules effective oil
                # viscosity)
                so = self._sat[:, 1]
                ss = c * self._sat[:, 2]
                fos = ss / jnp.maximum(so + ss, 1e-12)
                mu_o = jax.vmap(
                    lambda pp, rr_, rg_: self.fs.oil_viscosity(pp, rr_, rg_)
                )(p_cell, self._rs, self.cells.regs[:, 1])
                mu_mix_os = ((1.0 - fos) * mu_o ** -0.25
                             + fos * mu_s ** -0.25) ** -4.0
                mu_o_eff = jnp.maximum(
                    mu_o ** (1.0 - w) * mu_mix_os ** w, 1e-12)
                mo = mo * (mu_o / mu_o_eff)
        return jnp.stack([mw, mo, mg], axis=1)

    def _misc_factor(self, c, p_cell):
        """Miscibility in [0,1]: MISC(solvent fraction) x PMISC(p)."""
        m = jnp.ones_like(c)
        if self.misc_tab is not None:
            m = jnp.clip(interp1d(c, *self.misc_tab, extrapolate=False),
                         0.0, 1.0)
        if self.pmisc_tab is not None:
            m = m * jnp.clip(interp1d(p_cell, *self.pmisc_tab,
                                      extrapolate=False), 0.0, 1.0)
        return m

    def eps_endpoint_channels(self) -> dict:
        """Per-cell EPS channel overrides for the miscible endpoint
        shifts: {3: sw-where-krow-vanishes, 4: critical gas}. The
        residual oil / critical gas interpolate between the immiscible
        table endpoints and the SORWMIS/SGCWMIS values by the
        miscibility factor."""
        if not self.has_solvent or not self.has_misc or self._sat is None:
            return {}
        if self.sorwmis is None and self.sgcwmis is None:
            return {}
        c = jnp.clip(self.c_solv, 0.0, 1.0)
        m = self._misc_factor(c, self._p_cell)
        sw = self._sat[:, 0]
        regs = self.cells.regs[:, 0]
        sat = self.fs.sat
        out = {}
        if self.sorwmis is not None:
            sw0w_t = sat.t_sw0w[regs]
            sor_base = 1.0 - sw0w_t
            sor_mis = jnp.clip(interp1d(sw, *self.sorwmis,
                                        extrapolate=False), 0.0, 1.0)
            sor_eff = (1.0 - m) * sor_base + m * sor_mis
            out[3] = 1.0 - sor_eff
        if self.sgcwmis is not None:
            sgcr_t = sat.t_sgcr[regs]
            sgc_mis = jnp.clip(interp1d(sw, *self.sgcwmis,
                                        extrapolate=False), 0.0, 1.0)
            out[4] = (1.0 - m) * sgcr_t + m * sgc_mis
        return out

    # ------------------------------------------------------------------
    def _phase_volumes(self, u, flag):
        q = jax.vmap(intensive, in_axes=(None, 0, 0, 0))(
            self.fs, u, flag, self.cells.regs)
        # lagged saturations/Rs feed the miscible-oil viscosity mixing
        self._sat = q.sat
        self._rs = q.rs
        pv = self.cells.pore_vol_ref
        m = pv[:, None] * q.sat * q.inv_b  # [N,3] phase surface volumes
        gas_total = m[:, 2] + pv * q.rs * q.sat[:, 1] * q.inv_b[:, 1]
        return m.at[:, 2].set(gas_total)

    def initialize(self, u, flag):
        if self.active:
            self._m_old = self._phase_volumes(u, flag)
            self._p_cell = u[:, 0]

    # ------------------------------------------------------------------
    def _transport(self, c_old, m_old, m_new, flux_ph, dt, q_perf, ws,
                   inj_conc, extra_diag=0.0, extra_rhs=0.0):
        """One implicit upwind transport solve.

        Conservative "explicit mass, implicit concentration" form: the
        new storage is DERIVED from the step's own fluxes
        (m_cons = m_old - dt*div F + dt*q), which makes c_new an exact
        convex combination of c_old, upstream c and the injected
        concentration — bounded regardless of the black-oil CNV slack.
        After diag substitution that is simply
            diag = m_old/dt + face inflows + injection rate
        (production and outflow cancel). extra_diag/extra_rhs carry the
        semi-implicit polymer adsorption."""
        f = self.faces
        diag = m_old / dt + extra_diag
        rhs = m_old * c_old / dt + extra_rhs

        pos = jnp.maximum(flux_ph, 0.0)   # flux L -> R
        neg = jnp.maximum(-flux_ph, 0.0)  # flux R -> L
        # inflow terms on the diagonal; upstream concentration off-diagonal
        diag = diag.at[f.left].add(neg)
        diag = diag.at[f.right].add(pos)
        off_lr = -neg  # row L, col R
        off_rl = -pos  # row R, col L

        q = np.asarray(q_perf) if q_perf is not None else None
        if q is not None:
            cells_w = np.asarray(ws.cell)
            for iw in range(q.shape[0]):
                for ip in range(q.shape[1]):
                    cell = int(cells_w[iw, ip])
                    qp = q[iw, ip]
                    if qp > 0.0:  # injection dilutes/feeds at inj_conc
                        diag = diag.at[cell].add(qp)
                        if inj_conc[iw] > 0.0:
                            rhs = rhs.at[cell].add(qp * inj_conc[iw])

        def matvec(x):
            y = diag * x
            y = y.at[f.left].add(off_lr * x[f.right])
            y = y.at[f.right].add(off_rl * x[f.left])
            return y

        inv_d = 1.0 / diag
        res = bicgstab(matvec, lambda r: inv_d * r, rhs, x0=c_old,
                       tol=1e-9, maxiter=300)
        return jnp.clip(res.x, 0.0, None)

    def advance(self, u, flag, dt, q_perf, ws, well_confs):
        """Advance all component fields after an accepted substep."""
        if not self.active:
            return
        f = self.faces
        rg = self.cells.regs
        mm = self.cells.mob_mult
        flux = jax.vmap(face_flux,
                        in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, None, 0, 0))(
            self.fs, u[f.left], u[f.right], flag[f.left], flag[f.right],
            f.trans, f.gdz, rg[f.left], rg[f.right], 0.0,
            mm[f.left], mm[f.right])  # [F,3] positive L->R
        m_new = self._phase_volumes(u, flag)
        self._p_cell = u[:, 0]
        m_old = self._m_old if self._m_old is not None else m_new
        qp = np.asarray(q_perf)[:, :, 0] if q_perf is not None else None
        qg = np.asarray(q_perf)[:, :, 2] if q_perf is not None else None

        pv = self.cells.pore_vol_ref
        if self.has_polymer:
            inj = np.asarray([getattr(w, "poly_conc", 0.0)
                              for w in well_confs])
            # semi-implicit Langmuir-table adsorption:
            # d/dt[rock_mass * ads(c)] with ads(c) linearized at c0:
            # adds rock_mass*ads'(c0)/dt to the diagonal and
            # rock_mass*(ads'(c0)*c0 - (ads(c0) - ads_prev))/dt to the rhs
            if self.rock_density > 0:
                rock_mass = jnp.asarray(
                    self.rock_density * (1.0 - np.asarray(self.geo.poro))
                    * np.asarray(self.geo.volume))
            else:
                rock_mass = jnp.zeros_like(pv)
            c0 = self.c_poly
            ads0 = interp1d(c0, self.plyads_c, self.plyads_a,
                            extrapolate=False)
            ads_slope = (interp1d(c0 + 1e-7, self.plyads_c, self.plyads_a,
                                  extrapolate=False) - ads0) / 1e-7
            ads_prev = self.ads
            extra_diag = rock_mass * ads_slope / dt
            extra_rhs = rock_mass * (ads_slope * c0
                                     - (ads0 - ads_prev)) / dt
            m_poly_new = (1.0 - self.dead_pore) * m_new[:, 0]
            m_poly_old = (1.0 - self.dead_pore) * m_old[:, 0]
            c = self._transport(self.c_poly, m_poly_old, m_poly_new,
                                flux[:, 0], dt, qp, ws, inj,
                                extra_diag, extra_rhs)
            ads_new = interp1d(c, self.plyads_c, self.plyads_a,
                               extrapolate=False)
            if self.ads_index == 1:  # no desorption
                ads_new = jnp.maximum(ads_new, self.ads)
            self.c_poly = c
            self.ads = ads_new
        if self.has_brine:
            inj = np.asarray([getattr(w, "salt_conc", 0.0)
                              for w in well_confs])
            self.c_salt = self._transport(self.c_salt, m_old[:, 0],
                                          m_new[:, 0], flux[:, 0], dt,
                                          qp, ws, inj)
        if self.has_foam:
            inj = np.asarray([getattr(w, "foam_conc", 0.0)
                              for w in well_confs])
            self.c_foam = self._transport(self.c_foam, m_old[:, 2],
                                          m_new[:, 2], flux[:, 2], dt,
                                          qg, ws, inj)
        if self.has_solvent:
            inj = np.asarray([getattr(w, "solv_frac", 0.0)
                              for w in well_confs])
            self.c_solv = jnp.clip(
                self._transport(self.c_solv, m_old[:, 2], m_new[:, 2],
                                flux[:, 2], dt, qg, ws, inj), 0.0, 1.0)
        self._m_old = m_new

    def totals(self) -> dict:
        out = {}
        if self.has_polymer:
            out["FCIP"] = float((self.c_poly * self._m_old[:, 0]).sum())
        if self.has_brine:
            out["FSIP"] = float((self.c_salt * self._m_old[:, 0]).sum())
        return out
