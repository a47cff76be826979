"""Passive tracers: per-phase transport solved after each substep.

Rebuild of EclTracerModel (reference: ebos/ecltracermodel.hh:57, flux
:182,280, advanceTracerFields :362): tracers ride a phase; after each
converged substep an implicit (backward-Euler) upwind transport system —
one unknown per cell per tracer — is assembled from the converged phase
fluxes and solved. The reference batches tracers through one factorized
matrix (linearSolveBatchwise_); here each tracer's solve is a
Jacobi-BiCGStab on the same scalar topology, vmappable over tracers.

Deck: TRACER (name + phase), TBLKF<name> (initial concentration),
WTRACER (injection concentration per well).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.models.blackoil import face_flux, intensive
from opm_autodiff_tpu.solvers.linear import bicgstab

_PHASE_OF = {"WAT": 0, "WATER": 0, "OIL": 1, "GAS": 2}


@dataclasses.dataclass
class TracerDef:
    name: str
    phase: int


class TracerModel:
    def __init__(self, state, geo, fs, cells, faces):
        self.fs = fs
        self.cells = cells
        self.faces = faces
        self.defs: list[TracerDef] = []
        self.conc = None       # [T, N]
        self.wtracer = {}      # (well_name, tracer_name) -> concentration
        self._m_old = None     # [T, N] phase surface volumes at last commit

        deck_defs = state.tracers.get("TRACER", [])
        n = geo.num_active
        concs = []
        for rec in deck_defs:
            name = str(rec[0])
            phase = _PHASE_OF.get(str(rec[1]).upper(), 1)
            self.defs.append(TracerDef(name, phase))
            init = state.tracers.get(f"TBLKF{name}", None)
            if init is not None:
                full = np.zeros(len(geo.glob_to_act))
                vals = np.asarray(init, float)
                full[:len(vals)] = vals
                concs.append(full[geo.act_to_glob])
            else:
                concs.append(np.zeros(n))
        if self.defs:
            self.conc = jnp.asarray(np.stack(concs))
        for rec in state.tracers.get("WTRACER", []):
            self.wtracer[(str(rec[0]), str(rec[1]))] = float(rec[2])

    @property
    def active(self) -> bool:
        return bool(self.defs)

    # ------------------------------------------------------------------
    def _phase_masses(self, u, flag):
        """Surface volumes of each tracer carrier per cell [N,3].

        Water/oil tracers ride their phase; the GAS tracer rides the total
        gas *component* (free + dissolved, matching the gas flux which
        includes Rs*F_o) — otherwise an undersaturated reservoir has zero
        gas storage and the transport system is singular.
        """
        q = jax.vmap(intensive, in_axes=(None, 0, 0, 0))(
            self.fs, u, flag, self.cells.regs)
        pv = self.cells.pore_vol_ref
        m = pv[:, None] * q.sat * q.inv_b  # [N,3] phase surface volumes
        gas_total = m[:, 2] + pv * q.rs * q.sat[:, 1] * q.inv_b[:, 1]
        return m.at[:, 2].set(gas_total)

    def initialize(self, u, flag):
        if self.active:
            m = self._phase_masses(u, flag)
            self._m_old = jnp.stack([m[:, d.phase] for d in self.defs])

    def advance(self, u, flag, dt, q_perf, ws, well_names):
        """Advance all tracer fields after an accepted substep."""
        if not self.active:
            return
        f = self.faces
        rg = self.cells.regs
        flux = jax.vmap(face_flux, in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0))(
            self.fs, u[f.left], u[f.right], flag[f.left], flag[f.right],
            f.trans, f.gdz, rg[f.left], rg[f.right])  # [F,3], positive L->R
        m_new_all = self._phase_masses(u, flag)
        q = np.asarray(q_perf)  # [W,P,3] into cells

        new_conc = []
        new_m = []
        for it, d in enumerate(self.defs):
            ph = d.phase
            fl = flux[:, ph]
            m_new = jnp.maximum(m_new_all[:, ph], 1e-12)
            m_old = self._m_old[it]
            c_old = self.conc[it]

            # conservative "explicit mass, implicit concentration" form:
            # diag = m_old/dt + inflows + injection (outflow/production
            # cancel against the flux-derived storage), which bounds the
            # new concentration by the incoming ones regardless of the
            # black-oil CNV slack (see components.ComponentModel)
            n = m_new.shape[0]
            diag = m_old / dt
            diag = jnp.maximum(diag, 1e-12)
            rhs = m_old * c_old / dt

            pos = jnp.maximum(fl, 0.0)   # L -> R
            neg = jnp.maximum(-fl, 0.0)  # R -> L
            diag = diag.at[f.left].add(neg)
            diag = diag.at[f.right].add(pos)
            off_lr = -neg  # row L, col R coefficient
            off_rl = -pos  # row R, col L

            # wells: injection feeds at the WTRACER concentration and
            # dilutes; production cancels out of the conservative form
            for iw, wname in enumerate(well_names):
                cinj = self.wtracer.get((wname, d.name), 0.0)
                for ip in range(q.shape[1]):
                    cell = int(ws.cell[iw, ip])
                    qp = q[iw, ip, ph]
                    if qp > 0.0:
                        diag = diag.at[cell].add(qp)
                        if cinj > 0.0:
                            rhs = rhs.at[cell].add(qp * cinj)

            def matvec(x):
                y = diag * x
                y = y.at[f.left].add(off_lr * x[f.right])
                y = y.at[f.right].add(off_rl * x[f.left])
                return y

            inv_d = 1.0 / diag

            res = bicgstab(matvec, lambda r: inv_d * r, rhs, x0=c_old,
                           tol=1e-9, maxiter=200)
            c = jnp.clip(res.x, 0.0, None)
            new_conc.append(c)
            new_m.append(m_new_all[:, ph])
        self.conc = jnp.stack(new_conc)
        self._m_old = jnp.stack(new_m)

    # ------------------------------------------------------------------
    def totals(self) -> dict:
        """In-place tracer amounts (for summary/material balance)."""
        out = {}
        if not self.active:
            return out
        for it, d in enumerate(self.defs):
            out[d.name] = float((self.conc[it] * self._m_old[it]).sum())
        return out
