"""Group controls: target apportioning by guide rates + economic limits.

Rebuild of the slice of the reference's group layer that SPE9-class decks
exercise (WellGroupHelpers.hpp:104 updateGuideRates /
checkGroupConstraintsProd :298, TargetCalculator, GroupState): wells whose
WCONPROD/WCONINJE control is ``GRUP`` receive a share of their group's
GCONPROD/GCONINJE target, apportioned by guide rates. Guide rates default
to the wells' most recent production rates of the control phase (falling
back to equal split before any rates exist) — the reference's default
guide-rate scheme is likewise potential/rate based.

Host-side (tiny data), re-evaluated every substep so wells that hit BHP
limits shed their share to the rest of the group — the reference reaches
the same fixed point through per-iteration constraint re-checks.

WECON economic limits shut wells at report-step boundaries
(reference: BlackoilWellModel WTEST/WECON handling, _impl.hpp:374).
"""

from __future__ import annotations

import numpy as np

_PHASE_COL = {"ORAT": 1, "WRAT": 0, "GRAT": 2, "LRAT": None, "RESV": None}


class GroupManager:
    def __init__(self, groups: dict, wells: list):
        self.tree = groups.get("tree", {})
        self.prod = groups.get("prod", {})
        self.inj = groups.get("inj", {})
        self.wells = wells

    @property
    def active(self) -> bool:
        if not (self.prod or self.inj):
            return False
        return any(w.control_mode == "GRUP" for w in self.wells)

    def _members(self, group: str, injector: bool,
                 any_mode: bool = False) -> list[int]:
        """Indices of wells in this group's subtree.

        ``any_mode=False`` keeps only GRUP-controlled wells (target
        apportioning); ``any_mode=True`` keeps every well (production
        accounting for REIN/VREP)."""
        out = []
        for iw, w in enumerate(self.wells):
            if w.is_injector != injector:
                continue
            if not any_mode and w.control_mode != "GRUP":
                continue
            g = w.group
            while g:
                if g == group:
                    out.append(iw)
                    break
                g = self.tree.get(g, "")
        return out

    def effective_controls(self, last_rates: np.ndarray | None,
                           voidage_coeff: np.ndarray | None = None):
        """Per-well (mode, target) assignments for GRUP wells.

        last_rates: [W,3] surface rates into cells (negative = production)
        from the previous substep, or None before the first one.
        voidage_coeff: [W,3] surface->reservoir-volume coefficients
        (feeds VREP voidage accounting).
        Returns {well_index: (mode_str, target_si)}.
        """
        out = {}
        nw = len(self.wells)
        rates = (np.maximum(-last_rates, 0.0) if last_rates is not None
                 else np.zeros((nw, 3)))

        for gname, gc in self.prod.items():
            mode = gc.get("mode", "NONE")
            if mode in ("NONE", "FLD"):
                continue
            target = {"ORAT": gc.get("orat"), "WRAT": gc.get("wrat"),
                      "GRAT": gc.get("grat"), "LRAT": gc.get("lrat"),
                      "RESV": gc.get("resv")}.get(mode)
            if target is None:
                continue
            members = self._members(gname, injector=False)
            if not members:
                continue
            col = _PHASE_COL[mode]
            if col is None:  # liquid = oil + water
                guide = rates[members, 0] + rates[members, 1]
            else:
                guide = rates[members, col]
            if guide.sum() <= 0:
                guide = np.ones(len(members))
            guide = guide / guide.sum()
            for gfrac, iw in zip(guide, members):
                out[iw] = (mode, float(target * gfrac))

        inj_rates = (np.maximum(last_rates, 0.0) if last_rates is not None
                     else np.zeros((nw, 3)))
        for gname, phases in self.inj.items():
            for phase, gc in phases.items():
                mode = gc.get("mode", "NONE")
                col = {"WATER": 0, "WAT": 0, "OIL": 1, "GAS": 2}[phase]
                assign_mode = "RATE"
                if mode == "RATE":
                    target = gc.get("rate")
                elif mode == "RESV":
                    target = gc.get("resv")
                    assign_mode = "RESV"
                elif mode == "REIN":
                    # reinjection: fraction of the group's produced rate
                    # of the injected phase (reference: WellGroupHelpers
                    # REIN target)
                    prods = self._members(gname, injector=False,
                                          any_mode=True)
                    target = gc.get("rein_frac", 1.0) * float(
                        rates[prods, col].sum()) if prods else 0.0
                elif mode == "VREP":
                    # voidage replacement: fraction of the group's
                    # produced reservoir-volume rate, injected as a
                    # reservoir-volume (RESV) target
                    prods = self._members(gname, injector=False,
                                          any_mode=True)
                    if voidage_coeff is None or not prods:
                        target = None
                    else:
                        voidage = float(
                            (voidage_coeff[prods] * rates[prods]).sum())
                        target = gc.get("vrep_frac", 1.0) * voidage
                    assign_mode = "RESV"
                else:
                    continue
                if target is None:
                    continue
                members = [iw for iw in self._members(gname, injector=True)
                           if (self.wells[iw].inj_phase or "GAS") == phase]
                if not members:
                    continue
                guide = inj_rates[members, col]
                if guide.sum() <= 0:
                    guide = np.ones(len(members))
                guide = guide / guide.sum()
                for gfrac, iw in zip(guide, members):
                    out[iw] = (assign_mode, float(target * gfrac))
        return out


def apply_econ_limits(wells: list, last_rates: np.ndarray | None) -> list[str]:
    """Shut wells violating WECON limits; returns names shut."""
    if last_rates is None:
        return []
    shut = []
    prod = np.maximum(-last_rates, 0.0)
    for iw, w in enumerate(wells):
        if w.is_injector or w.status != "OPEN":
            continue
        orate = prod[iw, 1]
        wrate = prod[iw, 0]
        grate = prod[iw, 2]
        if w.econ_min_oil is not None and 0 < orate < w.econ_min_oil:
            w.status = "SHUT"
            shut.append(w.name)
            continue
        if (getattr(w, "econ_min_gas", None) is not None
                and 0 < grate < w.econ_min_gas):
            w.status = "SHUT"
            shut.append(w.name)
            continue
        if (w.econ_max_wct is not None and orate + wrate > 0
                and wrate / (orate + wrate) > w.econ_max_wct):
            w.status = "SHUT"
            shut.append(w.name)
            continue
        if (getattr(w, "econ_max_gor", None) is not None and orate > 0
                and grate / orate > w.econ_max_gor):
            w.status = "SHUT"
            shut.append(w.name)
    return shut


def apply_assignments(ws, assigns: dict):
    """Return a WellSet with GRUP wells' modes/targets overwritten."""
    import jax.numpy as jnp

    from opm_autodiff_tpu.wells.standard import (CTRL_GRAT, CTRL_LRAT,
                                                 CTRL_ORAT, CTRL_RATE,
                                                 CTRL_RESV, CTRL_WRAT)
    if not assigns:
        return ws
    mode = np.asarray(ws.ctrl_mode).copy()
    orat = np.asarray(ws.orat).copy()
    wrat = np.asarray(ws.wrat).copy()
    grat = np.asarray(ws.grat).copy()
    lrat = np.asarray(ws.lrat).copy()
    inj_rate = np.asarray(ws.inj_rate).copy()
    resv = np.asarray(ws.resv_rate).copy()
    midx = {"ORAT": CTRL_ORAT, "WRAT": CTRL_WRAT, "GRAT": CTRL_GRAT,
            "LRAT": CTRL_LRAT, "RATE": CTRL_RATE, "RESV": CTRL_RESV}
    for iw, (m, target) in assigns.items():
        mode[iw] = midx[m]
        if m == "ORAT":
            orat[iw] = target
        elif m == "WRAT":
            wrat[iw] = target
        elif m == "GRAT":
            grat[iw] = target
        elif m == "LRAT":
            lrat[iw] = target
        elif m == "RATE":
            inj_rate[iw] = target
        elif m == "RESV":
            resv[iw] = target
    return ws._replace(ctrl_mode=jnp.asarray(mode), orat=jnp.asarray(orat),
                       wrat=jnp.asarray(wrat), grat=jnp.asarray(grat),
                       lrat=jnp.asarray(lrat), inj_rate=jnp.asarray(inj_rate),
                       resv_rate=jnp.asarray(resv))
