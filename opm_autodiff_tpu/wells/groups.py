"""Group controls: reference-semantics target apportioning.

Rebuild of the reference's group layer (WellGroupHelpers.{hpp,cpp},
TargetCalculator, FractionCalculator, GroupState):

* **Target reduction** (updateGroupTargetReduction,
  WellGroupHelpers.cpp:300): a group's apportionable target is its
  GCONPROD/GCONINJE target minus the efficiency-weighted production of
  every subtree well NOT under this group's control — wells on their own
  controls (ORAT/BHP/...), wells whose nearest controlling ancestor is a
  descendant group with an explicit control, and wells marked
  unavailable by WGRUPCON.
* **Chain apportioning** (FractionCalculator, WellGroupHelpers.cpp:931;
  getGroupProductionControl, WellInterfaceEval.cpp:178): with default
  (child-sum) group guide rates the per-level local fractions telescope,
  so a member well's share is gr(well) / sum of gr over the control
  group's included subtree wells. Reductions are applied at the control
  level (the reference applies intermediate-level reductions only where
  explicit group guide rates exist, which GUIDERAT does not define).
* **Guide rates**: WGRUPCON fixed values, else the GUIDERAT potential
  formula GR = POT^A / (B + C*WCT^D + E*GOR^F) with damping and
  allow-increase handling (reference: opm-common GuideRateModel via
  updateGuideRates, WellGroupHelpers.hpp:104), else the well's current
  rate of the control phase.
* **Nested caps** (checkGroupConstraintsProd, WellGroupHelpers.cpp:1055
  via updateGroupIndividualControl): a group whose GCONPROD mode is FLD
  but which carries rate targets has those targets enforced as limits —
  when the subtree rate exceeds one, the group switches to that mode
  (the most-violated constraint wins) and becomes a control group for
  its subtree.

Host-side (tiny data), re-evaluated every substep; the well control
equations enforce the assigned targets on device. Dynamic group control
switches persist across substeps through the simulator-owned ``memory``
dict (the reference's GroupState analog).

WECON economic limits shut wells at report-step boundaries
(reference: BlackoilWellModel WTEST/WECON handling, _impl.hpp:374).
"""

from __future__ import annotations

import numpy as np

_PHASE_COL = {"ORAT": 1, "WRAT": 0, "GRAT": 2}
_PROD_MODES = ("ORAT", "WRAT", "GRAT", "LRAT", "RESV")


def _mode_rate(row3, mode, vcoef_row=None):
    """Convert a positive-production [3] rate row to the mode's rate
    (TargetCalculator::calcModeRateFromRates analog)."""
    if mode == "LRAT":
        return row3[0] + row3[1]
    if mode == "RESV":
        v = vcoef_row if vcoef_row is not None else np.ones(3)
        return float(np.dot(v, row3))
    return row3[_PHASE_COL[mode]]


class GroupManager:
    def __init__(self, groups: dict, wells: list, memory: dict | None = None):
        self.tree = groups.get("tree", {})
        self.prod = groups.get("prod", {})
        self.inj = groups.get("inj", {})
        self.guiderat = groups.get("guiderat")
        self.wgrupcon = groups.get("wgrupcon", {})
        self.wells = wells
        # dynamic state across substeps: ("gmode", group) -> switched
        # production mode; ("gr", well) -> last guide-rate value
        self.memory = memory if memory is not None else {}

    @property
    def active(self) -> bool:
        if not (self.prod or self.inj):
            return False
        return any(w.control_mode == "GRUP" for w in self.wells)

    # -- tree walking -------------------------------------------------
    def _parent(self, g: str) -> str:
        if g == "FIELD":
            return ""
        return self.tree.get(g, "FIELD")

    def _in_subtree(self, g: str, group: str) -> bool:
        while g:
            if g == group:
                return True
            g = self._parent(g)
        return False

    def _dyn_prod_mode(self, g: str) -> str:
        dyn = self.memory.get(("gmode", g))
        if dyn:
            return dyn
        return (self.prod.get(g) or {}).get("mode", "NONE")

    def _prod_target(self, g: str, mode: str):
        gc = self.prod.get(g) or {}
        return {"ORAT": gc.get("orat"), "WRAT": gc.get("wrat"),
                "GRAT": gc.get("grat"), "LRAT": gc.get("lrat"),
                "RESV": gc.get("resv")}.get(mode)

    def _prod_control_group(self, w) -> str | None:
        """Nearest ancestor with an explicit (non-FLD/NONE) production
        control — the group whose target the well produces a share of
        (getGroupProductionControl recursion, WellInterfaceEval.cpp:178)."""
        g = w.group
        while g:
            if self._dyn_prod_mode(g) not in ("NONE", "FLD"):
                return g
            g = self._parent(g)
        return None

    def _available(self, w) -> bool:
        wc = self.wgrupcon.get(w.name)
        return wc is None or wc.get("available", True)

    def _members(self, group: str, injector: bool,
                 any_mode: bool = False) -> list[int]:
        """Indices of open wells in this group's subtree."""
        out = []
        for iw, w in enumerate(self.wells):
            if w.is_injector != injector:
                continue
            if w.status != "OPEN":
                continue
            if not any_mode and w.control_mode != "GRUP":
                continue
            if self._in_subtree(w.group, group):
                out.append(iw)
        return out

    # -- guide rates --------------------------------------------------
    def _well_guide_rate(self, iw: int, mode: str, prod, pots) -> float:
        """Producer guide rate in the control mode's phase space."""
        w = self.wells[iw]
        wc = self.wgrupcon.get(w.name)
        if wc is not None and wc.get("guide_rate") is not None:
            return wc["guide_rate"] * wc.get("scaling", 1.0)
        p = pots[iw] if pots is not None else prod[iw]
        gm = self.guiderat
        if gm and gm.get("phase", "NONE") != "NONE":
            po, pw, pg = p[1], p[0], p[2]
            pot = {"OIL": po, "LIQ": po + pw, "GAS": pg,
                   "RES": po + pw + pg, "COMB": po + pw + pg
                   }.get(gm["phase"], po)
            if pot <= 0.0:
                gr = 0.0
            else:
                wct = pw / max(po + pw, 1e-30)
                gor = pg / max(po, 1e-30)
                denom = (gm["b"] + gm["c"] * wct ** gm["d"]
                         + gm["e"] * gor ** gm["f"])
                gr = pot ** gm["a"] / max(denom, 1e-30)
            prev = self.memory.get(("gr", w.name))
            if prev is not None:
                if not gm.get("allow_increase", True):
                    gr = min(gr, prev)
                damp = gm.get("damping", 1.0)
                gr = prev + damp * (gr - prev)
            self.memory[("gr", w.name)] = gr
            return gr
        # default: current rate of the control phase
        return _mode_rate(prod[iw], mode if mode in _PHASE_COL
                          or mode == "LRAT" else "ORAT")

    # -- dynamic group constraint switching ---------------------------
    def _update_group_modes(self, prod, vcoef):
        """FLD groups carrying rate targets switch to the most-violated
        mode (updateGroupIndividualControl analog)."""
        for g, gc in self.prod.items():
            if gc.get("mode") != "FLD" or ("gmode", g) in self.memory:
                continue
            worst, worst_ratio = None, 1.0
            members = self._members(g, injector=False, any_mode=True)
            if not members:
                continue
            for mode in _PROD_MODES:
                t = self._prod_target(g, mode)
                if t is None or t <= 0:
                    continue
                tot = sum(self.wells[iw].efac * _mode_rate(
                    prod[iw], mode,
                    vcoef[iw] if vcoef is not None else None)
                    for iw in members)
                if tot > t and tot / t > worst_ratio:
                    worst, worst_ratio = mode, tot / t
            if worst is not None:
                self.memory[("gmode", g)] = worst

    # -- main entry ---------------------------------------------------
    def effective_controls(self, last_rates: np.ndarray | None,
                           voidage_coeff: np.ndarray | None = None,
                           potentials: np.ndarray | None = None):
        """Per-well (mode, target) assignments for GRUP wells.

        last_rates: [W,3] surface rates into cells (negative =
        production) from the previous substep, or None before the first.
        voidage_coeff: [W,3] surface->reservoir-volume coefficients.
        potentials: [W,3] positive production potentials for guide
        rates (None falls back to current rates).
        Returns {well_index: (mode_str, target_si)}.
        """
        out = {}
        nw = len(self.wells)
        prod = (np.maximum(-last_rates, 0.0) if last_rates is not None
                else np.zeros((nw, 3)))
        vc = voidage_coeff

        if last_rates is not None:
            self._update_group_modes(prod, vc)

        # ---- producers: group by control group ----
        by_cg: dict[str, list[int]] = {}
        for iw, w in enumerate(self.wells):
            if (w.is_injector or w.status != "OPEN"
                    or w.control_mode != "GRUP" or not self._available(w)):
                continue
            cg = self._prod_control_group(w)
            if cg is not None:
                by_cg.setdefault(cg, []).append(iw)

        for gname, members in by_cg.items():
            mode = self._dyn_prod_mode(gname)
            target = self._prod_target(gname, mode)
            if target is None:
                continue
            # target reduction: efficiency-weighted production of every
            # open subtree producer that is NOT a member of this
            # control group (updateGroupTargetReduction)
            member_set = set(members)
            red = 0.0
            for iw in self._members(gname, injector=False, any_mode=True):
                if iw in member_set:
                    continue
                red += self.wells[iw].efac * _mode_rate(
                    prod[iw], mode, vc[iw] if vc is not None else None)
            t_eff = max(target - red, 0.0)

            guide = np.array([self._well_guide_rate(iw, mode, prod,
                                                    potentials)
                              for iw in members])
            if guide.sum() <= 0:
                guide = np.ones(len(members))
            guide = guide / guide.sum()
            for gfrac, iw in zip(guide, members):
                efac = max(self.wells[iw].efac, 1e-12)
                out[iw] = (mode, float(t_eff * gfrac / efac))

        # ---- injectors ----
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
                    # of the injected phase (WellGroupHelpers REIN)
                    prods = self._members(gname, injector=False,
                                          any_mode=True)
                    target = gc.get("rein_frac", 1.0) * float(
                        prod[prods, col].sum()) if prods else 0.0
                elif mode == "VREP":
                    # voidage replacement: fraction of the group's
                    # produced reservoir-volume rate, injected as a
                    # reservoir-volume (RESV) target
                    prods = self._members(gname, injector=False,
                                          any_mode=True)
                    if vc is None or not prods:
                        target = None
                    else:
                        voidage = float((vc[prods] * prod[prods]).sum())
                        target = gc.get("vrep_frac", 1.0) * voidage
                    assign_mode = "RESV"
                else:
                    continue
                if target is None:
                    continue
                members = [iw for iw in self._members(gname, injector=True)
                           if (self.wells[iw].inj_phase or "GAS") == phase
                           and self._available(self.wells[iw])]
                if not members:
                    continue
                # injection target reduction: non-GRUP injectors of the
                # phase inside the subtree consume part of the target
                member_set = set(members)
                red = 0.0
                for iw in self._members(gname, injector=True,
                                        any_mode=True):
                    if iw in member_set:
                        continue
                    if (self.wells[iw].inj_phase or "GAS") != phase:
                        continue
                    row = inj_rates[iw]
                    red += self.wells[iw].efac * (
                        float(np.dot(vc[iw], row)) if assign_mode == "RESV"
                        and vc is not None else row.sum())
                t_eff = max(target - red, 0.0)

                guide = inj_rates[np.asarray(members), col]
                if guide.sum() <= 0:
                    guide = np.ones(len(members))
                guide = guide / guide.sum()
                for gfrac, iw in zip(guide, members):
                    efac = max(self.wells[iw].efac, 1e-12)
                    out[iw] = (assign_mode, float(t_eff * gfrac / efac))
        return out


def _worst_connection(w, q_conn: np.ndarray, kind: str) -> int | None:
    """Index (into the well's OPEN completions) of the connection with
    the worst violating ratio; None when fewer than two contribute.
    ``q_conn`` is [P,3] positive production per open connection
    (reference: WellInterface checkRatioEconLimits ->
    checkMaxRatioLimitCompletions, worstOffendingCompletion)."""
    comps = [c for c in w.completions if c.open]
    p = min(len(comps), q_conn.shape[0])
    if p < 2:
        return None
    wrate = q_conn[:p, 0]
    orate = q_conn[:p, 1]
    grate = q_conn[:p, 2]
    if kind == "wct":
        liq = orate + wrate
        ratio = np.where(liq > 0, wrate / np.maximum(liq, 1e-300), 0.0)
    elif kind == "gor":
        ratio = np.where(orate > 0, grate / np.maximum(orate, 1e-300),
                         np.where(grate > 0, np.inf, 0.0))
    else:  # wgr
        ratio = np.where(wrate > 0, grate / np.maximum(wrate, 1e-300),
                         np.where(grate > 0, np.inf, 0.0))
    if not np.any(ratio > 0):
        return None
    return int(np.argmax(ratio))


def _do_workover(w, q_conn, kind, closed: dict):
    """CON / +CON workover: close the worst-ratio connection (and the
    ones below it for '+CON') instead of shutting the well (reference:
    WellEconProductionLimits::workover, WellTestState). Returns True if
    a connection was closed; False means the caller should shut."""
    wo = getattr(w, "econ_workover", "NONE") or "NONE"
    if wo not in ("CON", "+CON") or q_conn is None:
        return False
    worst = _worst_connection(w, q_conn, kind)
    if worst is None:
        return False
    comps = [c for c in w.completions if c.open]
    targets = [comps[worst]]
    if wo == "+CON":
        # close the offender and every open connection below it
        # (deeper along the wellbore)
        targets += [c for c in comps if c.k > comps[worst].k]
    out = closed.setdefault(w.name, [])
    for c in targets:
        c.open = False
        out.append((c.i, c.j, c.k))
    return True


def apply_econ_limits(wells: list, last_rates: np.ndarray | None,
                      q_perf: np.ndarray | None = None
                      ) -> tuple[list[str], dict]:
    """WECON economic limits at the report boundary.

    Returns (names shut, {well name: [(i,j,k) connections closed]}).
    Minimum-rate violations shut the well; ratio violations (water cut,
    GOR, WGR) run the item-7 workover first: 'CON'/'+CON' close the
    worst-offending connection(s) when per-connection rates are
    available and the well has more than one open connection
    (reference: WellInterface_impl.hpp updateWellTestStateEconomic).
    """
    if last_rates is None:
        return [], {}
    shut: list[str] = []
    closed: dict = {}
    prod = np.maximum(-last_rates, 0.0)
    qp = (np.maximum(-np.asarray(q_perf), 0.0)
          if q_perf is not None else None)
    for iw, w in enumerate(wells):
        if w.is_injector or w.status != "OPEN":
            continue
        orate = prod[iw, 1]
        wrate = prod[iw, 0]
        grate = prod[iw, 2]
        q_conn = qp[iw] if qp is not None and iw < qp.shape[0] else None
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
            if not _do_workover(w, q_conn, "wct", closed):
                w.status = "SHUT"
                shut.append(w.name)
            continue
        if (getattr(w, "econ_max_gor", None) is not None and orate > 0
                and grate / orate > w.econ_max_gor):
            if not _do_workover(w, q_conn, "gor", closed):
                w.status = "SHUT"
                shut.append(w.name)
            continue
        if (getattr(w, "econ_max_wgr", None) is not None and wrate > 0
                and grate / wrate > w.econ_max_wgr):
            if not _do_workover(w, q_conn, "wgr", closed):
                w.status = "SHUT"
                shut.append(w.name)
    return shut, closed


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
