"""Gas-lift ALQ optimization (two stages).

Rebuild of the reference's gas-lift layer
(opm/simulators/wells/GasLiftSingleWellGeneric.cpp:90 ``runOptimize``:
per-well economic-gradient hill climb in ALQ increments;
GasLiftStage2.cpp:78,105: group surplus redistribution). Host-side on
tiny data, run at the start of each report step; the chosen ALQ feeds the
well's VFP THP->BHP interpolation 5th axis (VFPProdProperties ALQ axis).

Stage 1: for each THP-controlled producer with WLIFTOPT YES, estimate the
well's production at (alq) and (alq + increment) by fixed-point iterating
bhp = VFP(thp, rates, alq) against the inflow model, and keep raising ALQ
while the weighted economic gradient

    grad = (w_oil * d(oil_rate) - w_gas * d(gas_rate)) / d(alq)

exceeds LIFTOPT's minimum economic gradient and the well's max ALQ is not
hit; symmetric descent if the first gradient is already uneconomic.

Stage 2: if a GLIFTOPT group lift-gas cap is exceeded by the stage-1
sum, ALQ above each well's minimum is scaled back proportionally (the
reference removes increments from the lowest-gradient wells first —
the proportional cut converges to the same cap with the same total).

ALQ quantities stay in deck units end-to-end (the VFP ALQ axis is parsed
unscaled as well), so no unit conversion is needed or done.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from opm_autodiff_tpu.wells.standard import CTRL_THP, well_rates_only
from opm_autodiff_tpu.wells.vfp import bank_bhp


def _well_potential(fs, u, flag, ws, vfp_bank, iw, alq, regs, mob_mult,
                    iters=4):
    """Estimated production [3] of well iw at a given ALQ on THP control:
    fixed-point of bhp = VFP(thp, rates, alq); rates = inflow(bhp)
    (the reference computes the same potential via computeWellRates,
    GasLiftSingleWellGeneric::computeWellRates_)."""
    pbh = np.asarray(ws.bhp_target, float).copy()
    prod = None
    bhp = float(pbh[iw])
    for _ in range(iters):
        q = well_rates_only(fs, u, flag, jnp.asarray(pbh), ws, regs,
                            mob_mult)
        prod = np.maximum(-np.asarray(q), 0.0)
        bhp_new = float(bank_bhp(vfp_bank, ws.vfp_idx[iw],
                                 ws.thp_target[iw],
                                 jnp.asarray(prod[iw]), alq))
        bhp = 0.5 * bhp + 0.5 * max(bhp_new, 1.01e5)
        pbh[iw] = bhp
    return prod[iw], bhp


def optimize_alq(fs, u, flag, ws, wells: list, liftopt: dict, vfp_bank,
                 regs=None, mob_mult=None, unit=None) -> np.ndarray:
    """Return the optimized per-well ALQ array [W] (deck units)."""
    nw = ws.num_wells
    alq = np.asarray(ws.alq, float).copy()
    if vfp_bank is None or not liftopt:
        return alq
    inc = float(liftopt.get("increment", 12500.0))
    # LIFTOPT's minimum economic gradient is in DECK units (FIELD:
    # stb-oil per mscf lift gas); rates below are SI — convert
    min_grad = float(liftopt.get("min_gradient", 0.0))
    oil_scale = 1.0 / unit.liquid_rate if unit is not None else 1.0
    gas_scale = 1.0 / unit.gas_rate if unit is not None else 1.0
    modes = np.asarray(ws.ctrl_mode)
    is_inj = np.asarray(ws.is_injector)

    for iw, w in enumerate(wells[:nw]):
        if not getattr(w, "glift_on", False) or is_inj[iw]:
            continue
        if modes[iw] != CTRL_THP:
            continue
        max_alq = (w.glift_max_alq if w.glift_max_alq is not None
                   else float(np.asarray(vfp_bank.alq).max()))
        min_alq = w.glift_min_alq
        w_oil = max(w.glift_weight, 1e-12)
        w_gas = w.glift_gas_weight
        a = max(alq[iw], min_alq)

        def gradient(a0):
            p0, _ = _well_potential(fs, u, flag, ws, vfp_bank, iw, a0,
                                    regs, mob_mult)
            p1, _ = _well_potential(fs, u, flag, ws, vfp_bank, iw,
                                    a0 + inc, regs, mob_mult)
            doil = (p1[1] - p0[1]) * oil_scale
            dgas = (p1[2] - p0[2]) * gas_scale
            return (w_oil * doil - w_gas * dgas) / inc

        # hill climb up while economic, else walk down
        if gradient(a) > min_grad:
            while a + inc <= max_alq and gradient(a) > min_grad:
                a += inc
        else:
            while a - inc >= min_alq and gradient(a - inc) <= min_grad:
                a -= inc
        alq[iw] = float(np.clip(a, min_alq, max_alq))

    # ---- stage 2: group lift-gas caps (GLIFTOPT) ----
    # reference: GasLiftStage2.cpp:639 redistributeALQ_ — exchange one
    # increment from the smallest decremental-gradient well to the
    # largest incremental-gradient well while the exchange profits —
    # then removeSurplusALQ_ — strip increments from the smallest
    # decremental gradient while the group cap is exceeded or a
    # decremental gradient is uneconomic.
    grad_cache: dict = {}

    def eco_grad(iw, a0):
        """Weighted economic gradient of the increment [a0, a0+inc]."""
        key = (iw, round(a0, 6))
        if key not in grad_cache:
            w = wells[iw]
            p0, _ = _well_potential(fs, u, flag, ws, vfp_bank, iw, a0,
                                    regs, mob_mult)
            p1, _ = _well_potential(fs, u, flag, ws, vfp_bank, iw,
                                    a0 + inc, regs, mob_mult)
            w_oil = max(w.glift_weight, 1e-12)
            w_gas = w.glift_gas_weight
            grad_cache[key] = (w_oil * (p1[1] - p0[1]) * oil_scale
                               - w_gas * (p1[2] - p0[2]) * gas_scale) / inc
        return grad_cache[key]

    default_max = float(np.asarray(vfp_bank.alq).max())
    for gname, gcfg in (liftopt.get("groups") or {}).items():
        cap = gcfg.get("max_lift_gas")
        members = [iw for iw, w in enumerate(wells[:nw])
                   if getattr(w, "glift_on", False) and not is_inj[iw]
                   and _in_group(w, gname, liftopt.get("tree", {}))]
        if not members:
            continue
        lo = {iw: wells[iw].glift_min_alq for iw in members}
        hi = {iw: (wells[iw].glift_max_alq
                   if wells[iw].glift_max_alq is not None else default_max)
              for iw in members}

        # (a) redistribution at constant group total
        for _ in range(200):
            incs = {iw: eco_grad(iw, alq[iw]) for iw in members
                    if alq[iw] + inc <= hi[iw]}
            decs = {iw: eco_grad(iw, alq[iw] - inc) for iw in members
                    if alq[iw] - inc >= lo[iw]}
            if not incs or not decs:
                break
            wi, gi = max(incs.items(), key=lambda kv: kv[1])
            wd, gd = min(decs.items(), key=lambda kv: kv[1])
            if wi == wd or gi <= gd:
                break
            alq[wi] += inc
            alq[wd] -= inc

        # (b) surplus removal: cap violation or uneconomic increments
        for _ in range(200):
            decs = {iw: eco_grad(iw, alq[iw] - inc) for iw in members
                    if alq[iw] - inc >= lo[iw]}
            if not decs:
                break
            total = sum(alq[iw] for iw in members)
            over_cap = cap is not None and total > cap + 1e-9
            uneco = {iw: g for iw, g in decs.items() if g < min_grad}
            if not (over_cap or uneco):
                break
            pool = decs if over_cap else uneco
            wd, _g = min(pool.items(), key=lambda kv: kv[1])
            alq[wd] -= inc
    return alq


def _in_group(w, gname, tree):
    g = w.group
    while g:
        if g == gname:
            return True
        g = tree.get(g, "")
    return False
