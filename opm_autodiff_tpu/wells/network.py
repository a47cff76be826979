"""GRUPNET/NETBALAN production network balancing.

Rebuild of the reference's standard network model (the Schedule Network
consumed by BlackoilWellModelGeneric's network balancing; node pressures
evaluated through VFP branch tables — SURVEY.md §2.5 group layer): each
group is a network node; the terminal node carries a fixed pressure; a
branch from a group to its parent carries a VFP production table whose
(flow, thp=parent pressure) -> bhp interpolation gives the group's node
pressure; groups without a branch table inherit the parent pressure.
The resulting node pressure acts as an extra THP limit on the group's
wells: a well cannot flow against a backed-up manifold.

Host-side (tiny data, like group controls): re-evaluated each substep
from the previous substep's rates, so the substep loop supplies the
NETBALAN fixed-point iteration the reference runs explicitly.
"""

from __future__ import annotations

import numpy as np


def group_production(tree: dict, wells: list, last_q: np.ndarray | None,
                     nw: int) -> dict:
    """Aggregate positive production [w,o,g] per group, up the tree."""
    rates: dict[str, np.ndarray] = {}
    prod = (np.maximum(-np.asarray(last_q), 0.0) if last_q is not None
            else np.zeros((nw, 3)))
    for iw, w in enumerate(wells):
        if w.is_injector or iw >= len(prod):
            continue
        g = w.group
        seen = set()
        while g and g not in seen:
            seen.add(g)
            rates[g] = rates.get(g, np.zeros(3)) + prod[iw]
            g = tree.get(g, "FIELD" if g != "FIELD" else "")
    return rates


def node_pressures(tree: dict, net: dict, group_rates: dict,
                   prod_bank, vfp_numbering: dict | None) -> dict:
    """Node pressures walked down from fixed-pressure nodes.

    ``net``: {group: {pressure, vfp, alq}} from GRUPNET. Returns
    {group: pressure_si} for every resolvable node.
    """
    net = {g: c for g, c in net.items() if not g.startswith("_")}
    pressures: dict[str, float] = {}
    for g, cfg in net.items():
        if cfg.get("pressure") is not None:
            pressures[g] = cfg["pressure"]
    # resolve children whose parent pressure is known; tree depth bounds
    # the number of sweeps
    for _ in range(len(net) + 1):
        changed = False
        for g, cfg in net.items():
            if g in pressures:
                continue
            parent = tree.get(g, "FIELD")
            if parent not in pressures:
                continue
            pp = pressures[parent]
            tno = cfg.get("vfp") or 0
            tidx = (vfp_numbering or {}).get(tno, -1)
            if tno > 0 and tidx >= 0 and prod_bank is not None:
                from opm_autodiff_tpu.wells.vfp import bank_bhp

                q = group_rates.get(g, np.zeros(3))
                pressures[g] = float(bank_bhp(
                    prod_bank, tidx, pp, np.asarray(q, float),
                    cfg.get("alq", 0.0)))
            else:
                pressures[g] = pp
            changed = True
        if not changed:
            break
    return pressures


def apply_network_thp(ws, wells: list, tree: dict, pressures: dict):
    """Raise producers' THP limits to their nearest network node pressure
    (the reference imposes node pressures as dynamic THP constraints)."""
    import jax.numpy as jnp

    if not pressures:
        return ws
    thp = np.asarray(ws.thp_target).copy()
    changed = False
    for iw, w in enumerate(wells):
        if w.is_injector:
            continue
        g = w.group
        seen = set()
        while g and g not in seen:
            seen.add(g)
            if g in pressures:
                if pressures[g] > thp[iw]:
                    thp[iw] = pressures[g]
                    changed = True
                break
            g = tree.get(g, "FIELD" if g != "FIELD" else "")
    if not changed:
        return ws
    return ws._replace(thp_target=jnp.asarray(thp))
