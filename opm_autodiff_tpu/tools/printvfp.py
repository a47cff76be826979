"""Dump VFP BHP interpolations for a deck's production tables.

Rebuild of the reference's standalone ``examples/printvfp.cpp``
(examples/printvfp.cpp:93-134): sweep a rate x THP grid through one VFP
production table and print the interpolated BHP — handy for eyeballing
table behavior and cross-checking the interpolation against other
simulators.

Usage:
    python -m opm_autodiff_tpu.tools.printvfp CASE.DATA [table_id]
        [--wfr W] [--gfr G] [--alq A] [--n N]
"""

from __future__ import annotations

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="print BHP(rate, thp) for a VFPPROD table")
    ap.add_argument("deck")
    ap.add_argument("table_id", nargs="?", type=int, default=None,
                    help="VFP table number (default: first in deck)")
    ap.add_argument("--wfr", type=float, default=0.0)
    ap.add_argument("--gfr", type=float, default=0.0)
    ap.add_argument("--alq", type=float, default=0.0)
    ap.add_argument("--n", type=int, default=11, help="grid points per axis")
    args = ap.parse_args(argv)

    from opm_autodiff_tpu import units as U
    from opm_autodiff_tpu.io.deck import read_deck
    from opm_autodiff_tpu.io.state import _build_runspec
    from opm_autodiff_tpu.wells.vfp import parse_vfpprod

    deck = read_deck(args.deck)
    unit = _build_runspec(deck).unit_system
    tables = {}
    for kw in deck.get("VFPPROD"):
        t = parse_vfpprod(kw.records, unit)
        tables[t.table_num] = t
    if not tables:
        raise SystemExit("no VFPPROD tables in deck")
    tid = args.table_id if args.table_id is not None else min(tables)
    t = tables[tid]

    flo = np.asarray(t.flo)
    thp = np.asarray(t.thp)
    rates = np.linspace(flo[0], flo[-1], args.n)
    thps = np.linspace(thp[0], thp[-1], args.n)
    p_out = unit.pressure
    r_out = {"GAS": unit.gas_rate}.get(t.flo_type, unit.liquid_rate)

    print(f"-- table {tid}: flo={t.flo_type} wfr={t.wfr_type} "
          f"gfr={t.gfr_type} datum={t.datum_depth:.1f} m")
    header = "rate\\thp".rjust(14) + "".join(
        f"{x / p_out:14.4f}" for x in thps)
    print(header)
    for r in rates:
        row = [f"{r / r_out:14.4f}"]
        for x in thps:
            bhp = float(t.eval_bhp(r, x, args.wfr, args.gfr, args.alq))
            row.append(f"{bhp / p_out:14.4f}")
        print("".join(row))


if __name__ == "__main__":
    main()
