"""compareECL-style regression comparator for summary files.

Rebuild of the reference's regression contract (SURVEY.md §4: compareECL
byte-compares EGRID/INIT/UNRST/summary within abs_tol=2e-2 rel_tol=1e-5,
compareECLFiles.cmake:198-200): load two summary outputs (SMSPEC/UNSMRY
pairs or the CSV the driver writes), align vectors on TIME, and report
every deviation outside tolerance.

Usage:
    python -m opm_autodiff_tpu.tools.compare_ecl BASE1 BASE2 \
        [--abs-tol 2e-2] [--rel-tol 1e-5] [--vectors FOPR,WBHP:PROD]

BASE is a path without extension (reads BASE.SMSPEC + BASE.UNSMRY) or a
.csv file. Exit code 0 = within tolerance, 1 = deviations found.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def load_summary(base: str) -> dict[str, np.ndarray]:
    """{vector: values} from a CSV or an SMSPEC/UNSMRY pair."""
    if base.endswith(".csv"):
        import csv

        with open(base) as f:
            rows = list(csv.DictReader(f))
        out = {}
        for k in rows[0]:
            try:
                out[k] = np.asarray([float(r[k] or 0.0) for r in rows])
            except ValueError:
                pass
        return out
    from opm_autodiff_tpu.io.eclbinary import read_ecl_file

    spec = read_ecl_file(base + ".SMSPEC")
    d = {name: data for name, _t, data in spec}
    keys = d["KEYWORDS"]
    wg = d.get("WGNAMES", [""] * len(keys))
    names = []
    for k, w in zip(keys, wg):
        k = k.strip()
        w = w.strip()
        names.append(f"{k}:{w}" if w and not w.startswith(":") else k)

    params = [data for name, _t, data in read_ecl_file(base + ".UNSMRY")
              if name == "PARAMS"]
    table = np.asarray(params)  # [steps, nlist]
    return {n: table[:, i] for i, n in enumerate(names)}


def compare(a: dict, b: dict, abs_tol: float, rel_tol: float,
            vectors: list[str] | None = None) -> list[str]:
    """Deviation messages (empty = pass)."""
    msgs = []
    common = [k for k in a if k in b and k != "TIME"]
    if vectors:
        missing = [v for v in vectors if v not in common]
        for v in missing:
            msgs.append(f"vector {v} missing from one side")
        common = [v for v in vectors if v in common]
    elif not common:
        return ["no common summary vectors"]
    # align on TIME when present
    ta, tb = a.get("TIME"), b.get("TIME")
    for k in common:
        va, vb = np.asarray(a[k], float), np.asarray(b[k], float)
        if ta is not None and tb is not None and len(ta) != len(tb):
            vb = np.interp(ta, tb, vb)
        elif len(va) != len(vb):
            msgs.append(f"{k}: step counts differ ({len(va)} vs {len(vb)})"
                        " and no TIME vector to align on")
            continue
        scale = np.maximum(np.abs(va), np.abs(vb))
        dev = np.abs(va - vb)
        bad = dev > abs_tol + rel_tol * scale
        if bad.any():
            i = int(np.argmax(dev / (abs_tol + rel_tol * scale)))
            msgs.append(
                f"{k}: {int(bad.sum())}/{len(va)} steps deviate; worst at "
                f"step {i}: {va[i]:.6g} vs {vb[i]:.6g} "
                f"(abs {dev[i]:.3g}, rel {dev[i] / max(scale[i], 1e-300):.3g})")
    return msgs


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="compare two summary outputs within tolerances")
    ap.add_argument("base1")
    ap.add_argument("base2")
    ap.add_argument("--abs-tol", type=float, default=2e-2)
    ap.add_argument("--rel-tol", type=float, default=1e-5)
    ap.add_argument("--vectors", default=None,
                    help="comma-separated vector subset (default: all)")
    args = ap.parse_args(argv)
    a = load_summary(args.base1)
    b = load_summary(args.base2)
    vectors = args.vectors.split(",") if args.vectors else None
    msgs = compare(a, b, args.abs_tol, args.rel_tol, vectors)
    for m in msgs:
        print(m)
    if not msgs:
        print(f"OK: {len([k for k in a if k in b])} vectors within "
              f"abs {args.abs_tol} rel {args.rel_tol}")
    return 1 if msgs else 0


if __name__ == "__main__":
    sys.exit(main())
