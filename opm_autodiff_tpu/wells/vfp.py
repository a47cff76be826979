"""VFP tables: THP <-> BHP via multilinear interpolation.

Rebuild of the reference's VFP layer (VFPProdProperties.hpp:37 ``bhp``,
VFPHelpers.cpp:181 ``interpolate``, VFPInjProperties): production tables
are 5-D (flo, thp, wfr, gfr, alq) grids of BHP; injection tables 2-D
(flo, thp). The interpolation is pure jnp (differentiable — the
reference propagates AD derivatives through the same interpolation) and
clamps at the table edges like the reference's extrapolation warning
path.

Flow/fraction variable definitions (VFPProdTable):
  FLO: OIL | LIQ | GAS (surface rates, positive for production)
  WFR: WOR | WCT | WGR
  GFR: GOR | GLR | OGR
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.io.deck import DEFAULT
from opm_autodiff_tpu.io.state import item


class VfpProdTable(NamedTuple):
    table_num: int
    datum_depth: float
    flo_type: str
    wfr_type: str
    gfr_type: str
    flo: jnp.ndarray   # [nf]
    thp: jnp.ndarray   # [nt]
    wfr: jnp.ndarray   # [nw]
    gfr: jnp.ndarray   # [ng]
    alq: jnp.ndarray   # [na]
    bhp: jnp.ndarray   # [nt, nw, ng, na, nf]

    def eval_bhp(self, flo, thp, wfr, gfr, alq=0.0):
        """Multilinear interpolation, clamped at the grid edges."""
        def axis_locate(x, nodes):
            n = nodes.shape[0]
            if n == 1:
                return jnp.asarray(0), jnp.asarray(0), jnp.asarray(0.0)
            i = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1,
                         0, n - 2)
            w = (x - nodes[i]) / (nodes[i + 1] - nodes[i])
            return i, i + 1, jnp.clip(w, 0.0, 1.0)

        it0, it1, wt = axis_locate(thp, self.thp)
        iw0, iw1, ww = axis_locate(wfr, self.wfr)
        ig0, ig1, wg = axis_locate(gfr, self.gfr)
        ia0, ia1, wa = axis_locate(alq, self.alq)
        if0, if1, wf = axis_locate(flo, self.flo)

        acc = 0.0
        for jt, ct in ((it0, 1 - wt), (it1, wt)):
            for jw, cw in ((iw0, 1 - ww), (iw1, ww)):
                for jg, cg in ((ig0, 1 - wg), (ig1, wg)):
                    for ja, ca in ((ia0, 1 - wa), (ia1, wa)):
                        for jf, cf in ((if0, 1 - wf), (if1, wf)):
                            acc = acc + (ct * cw * cg * ca * cf
                                         * self.bhp[jt, jw, jg, ja, jf])
        return acc

    def flo_of(self, prod_rates):
        """FLO value from positive production rates [3] (w, o, g)."""
        w, o, g = prod_rates[0], prod_rates[1], prod_rates[2]
        if self.flo_type == "GAS":
            return g
        if self.flo_type == "LIQ":
            return w + o
        return o

    def wfr_of(self, prod_rates):
        w, o, g = prod_rates[0], prod_rates[1], prod_rates[2]
        eps = 1e-30
        if self.wfr_type == "WCT":
            return w / jnp.maximum(w + o, eps)
        if self.wfr_type == "WGR":
            return w / jnp.maximum(g, eps)
        return w / jnp.maximum(o, eps)  # WOR

    def gfr_of(self, prod_rates):
        w, o, g = prod_rates[0], prod_rates[1], prod_rates[2]
        eps = 1e-30
        if self.gfr_type == "GLR":
            return g / jnp.maximum(w + o, eps)
        if self.gfr_type == "OGR":
            return o / jnp.maximum(g, eps)
        return g / jnp.maximum(o, eps)  # GOR


def parse_vfpprod(records: list, unit) -> VfpProdTable:
    """Build a production table from VFPPROD keyword records.

    Record layout (ECL): 1: header (num, datum, FLO kind, WFR kind,
    GFR kind, THP kind, ALQ kind, units); 2: flo axis; 3: thp axis;
    4: wfr axis; 5: gfr axis; 6: alq axis; then one record per
    (thp, wfr, gfr, alq) index combo: [it iw ig ia bhp...].
    """
    hdr = records[0]
    table_num = int(item(hdr, 0, 1))
    datum = item(hdr, 1, 0.0) * unit.length
    flo_type = str(item(hdr, 2, "OIL")).upper().strip("'")
    wfr_type = str(item(hdr, 3, "WOR")).upper().strip("'")
    gfr_type = str(item(hdr, 4, "GOR")).upper().strip("'")

    def vals(rec):
        return np.asarray([v for v in rec if v is not DEFAULT], float)

    flo_scale = unit.gas_rate if flo_type == "GAS" else unit.liquid_rate
    ratio_scales = {
        "WOR": unit.liquid_volume / unit.liquid_volume,
        "WCT": 1.0,
        "WGR": unit.liquid_volume / unit.gas_volume,
        "GOR": unit.gas_volume / unit.liquid_volume,
        "GLR": unit.gas_volume / unit.liquid_volume,
        "OGR": unit.liquid_volume / unit.gas_volume,
    }
    flo = vals(records[1]) * flo_scale
    thp = vals(records[2]) * unit.pressure
    wfr = vals(records[3]) * ratio_scales.get(wfr_type, 1.0)
    gfr = vals(records[4]) * ratio_scales.get(gfr_type, 1.0)
    alq = vals(records[5])

    nf, nt, nw, ng, na = len(flo), len(thp), len(wfr), len(gfr), len(alq)
    bhp = np.zeros((nt, nw, ng, na, nf))
    for rec in records[6:]:
        if rec and isinstance(rec[0], str):
            continue  # absorbed trailing keyword (lexer artifact)
        v = vals(rec)
        it, iw, ig, ia = (int(v[0]) - 1, int(v[1]) - 1, int(v[2]) - 1,
                          int(v[3]) - 1)
        bhp[it, iw, ig, ia, :] = v[4:4 + nf] * unit.pressure

    return VfpProdTable(
        table_num=table_num, datum_depth=datum, flo_type=flo_type,
        wfr_type=wfr_type, gfr_type=gfr_type,
        flo=jnp.asarray(flo), thp=jnp.asarray(thp), wfr=jnp.asarray(wfr),
        gfr=jnp.asarray(gfr), alq=jnp.asarray(alq), bhp=jnp.asarray(bhp))


class VfpBank(NamedTuple):
    """All production tables padded to common axis sizes and stacked, so a
    per-well table index selects rows inside jitted/vmapped code (wells
    with different tables evaluate in one batched kernel). Padded axis
    nodes are +inf; index clamping against the actual size keeps
    interpolation inside real data."""

    flo: jnp.ndarray   # [T, NF]
    thp: jnp.ndarray   # [T, NT]
    wfr: jnp.ndarray   # [T, NW]
    gfr: jnp.ndarray   # [T, NG]
    alq: jnp.ndarray   # [T, NA]
    bhp: jnp.ndarray   # [T, NT, NW, NG, NA, NF]
    n_axis: jnp.ndarray  # [T, 5] actual sizes (f, t, w, g, a)
    flo_kind: jnp.ndarray  # [T] 0=OIL 1=LIQ 2=GAS
    wfr_kind: jnp.ndarray  # [T] 0=WOR 1=WCT 2=WGR
    gfr_kind: jnp.ndarray  # [T] 0=GOR 1=GLR 2=OGR

    @staticmethod
    def from_tables(tables: list) -> "VfpBank":
        def pad(arrs, fill=np.inf):
            m = max(a.shape[-1] for a in arrs)
            return np.stack([
                np.concatenate([np.asarray(a),
                                np.full(m - a.shape[-1], fill)])
                for a in arrs])

        flo = pad([t.flo for t in tables])
        thp = pad([t.thp for t in tables])
        wfr = pad([t.wfr for t in tables])
        gfr = pad([t.gfr for t in tables])
        alq = pad([t.alq for t in tables])
        nt, nw_, ng, na, nf = (thp.shape[1], wfr.shape[1], gfr.shape[1],
                               alq.shape[1], flo.shape[1])
        bhp = np.zeros((len(tables), nt, nw_, ng, na, nf))
        n_axis = np.zeros((len(tables), 5), np.int32)
        for i, t in enumerate(tables):
            b = np.asarray(t.bhp)
            bhp[i, :b.shape[0], :b.shape[1], :b.shape[2], :b.shape[3],
                :b.shape[4]] = b
            n_axis[i] = [t.flo.shape[0], t.thp.shape[0], t.wfr.shape[0],
                         t.gfr.shape[0], t.alq.shape[0]]
        fk = {"OIL": 0, "LIQ": 1, "GAS": 2}
        wk = {"WOR": 0, "WCT": 1, "WGR": 2}
        gk = {"GOR": 0, "GLR": 1, "OGR": 2}
        return VfpBank(
            flo=jnp.asarray(flo), thp=jnp.asarray(thp),
            wfr=jnp.asarray(wfr), gfr=jnp.asarray(gfr),
            alq=jnp.asarray(alq), bhp=jnp.asarray(bhp),
            n_axis=jnp.asarray(n_axis),
            flo_kind=jnp.asarray([fk.get(t.flo_type, 0) for t in tables]),
            wfr_kind=jnp.asarray([wk.get(t.wfr_type, 0) for t in tables]),
            gfr_kind=jnp.asarray([gk.get(t.gfr_type, 0) for t in tables]))


def bank_bhp(bank: VfpBank, tidx, thp, prod_rates, alq=0.0):
    """BHP from a banked table; scalar per well (vmap over wells).

    ``tidx`` < 0 returns 0 (no table). prod_rates: positive [3] (w,o,g).
    """
    ti = jnp.maximum(tidx, 0)
    w, o, g = prod_rates[0], prod_rates[1], prod_rates[2]
    eps = 1e-30
    flo = jnp.select([bank.flo_kind[ti] == 2, bank.flo_kind[ti] == 1],
                     [g, w + o], default=o)
    wfr = jnp.select(
        [bank.wfr_kind[ti] == 1, bank.wfr_kind[ti] == 2],
        [w / jnp.maximum(w + o, eps), w / jnp.maximum(g, eps)],
        default=w / jnp.maximum(o, eps))
    gfr = jnp.select(
        [bank.gfr_kind[ti] == 1, bank.gfr_kind[ti] == 2],
        [g / jnp.maximum(w + o, eps), o / jnp.maximum(g, eps)],
        default=g / jnp.maximum(o, eps))

    def locate(x, nodes, n):
        i = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0,
                     jnp.maximum(n - 2, 0))
        den = nodes[i + 1] - nodes[i]
        wgt = jnp.where((n > 1) & jnp.isfinite(den) & (den > 0),
                        (x - nodes[i]) / jnp.where(den > 0, den, 1.0), 0.0)
        return i, jnp.clip(wgt, 0.0, 1.0)

    na = bank.n_axis[ti]
    if0, wf = locate(flo, bank.flo[ti], na[0])
    it0, wt = locate(thp, bank.thp[ti], na[1])
    iw0, ww = locate(wfr, bank.wfr[ti], na[2])
    ig0, wg = locate(gfr, bank.gfr[ti], na[3])
    ia0, wa = locate(alq, bank.alq[ti], na[4])

    acc = 0.0
    b = bank.bhp[ti]
    for dt_, ct in ((0, 1 - wt), (1, wt)):
        for dw, cw in ((0, 1 - ww), (1, ww)):
            for dg, cg in ((0, 1 - wg), (1, wg)):
                for da, ca in ((0, 1 - wa), (1, wa)):
                    for df, cf in ((0, 1 - wf), (1, wf)):
                        acc = acc + (ct * cw * cg * ca * cf
                                     * b[it0 + dt_, iw0 + dw, ig0 + dg,
                                         ia0 + da, if0 + df])
    return jnp.where(tidx >= 0, acc, 0.0)


class VfpInjTable(NamedTuple):
    """VFPINJ: 2-D (flo, thp) -> BHP injection table
    (reference: VFPInjProperties)."""

    table_num: int
    datum_depth: float
    flo_type: str
    flo: jnp.ndarray   # [nf]
    thp: jnp.ndarray   # [nt]
    bhp: jnp.ndarray   # [nt, nf]


def parse_vfpinj(records: list, unit) -> VfpInjTable:
    hdr = records[0]
    table_num = int(item(hdr, 0, 1))
    datum = item(hdr, 1, 0.0) * unit.length
    flo_type = str(item(hdr, 2, "GAS")).upper().strip("'")

    def vals(rec):
        return np.asarray([v for v in rec if v is not DEFAULT], float)

    flo_scale = unit.gas_rate if flo_type == "GAS" else unit.liquid_rate
    flo = vals(records[1]) * flo_scale
    thp = vals(records[2]) * unit.pressure
    nf, nt = len(flo), len(thp)
    bhp = np.zeros((nt, nf))
    for rec in records[3:]:
        v = vals(rec)
        it = int(v[0]) - 1
        bhp[it, :] = v[1:1 + nf] * unit.pressure
    return VfpInjTable(table_num=table_num, datum_depth=datum,
                       flo_type=flo_type, flo=jnp.asarray(flo),
                       thp=jnp.asarray(thp), bhp=jnp.asarray(bhp))


class VfpInjBank(NamedTuple):
    """Stacked injection tables (same padding scheme as VfpBank)."""

    flo: jnp.ndarray   # [T, NF]
    thp: jnp.ndarray   # [T, NT]
    bhp: jnp.ndarray   # [T, NT, NF]
    n_axis: jnp.ndarray  # [T, 2] actual (nf, nt)

    @staticmethod
    def from_tables(tables: list) -> "VfpInjBank":
        def pad(arrs, fill=np.inf):
            m = max(a.shape[-1] for a in arrs)
            return np.stack([
                np.concatenate([np.asarray(a),
                                np.full(m - a.shape[-1], fill)])
                for a in arrs])

        flo = pad([t.flo for t in tables])
        thp = pad([t.thp for t in tables])
        nt, nf = thp.shape[1], flo.shape[1]
        bhp = np.zeros((len(tables), nt, nf))
        n_axis = np.zeros((len(tables), 2), np.int32)
        for i, t in enumerate(tables):
            b = np.asarray(t.bhp)
            bhp[i, :b.shape[0], :b.shape[1]] = b
            n_axis[i] = [t.flo.shape[0], t.thp.shape[0]]
        return VfpInjBank(flo=jnp.asarray(flo), thp=jnp.asarray(thp),
                          bhp=jnp.asarray(bhp), n_axis=jnp.asarray(n_axis))


def bank_inj_bhp(bank: VfpInjBank, tidx, thp, inj_rate):
    """Injection BHP from THP + surface rate (scalar; vmap over wells)."""
    ti = jnp.maximum(tidx, 0)

    def locate(x, nodes, n):
        i = jnp.clip(jnp.searchsorted(nodes, x, side="right") - 1, 0,
                     jnp.maximum(n - 2, 0))
        den = nodes[i + 1] - nodes[i]
        wgt = jnp.where((n > 1) & jnp.isfinite(den) & (den > 0),
                        (x - nodes[i]) / jnp.where(den > 0, den, 1.0), 0.0)
        return i, jnp.clip(wgt, 0.0, 1.0)

    na = bank.n_axis[ti]
    if0, wf = locate(inj_rate, bank.flo[ti], na[0])
    it0, wt = locate(thp, bank.thp[ti], na[1])
    b = bank.bhp[ti]
    acc = 0.0
    for dt_, ct in ((0, 1 - wt), (1, wt)):
        for df, cf in ((0, 1 - wf), (1, wf)):
            acc = acc + ct * cf * b[it0 + dt_, if0 + df]
    return jnp.where(tidx >= 0, acc, 0.0)


class VfpTables:
    """Registry of parsed VFP tables (reference: VFPProperties holder)."""

    def __init__(self, state):
        self.prod: dict[int, VfpProdTable] = {}
        self.inj: dict[int, VfpInjTable] = {}
        unit = state.runspec.unit_system
        for recs in state.vfp_prod_records:
            t = parse_vfpprod(recs, unit)
            self.prod[t.table_num] = t
        for recs in getattr(state, "vfp_inj_records", []):
            t = parse_vfpinj(recs, unit)
            self.inj[t.table_num] = t

    def bhp_from_thp(self, table_num: int, thp, prod_rates):
        t = self.prod[table_num]
        return t.eval_bhp(t.flo_of(prod_rates), thp, t.wfr_of(prod_rates),
                          t.gfr_of(prod_rates))

    def thp_from_bhp(self, table_num: int, bhp, prod_rates, alq=0.0):
        return thp_from_bhp(self.prod[table_num], bhp, prod_rates, alq)


def thp_from_bhp(t: VfpProdTable, bhp_target, prod_rates, alq=0.0):
    """Inverse THP lookup (reference: VFPProdProperties::thp via
    VFPHelpers::findTHP, VFPHelpers.cpp:387): sample the bhp(thp)
    curve at the table's thp nodes for the given rates, then invert
    linearly on the first bracketing segment (edge segments
    extrapolate). Used for WTHP reporting and THP-limit checks."""
    import jax

    flo = t.flo_of(prod_rates)
    wfr = t.wfr_of(prod_rates)
    gfr = t.gfr_of(prod_rates)
    bhp_i = jax.vmap(lambda th: t.eval_bhp(flo, th, wfr, gfr, alq))(t.thp)
    return _find_thp(bhp_i, t.thp, bhp_target)


def _find_thp(bhp_arr, thp_arr, bhp):
    n = int(thp_arr.shape[0])
    if n < 2:
        return thp_arr[0]
    y0 = bhp_arr[:-1]
    y1 = bhp_arr[1:]
    hit = (y0 < bhp) & (bhp <= y1)
    found = jnp.any(hit)
    below = bhp <= bhp_arr[0]
    i = jnp.where(found, jnp.argmax(hit),
                  jnp.where(below, 0, n - 2))
    x0, x1 = thp_arr[i], thp_arr[i + 1]
    b0, b1 = bhp_arr[i], bhp_arr[i + 1]
    db = b1 - b0
    slope = (x1 - x0) / jnp.where(jnp.abs(db) > 0, db, 1.0)
    return x0 + (bhp - b0) * slope
