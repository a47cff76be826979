"""Black-oil PVT: water / dry gas / dead oil / live oil.

Functional rebuild of opm-material's ``BlackOilFluidSystem`` PVT classes
(reference consumes them via opm-models intensive quantities; SURVEY.md
§0.1). Each phase PVT is a NamedTuple of jnp arrays (a pytree — passes
through jit untouched) plus pure functions of pressure (and Rs). All SI.

Conventions (matching the reference):
  * b = 1/B, the *inverse* formation volume factor — tables store and
    interpolate b, not B (opm-material's inverseFormationVolumeFactor).
  * Live oil: undersaturated behavior is modeled per-Rs-branch with
    d(b)/dp and d(mu)/dp slopes taken from the deck's undersaturated
    branch data and interpolated in Rs. Saturated cells have dp=0 so a
    single code path covers both states (no branching under jit).

Multi-region (PVTNUM) support mirrors the SATNUM banking in satfunc.py:
tables are stacked into [R, n] banks, padded by *extending the last
segment's slope* (so linear extrapolation semantics survive padding), and
a per-cell region index selects rows inside jitted code. With a single
region the row index is a compile-time constant — no gather in the hot
loop (a traced region index costs ~4.5x on TPU).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu.io.state import PropsSection, PvtoTable
from opm_autodiff_tpu.props.tables import interp1d


def row(bank, reg):
    """Select a region row with the static single-region fast path."""
    if bank.shape[0] == 1:
        return bank[0]
    return bank[reg]


def _pad_bank_linear(cols: list[list[np.ndarray]]) -> list[np.ndarray]:
    """Pad per-region 1D node/value arrays to a common length.

    ``cols[r]`` is the list of column arrays for region r (column 0 is the
    strictly-increasing node axis). Padding continues the last segment's
    slope in every column, so interpolation AND linear extrapolation are
    unchanged by the padding.
    """
    nreg = len(cols)
    ncol = len(cols[0])
    m = max(len(c[0]) for c in cols)
    out = [np.empty((nreg, m)) for _ in range(ncol)]
    for r, c in enumerate(cols):
        n = len(c[0])
        x = np.asarray(c[0], float)
        dx = (x[-1] - x[-2]) if n > 1 else max(abs(x[-1]), 1.0)
        ext = dx * np.arange(1, m - n + 1)
        for j in range(ncol):
            y = np.asarray(c[j], float)
            out[j][r, :n] = y
            if n < m:
                slope = (y[-1] - y[-2]) / dx if n > 1 else 0.0
                out[j][r, n:] = y[-1] + slope * ext
    return out


def _pad_rows(x, *ys, m=None):
    """Pad a branch's (x, y...) rows to length m by continuing the last
    segment's slope (same semantics as _pad_bank_linear, row-wise)."""
    if m is None:
        raise TypeError("m required")
    n = len(x)
    x = np.asarray(x, float)
    out_x = np.empty(m)
    out_x[:n] = x
    dx = (x[-1] - x[-2]) if n > 1 else max(abs(x[-1]), 1.0)
    ext = dx * np.arange(1, m - n + 1)
    if n < m:
        out_x[n:] = x[-1] + ext
    outs = [out_x]
    for y in ys:
        y = np.asarray(y, float)
        oy = np.empty(m)
        oy[:n] = y
        if n < m:
            slope = (y[-1] - y[-2]) / dx if n > 1 else 0.0
            oy[n:] = y[-1] + slope * ext
        outs.append(oy)
    return outs


class WaterPvt(NamedTuple):
    """PVTW per region: fields are [R] arrays."""

    p_ref: jnp.ndarray
    inv_b_ref: jnp.ndarray
    comp: jnp.ndarray
    mu_ref: jnp.ndarray
    viscosibility: jnp.ndarray

    def inv_b(self, p, reg=0):
        x = row(self.comp, reg) * (p - row(self.p_ref, reg))
        return row(self.inv_b_ref, reg) * (1.0 + x + 0.5 * x * x)

    def viscosity(self, p, reg=0):
        y = -row(self.viscosibility, reg) * (p - row(self.p_ref, reg))
        return row(self.mu_ref, reg) / (1.0 + y + 0.5 * y * y)


@jax.tree_util.register_static
@dataclasses.dataclass(frozen=True)
class StaticCounts:
    """Per-region REAL (non-padded) table-line counts, carried as jit-
    static metadata (no pytree leaves): the Pallas cellpack kernel needs
    them at trace time to unroll only the real branches."""

    vals: tuple

    def __getitem__(self, i):
        if isinstance(i, int):
            return self.vals[i]
        # traced region index: gather from a constant array
        return jnp.asarray(self.vals, jnp.int32)[i]

    def __len__(self):
        return len(self.vals)

    def __iter__(self):
        return iter(self.vals)


def _mu_from_inv_b_mu(invb, ibmu):
    """Viscosity from the 1/B and 1/(B mu) interpolants (the reference
    interpolates 1/(B mu) as its own table and divides — opm-material's
    inverseOilBMuTable_ convention, anchored by test_norne_pvt). The
    divisor is floored so far-off-table extrapolation gives a huge
    positive viscosity instead of the reference's negative one."""
    return invb / jnp.maximum(ibmu, 1e-12)


class DryGasPvt(NamedTuple):
    """PVDG, banked per PVTNUM region: [R, n] arrays.

    ``inv_b_mu_tab`` holds 1/(B mu) — viscosity interpolates it and
    divides (reference convention; see _mu_from_inv_b_mu)."""

    p: jnp.ndarray
    inv_b_tab: jnp.ndarray
    mu_tab: jnp.ndarray
    inv_b_mu_tab: jnp.ndarray | None = None

    def inv_b(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.inv_b_tab, reg))

    def viscosity(self, pres, reg=0):
        if self.inv_b_mu_tab is None:
            return interp1d(pres, row(self.p, reg), row(self.mu_tab, reg),
                            extrapolate=False)
        return _mu_from_inv_b_mu(
            self.inv_b(pres, reg),
            interp1d(pres, row(self.p, reg), row(self.inv_b_mu_tab, reg)))

    @staticmethod
    def from_table(pvdg: np.ndarray) -> "DryGasPvt":
        return DryGasPvt.from_tables([np.asarray(pvdg)])

    @staticmethod
    def from_tables(tables: list) -> "DryGasPvt":
        cols = [[t[:, 0], 1.0 / t[:, 1], t[:, 2],
                 1.0 / (t[:, 1] * t[:, 2])] for t in tables]
        p, invb, mu, ibmu = _pad_bank_linear(cols)
        return DryGasPvt(p=jnp.asarray(p), inv_b_tab=jnp.asarray(invb),
                         mu_tab=jnp.asarray(mu),
                         inv_b_mu_tab=jnp.asarray(ibmu))


class DeadOilPvt(NamedTuple):
    """PVDO, banked per PVTNUM region: [R, n] arrays (1/(B mu)
    convention like DryGasPvt)."""

    p: jnp.ndarray
    inv_b_tab: jnp.ndarray
    mu_tab: jnp.ndarray
    inv_b_mu_tab: jnp.ndarray | None = None

    def inv_b(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.inv_b_tab, reg))

    def viscosity(self, pres, reg=0):
        if self.inv_b_mu_tab is None:
            return interp1d(pres, row(self.p, reg), row(self.mu_tab, reg),
                            extrapolate=False)
        return _mu_from_inv_b_mu(
            self.inv_b(pres, reg),
            interp1d(pres, row(self.p, reg), row(self.inv_b_mu_tab, reg)))

    @staticmethod
    def from_table(pvdo: np.ndarray) -> "DeadOilPvt":
        return DeadOilPvt.from_tables([np.asarray(pvdo)])

    @staticmethod
    def from_tables(tables: list) -> "DeadOilPvt":
        cols = [[t[:, 0], 1.0 / t[:, 1], t[:, 2],
                 1.0 / (t[:, 1] * t[:, 2])] for t in tables]
        p, invb, mu, ibmu = _pad_bank_linear(cols)
        return DeadOilPvt(p=jnp.asarray(p), inv_b_tab=jnp.asarray(invb),
                          mu_tab=jnp.asarray(mu),
                          inv_b_mu_tab=jnp.asarray(ibmu))


class LiveOilPvt(NamedTuple):
    """PVTO live oil, banked per PVTNUM region.

    Saturated curve sampled at the deck's branch heads ([R, nb] banks).
    Undersaturated behavior is the full 2-D table: each Rs branch keeps
    its deck pressure rows ([R, nb, m] banks, rows padded by continuing
    the last segment's slope), and evaluation at (p, rs) interpolates
    every bracketing branch at the SAME pressure p then blends linearly
    in Rs — the semantics of opm-material's LiveOilPvt 2-D tables
    (reference consumes them via the opm-models intensive quantities;
    anchored against /root/reference/tests/test_norne_pvt.cpp expected
    vectors). ``slope_inv_b``/``slope_mu`` keep the per-branch d/dp
    least-squares slopes for hosts that want a cheap linearization
    (equilibration depth sweeps, models/init.py).
    """

    p_sat: jnp.ndarray        # [R,nb] bubble-point pressure nodes
    rs_tab: jnp.ndarray       # [R,nb] Rs at those nodes
    inv_b_sat: jnp.ndarray    # [R,nb] 1/Bo on the saturated curve
    mu_sat: jnp.ndarray       # [R,nb]
    slope_inv_b: jnp.ndarray  # [R,nb] d(1/Bo)/dp undersaturated at each Rs
    slope_mu: jnp.ndarray     # [R,nb] d(mu)/dp undersaturated
    usat_p: jnp.ndarray       # [R,nb,m] per-branch pressure rows
    usat_inv_b: jnp.ndarray   # [R,nb,m] 1/Bo on those rows
    usat_mu: jnp.ndarray      # [R,nb,m] viscosity on those rows
    # 1/(Bo mu) banks: viscosity interpolates these and divides
    # (reference inverseOilBMuTable_ convention; _mu_from_inv_b_mu)
    inv_b_mu_sat: jnp.ndarray | None = None   # [R,nb]
    usat_inv_b_mu: jnp.ndarray | None = None  # [R,nb,m]
    # number of REAL deck branches per region (jit-static metadata).
    # The branch axis is padded to nb_max for banking; Rs extrapolation
    # beyond the table must use the last two REAL branches (constant-p
    # linear extension — pinned by the Norne region-2 Rs>=95 points), so
    # the Rs segment index is clamped to nb_real-2.
    usat_nb: "StaticCounts | None" = None

    # --- saturated properties ---
    def rs_sat(self, p, reg=0):
        """Saturated (maximum) dissolved GOR at pressure p."""
        return jnp.maximum(
            interp1d(p, row(self.p_sat, reg), row(self.rs_tab, reg)), 0.0)

    def p_bub(self, rs, reg=0):
        """Bubble-point (saturation) pressure for a given Rs."""
        return interp1d(rs, row(self.rs_tab, reg), row(self.p_sat, reg))

    def _usat(self, p, rs, reg, vals_bank):
        """2-D undersaturated eval: every branch at pressure p (linear
        extrapolation beyond its rows), blended linearly in Rs — with
        linear extrapolation in Rs beyond the branch range too (the
        reference extrapolates below the first Rs line; pinned by the
        Norne region-2 Rs=21/30 points in tests/test_norne_pvt.py)."""
        import jax

        nodes = row(self.usat_p, reg)      # [nb, m]
        vals = row(vals_bank, reg)         # [nb, m]
        bvals = jax.vmap(lambda n, v: interp1d(p, n, v))(nodes, vals)
        rsn = row(self.rs_tab, reg)
        if self.usat_nb is None:
            return interp1d(rs, rsn, bvals)
        # segment index clamped to the REAL branch range so beyond-table
        # Rs extrapolates from the last two deck branches, not padding
        n_real = (self.usat_nb[0] if len(self.usat_nb) == 1
                  else self.usat_nb[reg])
        idx = jnp.clip(jnp.searchsorted(rsn, rs, side="right") - 1,
                       0, n_real - 2)
        x0, x1 = rsn[idx], rsn[idx + 1]
        f0, f1 = bvals[idx], bvals[idx + 1]
        return f0 + (f1 - f0) / (x1 - x0) * (rs - x0)

    # --- saturated-curve variants (the reference's dedicated 1-D
    # saturatedInverseFormationVolumeFactor / saturatedViscosity tables,
    # frozen by /root/reference/tests/test_norne_pvt.cpp for rs>=RsSat
    # points). Hosts (equilibration depth sweeps, diagnostics) use
    # these; the SIMULATOR path below does NOT, so the assembly is
    # continuous across the saturation boundary. ---
    def saturated_inv_b(self, p, reg=0):
        return interp1d(p, row(self.p_sat, reg), row(self.inv_b_sat, reg))

    def saturated_viscosity(self, p, reg=0):
        if self.inv_b_mu_sat is None:
            return interp1d(p, row(self.p_sat, reg), row(self.mu_sat, reg),
                            extrapolate=False)
        return _mu_from_inv_b_mu(
            self.saturated_inv_b(p, reg),
            interp1d(p, row(self.p_sat, reg), row(self.inv_b_mu_sat, reg)))

    # --- properties at (p, rs): ALWAYS the 2-D table, with rs clamped
    # to RsSat(p). A saturated cell (rs == rs_sat) and an undersaturated
    # cell approaching it evaluate the SAME interpolant, so the
    # assembly's properties are continuous through the Rs<->Sg primary-
    # variable switch (a dual sat-curve/2-D path has a small jump
    # between branch heads that can pin Newton at the boundary; the
    # reference's simulator path likewise evaluates the 2-D tables with
    # the fluid-state Rs, opm-material LiveOilPvt
    # inverseFormationVolumeFactor). ---
    def inv_b(self, p, rs, reg=0):
        rs_eff = jnp.minimum(rs, self.rs_sat(p, reg))
        return self._usat(p, rs_eff, reg, self.usat_inv_b)

    def viscosity(self, p, rs, reg=0):
        rs_eff = jnp.minimum(rs, self.rs_sat(p, reg))
        if self.inv_b_mu_sat is None:
            return self._usat(p, rs_eff, reg, self.usat_mu)
        invb = self._usat(p, rs_eff, reg, self.usat_inv_b)
        ibmu = self._usat(p, rs_eff, reg, self.usat_inv_b_mu)
        return _mu_from_inv_b_mu(invb, ibmu)

    @staticmethod
    def from_table(pvto: PvtoTable) -> "LiveOilPvt":
        return LiveOilPvt.from_tables([pvto])

    @staticmethod
    def from_tables(pvtos: list) -> "LiveOilPvt":
        cols = []
        usats = []
        m_max = max(max(len(b[0]) for b in pvto.branches)
                    for pvto in pvtos)
        nb_max = max(len(pvto.rs) for pvto in pvtos)
        for pvto in pvtos:
            nb = len(pvto.rs)
            p_sat = np.empty(nb)
            inv_b_sat = np.empty(nb)
            mu_sat = np.empty(nb)
            ibmu_sat = np.empty(nb)
            slope_b = np.full(nb, np.nan)
            slope_m = np.full(nb, np.nan)
            up = np.empty((nb, m_max))
            ub = np.empty((nb, m_max))
            um = np.empty((nb, m_max))
            ubm = np.empty((nb, m_max))
            need_fill = []
            for i, (p, bo, mu) in enumerate(pvto.branches):
                p_sat[i] = p[0]
                inv_b_sat[i] = 1.0 / bo[0]
                mu_sat[i] = mu[0]
                ibmu_sat[i] = 1.0 / (bo[0] * mu[0])
                if len(p) > 1:
                    # least-squares linear slope through the branch points
                    dp = p - p[0]
                    db = 1.0 / bo - 1.0 / bo[0]
                    dm = mu - mu[0]
                    denom = np.sum(dp * dp)
                    slope_b[i] = np.sum(dp * db) / denom
                    slope_m[i] = np.sum(dp * dm) / denom
                    up[i], ub[i], um[i], ubm[i] = _pad_rows(
                        p, 1.0 / bo, mu, 1.0 / (bo * mu), m=m_max)
                else:
                    need_fill.append(i)
            # enforce strictly increasing saturated-pressure nodes: the
            # bank's node axis is p_sat, and decks MAY repeat a bubble
            # pressure across Rs branches (reference fixture
            # SUMMARY_DECK_NON_CONSTANT_POROSITY.DATA: heads at
            # pb=1 bar for both Rs=0 and Rs=1) — a zero-width segment
            # NaNs every interpolation evaluated exactly AT the node
            for i in range(1, nb):
                if p_sat[i] <= p_sat[i - 1]:
                    p_sat[i] = p_sat[i - 1] + max(
                        1e-9 * max(abs(p_sat[i - 1]), 1.0), 1e-7)
            # fill missing slopes from the nearest branch that has data
            # (ECLIPSE extrapolates undersaturated data between branches)
            have = ~np.isnan(slope_b)
            idx = np.arange(nb)
            if have.any():
                slope_b = np.interp(idx, idx[have], slope_b[have])
                slope_m = np.interp(idx, idx[have], slope_m[have])
            else:
                slope_b[:] = 0.0
                slope_m[:] = 0.0
            # single-row branches borrow the nearest data branch's
            # pressure offsets and value deltas (the reference's PVTO
            # table "filling" of incomplete undersaturated data)
            for i in need_fill:
                if have.any():
                    j = idx[have][np.argmin(np.abs(idx[have] - i))]
                    up[i] = p_sat[i] + (up[j] - p_sat[j])
                    ub[i] = inv_b_sat[i] + (ub[j] - inv_b_sat[j])
                    um[i] = mu_sat[i] + (um[j] - mu_sat[j])
                    ubm[i] = ibmu_sat[i] + (ubm[j] - ibmu_sat[j])
                else:
                    up[i] = p_sat[i] + np.arange(m_max) * 1e6
                    ub[i] = inv_b_sat[i]
                    um[i] = mu_sat[i]
                    ubm[i] = ibmu_sat[i]
            # node axis for the bank is p_sat (strictly increasing); rs
            # rides along as a data column and keeps increasing under the
            # slope-extension padding
            cols.append([p_sat, np.asarray(pvto.rs), inv_b_sat, mu_sat,
                         slope_b, slope_m, ibmu_sat])
            # pad the branch axis to nb_max by continuing the last branch
            # shifted to the extrapolated saturated heads
            if nb < nb_max:
                next_rows = []
                for arr, head in ((up, p_sat), (ub, inv_b_sat),
                                  (um, mu_sat), (ubm, ibmu_sat)):
                    d = (head[-1] - head[-2]) if nb > 1 else (
                        1e6 if arr is up else 0.0)
                    ext = np.stack([arr[nb - 1] + d * (k + 1)
                                    for k in range(nb_max - nb)])
                    next_rows.append(np.concatenate([arr, ext]))
                up, ub, um, ubm = next_rows
            usats.append((up, ub, um, ubm))
        p_sat, rs, invb, mu, sb, sm, ibmu = _pad_bank_linear(cols)
        return LiveOilPvt(
            p_sat=jnp.asarray(p_sat), rs_tab=jnp.asarray(rs),
            inv_b_sat=jnp.asarray(invb), mu_sat=jnp.asarray(mu),
            slope_inv_b=jnp.asarray(sb), slope_mu=jnp.asarray(sm),
            usat_p=jnp.asarray(np.stack([u[0] for u in usats])),
            usat_inv_b=jnp.asarray(np.stack([u[1] for u in usats])),
            usat_mu=jnp.asarray(np.stack([u[2] for u in usats])),
            inv_b_mu_sat=jnp.asarray(ibmu),
            usat_inv_b_mu=jnp.asarray(np.stack([u[3] for u in usats])),
            usat_nb=StaticCounts(tuple(len(pvto.rs) for pvto in pvtos)))


class WetGasPvt(NamedTuple):
    """PVTG wet gas with vaporized oil, banked per PVTNUM region.

    Mirrors LiveOilPvt's structure with the roles of p and Rv swapped:
    the saturated curve is sampled at the deck's pressure nodes; the
    undersaturated behavior (rv below rv_sat at fixed p) is the full
    2-D table — each pressure line keeps its deck Rv rows, evaluation
    at (p, rv) interpolates the bracketing lines at the SAME rv then
    blends linearly in p. Viscosity interpolates 1/(Bg mu) and divides
    (reference inverseGasBMu convention). The ``slope_*`` fields keep a
    cheap per-line d/d(rv) linearization for hosts (models/init.py).
    """

    p: jnp.ndarray            # [R,np] pressure nodes
    rv_tab: jnp.ndarray       # [R,np] saturated Rv at those nodes
    inv_b_sat: jnp.ndarray    # [R,np] 1/Bg on the saturated curve
    mu_sat: jnp.ndarray       # [R,np]
    slope_inv_b: jnp.ndarray  # [R,np] d(1/Bg)/d(rv) undersaturated
    slope_mu: jnp.ndarray     # [R,np]
    usat_rv: jnp.ndarray | None = None        # [R,np,m] per-line Rv rows
    usat_inv_b: jnp.ndarray | None = None     # [R,np,m]
    inv_b_mu_sat: jnp.ndarray | None = None   # [R,np]
    usat_inv_b_mu: jnp.ndarray | None = None  # [R,np,m]
    # real (non-padded) pressure-line count per region (jit-static);
    # p extrapolation beyond the table uses the last two REAL lines
    usat_np: "StaticCounts | None" = None

    def rv_sat(self, pres, reg=0):
        """Saturated (maximum) vaporized OGR at pressure p."""
        return jnp.maximum(
            interp1d(pres, row(self.p, reg), row(self.rv_tab, reg)), 0.0)

    def _usat(self, pres, rv, reg, vals_bank):
        """2-D undersaturated eval: every pressure line at rv (linear
        extrapolation beyond its rows), blended linearly in p."""
        import jax

        nodes = row(self.usat_rv, reg)     # [np, m] rows ascending in rv
        vals = row(vals_bank, reg)
        lvals = jax.vmap(lambda n, v: interp1d(rv, n, v))(nodes, vals)
        pn = row(self.p, reg)
        if self.usat_np is None:
            return interp1d(pres, pn, lvals)
        # clamp the p segment to the REAL line range so beyond-table
        # pressures extrapolate from the last two deck lines, not padding
        n_real = (self.usat_np[0] if len(self.usat_np) == 1
                  else self.usat_np[reg])
        idx = jnp.clip(jnp.searchsorted(pn, pres, side="right") - 1,
                       0, n_real - 2)
        x0, x1 = pn[idx], pn[idx + 1]
        f0, f1 = lvals[idx], lvals[idx + 1]
        return f0 + (f1 - f0) / (x1 - x0) * (pres - x0)

    def saturated_inv_b(self, pres, reg=0):
        return interp1d(pres, row(self.p, reg), row(self.inv_b_sat, reg))

    def saturated_viscosity(self, pres, reg=0):
        if self.inv_b_mu_sat is None:
            return interp1d(pres, row(self.p, reg), row(self.mu_sat, reg),
                            extrapolate=False)
        return _mu_from_inv_b_mu(
            self.saturated_inv_b(pres, reg),
            interp1d(pres, row(self.p, reg), row(self.inv_b_mu_sat, reg)))

    # --- properties at (p, rv): ALWAYS the 2-D table with rv clamped
    # to RvSat(p) — continuous through the Rv<->Sg switch (see the
    # LiveOilPvt rationale above) ---
    def inv_b(self, pres, rv, reg=0):
        rv_eff = jnp.minimum(rv, self.rv_sat(pres, reg))
        if self.usat_rv is None:
            drv = rv_eff - self.rv_sat(pres, reg)
            slope = interp1d(pres, row(self.p, reg),
                             row(self.slope_inv_b, reg), extrapolate=False)
            return self.saturated_inv_b(pres, reg) + slope * drv
        return self._usat(pres, rv_eff, reg, self.usat_inv_b)

    def viscosity(self, pres, rv, reg=0):
        rv_eff = jnp.minimum(rv, self.rv_sat(pres, reg))
        if self.usat_rv is None:
            drv = rv_eff - self.rv_sat(pres, reg)
            base = interp1d(pres, row(self.p, reg), row(self.mu_sat, reg),
                            extrapolate=False)
            slope = interp1d(pres, row(self.p, reg),
                             row(self.slope_mu, reg), extrapolate=False)
            return base + slope * drv
        invb = self._usat(pres, rv_eff, reg, self.usat_inv_b)
        ibmu = self._usat(pres, rv_eff, reg, self.usat_inv_b_mu)
        return _mu_from_inv_b_mu(invb, ibmu)

    @staticmethod
    def from_tables(pvtgs: list) -> "WetGasPvt":
        cols = []
        usats = []
        m_max = max(max(len(b[0]) for b in pvtg.branches)
                    for pvtg in pvtgs)
        np_max = max(len(pvtg.p) for pvtg in pvtgs)
        for pvtg in pvtgs:
            npn = len(pvtg.p)
            rv_sat = np.empty(npn)
            inv_b_sat = np.empty(npn)
            mu_sat = np.empty(npn)
            ibmu_sat = np.empty(npn)
            slope_b = np.full(npn, np.nan)
            slope_m = np.full(npn, np.nan)
            urv = np.empty((npn, m_max))
            ub = np.empty((npn, m_max))
            ubm = np.empty((npn, m_max))
            need_fill = []
            for i, (rv, bg, mu) in enumerate(pvtg.branches):
                rv_sat[i] = rv[0]
                inv_b_sat[i] = 1.0 / bg[0]
                mu_sat[i] = mu[0]
                ibmu_sat[i] = 1.0 / (bg[0] * mu[0])
                if len(rv) > 1:
                    drv = rv - rv[0]
                    db = 1.0 / bg - 1.0 / bg[0]
                    dm = mu - mu[0]
                    denom = np.sum(drv * drv)
                    if denom > 0:
                        slope_b[i] = np.sum(drv * db) / denom
                        slope_m[i] = np.sum(drv * dm) / denom
                    # PVTG rows run from rv_sat DOWN toward dry gas;
                    # store ascending in rv for the interpolation
                    order = np.argsort(np.asarray(rv, float))
                    rv_a = np.asarray(rv, float)[order]
                    ib_a = (1.0 / np.asarray(bg, float))[order]
                    ibm_a = (1.0 / (np.asarray(bg, float)
                                    * np.asarray(mu, float)))[order]
                    if len(np.unique(rv_a)) < len(rv_a):
                        need_fill.append(i)
                    else:
                        urv[i], ub[i], ubm[i] = _pad_rows(
                            rv_a, ib_a, ibm_a, m=m_max)
                else:
                    need_fill.append(i)
            have = ~np.isnan(slope_b)
            idx = np.arange(npn)
            if have.any():
                slope_b = np.interp(idx, idx[have], slope_b[have])
                slope_m = np.interp(idx, idx[have], slope_m[have])
            else:
                slope_b[:] = 0.0
                slope_m[:] = 0.0
            filled = np.asarray([i not in need_fill for i in range(npn)])
            for i in need_fill:
                if filled.any():
                    j = idx[filled][np.argmin(np.abs(idx[filled] - i))]
                    urv[i] = rv_sat[i] + (urv[j] - rv_sat[j])
                    ub[i] = inv_b_sat[i] + (ub[j] - inv_b_sat[j])
                    ubm[i] = ibmu_sat[i] + (ubm[j] - ibmu_sat[j])
                else:
                    urv[i] = rv_sat[i] + np.arange(m_max) * 1e-3
                    ub[i] = inv_b_sat[i]
                    ubm[i] = ibmu_sat[i]
            cols.append([pvtg.p, rv_sat, inv_b_sat, mu_sat, slope_b,
                         slope_m, ibmu_sat])
            if npn < np_max:
                next_rows = []
                for arr, head in ((urv, rv_sat), (ub, inv_b_sat),
                                  (ubm, ibmu_sat)):
                    d = (head[-1] - head[-2]) if npn > 1 else 0.0
                    ext = np.stack([arr[npn - 1] + d * (k + 1)
                                    for k in range(np_max - npn)])
                    next_rows.append(np.concatenate([arr, ext]))
                urv, ub, ubm = next_rows
            usats.append((urv, ub, ubm))
        p, rv, invb, mu, sb, sm, ibmu = _pad_bank_linear(cols)
        return WetGasPvt(
            p=jnp.asarray(p), rv_tab=jnp.asarray(rv),
            inv_b_sat=jnp.asarray(invb), mu_sat=jnp.asarray(mu),
            slope_inv_b=jnp.asarray(sb), slope_mu=jnp.asarray(sm),
            usat_rv=jnp.asarray(np.stack([u[0] for u in usats])),
            usat_inv_b=jnp.asarray(np.stack([u[1] for u in usats])),
            inv_b_mu_sat=jnp.asarray(ibmu),
            usat_inv_b_mu=jnp.asarray(np.stack([u[2] for u in usats])),
            usat_np=StaticCounts(tuple(len(pvtg.p) for pvtg in pvtgs)))


def water_pvt_from_props(props: PropsSection) -> WaterPvt:
    recs = props.pvtw_regions or [props.pvtw]
    return WaterPvt(
        p_ref=jnp.asarray([w.p_ref for w in recs]),
        inv_b_ref=jnp.asarray([1.0 / w.b_ref for w in recs]),
        comp=jnp.asarray([w.comp for w in recs]),
        mu_ref=jnp.asarray([w.visc for w in recs]),
        viscosibility=jnp.asarray([w.viscosibility for w in recs]),
    )
