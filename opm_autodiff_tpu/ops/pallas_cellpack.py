"""Pallas TPU kernel: fused per-cell property pack + 3-tangent Jacobian.

The per-cell packed evaluation (models/structured.py _pack_cell under
vmap(jacfwd)) lowers to ~150 small XLA kernels whose launch latency
dominates assembly at field scale (measured 1.9 ms of a 5.5 ms Newton
iteration at 49k cells). This kernel evaluates the whole black-oil
property chain — PVT interpolation, saturation functions, densities,
mobilities, accumulation — for one z-plane of cells per grid step, with
the three primary-variable tangents carried as hand-written forward-mode
jets (value + 3 derivative planes per quantity). One launch replaces the
whole sweep.

Tables ride in SMEM as 1-D node/value arrays; every interpolation uses
the telescoping-clamp identity

    f(x) = v_0 + sum_k s_k * (clamp(x, n_k, n_{k+1}) - n_k)

whose x-derivative is the indicator-weighted slope sum — no gathers, no
searchsorted, exact piecewise-linear semantics (props/tables.py
interp1d, both the linear-extrapolation and end-clamped variants).

Scope (supports()): live-oil (PVTO) decks with dry (PVDG) or wet (PVTG)
gas, multiple SATNUM/PVTNUM regions (masked per-region interpolation,
bounded at 8 regions), with or without end-point scaling — the
SPE/Norne-class configurations. Hysteresis, huge undersaturated banks,
and non-live-oil fluid systems fall back to the XLA vmap(jacfwd) path.
Mosaic has no f64, so the pack runs in f32; the CNV (1e-2) and MB
(1e-6) tolerances sit far above f32 noise and drift compensation mops
up the residual floor (see solvers/newton.py).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NQ = 17


def enabled() -> bool:
    env = os.environ.get("OPM_TPU_PALLAS_ASSEMBLY")
    if env is not None:
        return env == "1"
    # multi-chip: pallas_call does not partition under GSPMD — the
    # sharded (mesh) path keeps the XLA assembly until the kernels are
    # wrapped in shard_map (z-slab cellpack is trivially shardable;
    # flux needs a halo exchange; future round)
    return (jax.default_backend() not in ("cpu",)
            and jax.device_count() == 1)


def supports(fs, cells) -> bool:
    """Static (trace-time) check for the fused fast path.

    Live-oil + dry-gas black-oil decks, any SATNUM/PVTNUM region count
    (masked per-region table interpolation; ~R x interp cost, so huge
    region counts fall back), with or without end-point scaling.
    Hysteresis (eps channels beyond 12) keeps the XLA path — the
    Killough scanning model is not in the kernel.
    """
    from opm_autodiff_tpu.props.pvt import (DryGasPvt, LiveOilPvt,
                                            WetGasPvt)

    if not isinstance(fs.oil, LiveOilPvt):
        return False
    if isinstance(fs.gas, DryGasPvt):
        if fs.gas.inv_b_mu_tab is None:
            return False  # hand-built tables without the 1/(B mu) banks
    elif isinstance(fs.gas, WetGasPvt):
        # wet gas (PVTG, the true-Norne configuration): needs the 2-D
        # undersaturated banks + static line counts, and the unrolled
        # 2-D jet size bound like PVTO below
        if (fs.gas.usat_rv is None or fs.gas.usat_inv_b_mu is None
                or fs.gas.usat_np is None):
            return False
        if (int(fs.gas.p.shape[0]) * int(fs.gas.p.shape[1])
                * int(fs.gas.usat_rv.shape[2]) > 1024):
            return False
    else:
        return False
    if fs.oil.inv_b_mu_sat is None:
        return False
    if cells.eps is not None and cells.eps.shape[-1] != 12:
        return False  # hysteresis channels
    sat = fs.sat
    max_r = max(int(sat.sw.shape[0]), int(sat.sg.shape[0]),
                int(fs.oil.p_sat.shape[0]), int(fs.gas.p.shape[0]),
                int(fs.water.p_ref.shape[0]), int(fs.rock.p_ref.shape[0]),
                int(fs.rho_surf.shape[0]))
    if max_r > 8:
        return False
    if int(sat.sg.shape[0]) != int(sat.sw.shape[0]):
        return False  # one SATNUM region count across the sat banks
    # unrolled 2-D PVTO cost: R * nb * m interpolation segments per oil
    # property — bound the kernel size for pathological tables
    if (int(fs.oil.p_sat.shape[0]) * int(fs.oil.p_sat.shape[1])
            * int(fs.oil.usat_p.shape[2]) > 1024):
        return False
    return True


# ---------------------------------------------------------------------------
# plane jets: (value_plane, (d0, d1, d2)) with derivative planes wrt
# (po, sw, x3); derivative None means identically zero
# ---------------------------------------------------------------------------

def _jconst(v):
    return (v, (None, None, None))


def _dadd(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _dneg(a):
    return None if a is None else -a


def _dscale(s, a):
    """s * a with s a plane/scalar and a a derivative plane or None."""
    return None if a is None else s * a


def _jadd(a, b):
    return (a[0] + b[0], tuple(_dadd(x, y) for x, y in zip(a[1], b[1])))


def _jsub(a, b):
    return (a[0] - b[0],
            tuple(_dadd(x, _dneg(y)) for x, y in zip(a[1], b[1])))


def _jmul(a, b):
    v = a[0] * b[0]
    d = tuple(_dadd(_dscale(b[0], x), _dscale(a[0], y))
              for x, y in zip(a[1], b[1]))
    return (v, d)


def _jdiv(a, b):
    inv = 1.0 / b[0]
    v = a[0] * inv
    d = tuple(_dadd(_dscale(inv, x), _dscale(-v * inv, y))
              for x, y in zip(a[1], b[1]))
    return (v, d)


def _jscale(s, a):
    """Constant scalar times jet."""
    return (s * a[0], tuple(_dscale(s, d) for d in a[1]))


def _jmax0(a):
    """max(a, 0) with derivative gated on a > 0."""
    m = a[0] > 0.0
    return (jnp.maximum(a[0], 0.0),
            tuple(None if d is None else jnp.where(m, d, 0.0)
                  for d in a[1]))


def _jmin(a, cap_plane):
    """min(a, cap) with cap a constant plane (no derivative)."""
    m = a[0] <= cap_plane
    return (jnp.minimum(a[0], cap_plane),
            tuple(None if d is None else jnp.where(m, d, 0.0)
                  for d in a[1]))


def _jwhere(mask, a, b):
    v = jnp.where(mask, a[0], b[0])
    d = []
    for x, y in zip(a[1], b[1]):
        if x is None and y is None:
            d.append(None)
        else:
            xx = x if x is not None else jnp.zeros_like(v)
            yy = y if y is not None else jnp.zeros_like(v)
            d.append(jnp.where(mask, xx, yy))
    return (v, tuple(d))


def _interp_core(xv, n, v, K, clamp_ends):
    """Telescoping-clamp interpolation of plane xv through one table
    given as python lists of K scalars. Returns (value, df/dx) planes."""
    val = v[0] * jnp.ones_like(xv)
    dfdx = jnp.zeros_like(xv)
    for k in range(K - 1):
        s = (v[k + 1] - v[k]) / (n[k + 1] - n[k])
        lo, hi = n[k], n[k + 1]
        first = (k == 0) and not clamp_ends
        last = (k == K - 2) and not clamp_ends
        if first and last:
            t = xv - lo
        elif first:
            t = jnp.minimum(xv, hi) - lo
        elif last:
            t = jnp.maximum(xv, lo) - lo
        else:
            t = jnp.clip(xv, lo, hi) - lo
        # derivative segment choice matches interp1d's
        # searchsorted(side="right"): x exactly on a node belongs to the
        # RIGHT segment (states initialized from table nodes — Rs at
        # branch heads, Sw at endpoints — sit exactly there, so the
        # convention is load-bearing, not cosmetic)
        if first and last:
            ind = jnp.ones_like(xv, bool)
        elif first:
            ind = xv < hi
        elif last:
            ind = xv >= lo
        else:
            ind = (xv >= lo) & (xv < hi)
        val = val + s * t
        dfdx = dfdx + jnp.where(ind, s, 0.0)
    if clamp_ends:
        # interp1d(extrapolate=False) clips the value; outside the table
        # the derivative is 0 (first/last segments above still claim
        # those regions, so mask them off)
        inside = (xv >= n[0]) & (xv < n[K - 1])
        dfdx = jnp.where(inside, dfdx, 0.0)
    return val, dfdx


def _jinterp(x, nodes_ref, vals_ref, K, clamp_ends, R=1, reg=None):
    """Piecewise-linear jet of a jet x through an SMEM table bank.

    ``K`` is the static node count, ``R`` the static region count: the
    SMEM arrays hold R tables of K nodes flattened [R*K]; ``reg`` is the
    per-cell region plane (ignored when R == 1 — no masking cost on
    single-region decks). ``clamp_ends`` selects the extrapolate=False
    (end-clamped) semantics of props/tables.interp1d.
    """
    xv = x[0]
    if R == 1:
        n = [nodes_ref[k] for k in range(K)]
        v = [vals_ref[k] for k in range(K)]
        val, dfdx = _interp_core(xv, n, v, K, clamp_ends)
    else:
        val = jnp.zeros_like(xv)
        dfdx = jnp.zeros_like(xv)
        for r in range(R):
            n = [nodes_ref[r * K + k] for k in range(K)]
            v = [vals_ref[r * K + k] for k in range(K)]
            val_r, dfdx_r = _interp_core(xv, n, v, K, clamp_ends)
            m = reg == r
            val = val + jnp.where(m, val_r, 0.0)
            dfdx = dfdx + jnp.where(m, dfdx_r, 0.0)
    return (val, tuple(_dscale(dfdx, d) for d in x[1]))


def _jinterp2d(p, rs, rsn_ref, up_ref, uv_ref, NB, M, R=1, reg=None,
               nb_real=None):
    """2-D undersaturated PVTO jet: every Rs branch interpolated at the
    SAME pressure p (linear extrapolation beyond its rows), then blended
    linearly in Rs with end clamping — the semantics of
    props/pvt.LiveOilPvt._usat. ``up_ref``/``uv_ref`` are flattened
    [R*NB*M] SMEM banks of per-branch pressure rows / values; ``rsn_ref``
    is the [R*NB] Rs node bank."""
    pv, rsv = p[0], rs[0]

    def one_region(r):
        # only the region's REAL deck branches participate: padding is
        # banking filler; beyond-table Rs extrapolates from the last
        # two real branches (props/pvt.LiveOilPvt._usat semantics)
        nbr = nb_real[r] if nb_real is not None else NB
        vs, dps = [], []
        for i in range(nbr):
            base = (r * NB + i) * M
            n = [up_ref[base + k] for k in range(M)]
            v = [uv_ref[base + k] for k in range(M)]
            val_i, ddp_i = _interp_core(pv, n, v, M, False)
            vs.append(val_i)
            dps.append(ddp_i)
        n_rs = [rsn_ref[r * NB + i] for i in range(nbr)]
        val, ddp = vs[0], dps[0]
        ddrs = jnp.zeros_like(rsv)
        # telescoping sum with LINEAR EXTRAPOLATION beyond the branch
        # range (first/last segment unclamped on the outer side) —
        # matches props/pvt.LiveOilPvt._usat and the Norne region-2
        # low-Rs reference points
        for k in range(nbr - 1):
            lo, hi = n_rs[k], n_rs[k + 1]
            inv = 1.0 / (hi - lo)
            sv = (vs[k + 1] - vs[k]) * inv
            sp = (dps[k + 1] - dps[k]) * inv
            r_k = rsv
            if k > 0:
                r_k = jnp.maximum(r_k, lo)
            if k < nbr - 2:
                r_k = jnp.minimum(r_k, hi)
            t = r_k - lo
            in_lo = (rsv >= lo) if k > 0 else (rsv == rsv)
            in_hi = (rsv < hi) if k < nbr - 2 else (rsv == rsv)
            val = val + sv * t
            ddp = ddp + sp * t
            ddrs = ddrs + jnp.where(in_lo & in_hi, sv, 0.0)
        return val, ddrs, ddp

    if R == 1:
        val, ddrs, ddp = one_region(0)
    else:
        val = jnp.zeros_like(pv)
        ddrs = jnp.zeros_like(pv)
        ddp = jnp.zeros_like(pv)
        for r in range(R):
            v_r, drs_r, dp_r = one_region(r)
            m = reg == r
            val = val + jnp.where(m, v_r, 0.0)
            ddrs = ddrs + jnp.where(m, drs_r, 0.0)
            ddp = ddp + jnp.where(m, dp_r, 0.0)
    douts = []
    for j in range(3):
        d = None
        if rs[1][j] is not None:
            d = _dadd(d, ddrs * rs[1][j])
        if p[1][j] is not None:
            d = _dadd(d, ddp * p[1][j])
        douts.append(d)
    return (val, tuple(douts))


def _sel(vec_ref, R, reg, like):
    """Per-cell plane from a per-region SMEM vector (masked select; a
    compile-time constant broadcast when R == 1)."""
    if R == 1:
        return vec_ref[0] * jnp.ones_like(like)
    out = jnp.zeros_like(like)
    for r in range(R):
        out = out + jnp.where(reg == r, vec_ref[r], 0.0)
    return out


def _d3(a):
    """Materialize the three derivative planes (zeros for None)."""
    z = jnp.zeros_like(a[0])
    return [a[1][i] if a[1][i] is not None else z for i in range(3)]


def _jremap(s, a_c, b_c, a_t, b_t):
    """Two-point horizontal EPS remap of a jet: cell interval
    [a_c,b_c] -> table interval [a_t,b_t] (planes; SatFunc._remap)."""
    f = (b_t - a_t) / jnp.maximum(b_c - a_c, 1e-12)
    return (a_t + (s[0] - a_c) * f, tuple(_dscale(f, d) for d in s[1]))


def _jplane(p):
    """Constant-plane jet."""
    return (p, (None, None, None))


def _make_kernel(cfg: dict):
    """Build the kernel fn; table sizes / region counts / EPS presence
    are static (``cfg``: Ks + R_sat/R_pvt/R_wat/R_rock/R_rho + has_eps).
    """
    has_eps = cfg["has_eps"]

    def kernel(*refs):
        it = iter(refs)
        u_ref = next(it)
        flag_ref = next(it)
        pv_ref = next(it)
        mob_ref = next(it)
        sreg_ref = next(it)
        preg_ref = next(it)
        eps_ref = next(it) if has_eps else None
        (sw_n, krw_v, krow_v, pcow_v,
         sg_n, krg_v, krog_v, pcog_v,
         psat_n, rs_v, invb_v, ibmusat_v, up_v, ub_v, ubm_v) = \
            [next(it) for _ in range(15)]
        if cfg.get("wetgas"):
            # PVTG banks: pressure nodes, saturated Rv, per-line 2-D
            # rows (rv / 1/Bg / 1/(Bg mu))
            pg_n, rvsat_v, urv_v, ugb_v, ugbm_v = \
                [next(it) for _ in range(5)]
        else:
            pg_n, invbg_v, ibmug_v = [next(it) for _ in range(3)]
        wsc_ref = next(it)   # [5*Rw] p_ref/inv_b/comp/mu/visco
        rk_ref = next(it)    # [2*Rr] p_ref/comp
        rho_ref = next(it)   # [3*Rd] rho_w/rho_o/rho_g
        ep_ref = next(it)    # [11*Rs] sat endpoints (see packing below)
        q_ref = next(it)
        dq_ref = next(it)

        one = jnp.ones_like(u_ref[0, 0])
        sreg = sreg_ref[0, 0]
        preg = preg_ref[0, 0]
        Rs, Rp = cfg["R_sat"], cfg["R_pvt"]
        Rw, Rr, Rd = cfg["R_wat"], cfg["R_rock"], cfg["R_rho"]

        def selv(ref, i, R, reg):
            """Plane from group i of a flattened [G*R] per-region SMEM
            vector."""
            if R == 1:
                return ref[i] * one
            out = jnp.zeros_like(one)
            for r in range(R):
                out = out + jnp.where(reg == r, ref[i * R + r], 0.0)
            return out

        po = (u_ref[0, 0], (one, None, None))
        sw = (u_ref[0, 1], (None, one, None))
        x3 = (u_ref[0, 2], (None, None, one))
        flag = flag_ref[0, 0]
        is_sg = flag == 0
        is_rs = flag == 1
        is_rv = flag == 2
        zero = _jconst(jnp.zeros_like(one))

        if cfg.get("wetgas"):
            # VAPOIL condensate state: x3 means Rv, sg = 1 - sw
            sg = _jwhere(is_sg, x3,
                         _jwhere(is_rv, _jsub(_jconst(one), sw), zero))
        else:
            sg = _jwhere(is_sg, x3, zero)
        so = _jsub(_jsub(_jconst(one), sw), sg)

        Kp, Kg = cfg["pvto"], cfg["pvdg"]
        Mp = cfg["pvto_m"]
        Ksw, Ksg = cfg["swof"], cfg["sgof"]
        # saturated Rs from pressure (linear extrapolation), >= 0,
        # capped by the DRSDT channel (the uncapped value drives the
        # saturated-vs-undersaturated table selection, like pvt.py)
        rs_sat_raw = _jmax0(_jinterp(po, psat_n, rs_v, Kp, False, Rp, preg))
        rs_sat = _jmin(rs_sat_raw, mob_ref[0, 3])
        rs = _jwhere(is_rs, x3, rs_sat)

        # --- end-point scaling planes (SatFunc.krw/krow/... semantics:
        # horizontal two-point remaps + vertical kr/Pc scaling; NaN
        # channel = the cell's region table default) ---
        # ep_ref packing: 0 swl 1 swcr 2 swu 3 sw0w 4 sgcr 5 sgu 6 sg0g
        #                 7 krw_mx 8 kro_mx 9 krg_mx 10 swco
        swl_t = selv(ep_ref, 0, Rs, sreg)
        swcr_t = selv(ep_ref, 1, Rs, sreg)
        swu_t = selv(ep_ref, 2, Rs, sreg)
        sw0w_t = selv(ep_ref, 3, Rs, sreg)
        sgcr_t = selv(ep_ref, 4, Rs, sreg)
        sgu_t = selv(ep_ref, 5, Rs, sreg)
        sg0g_t = selv(ep_ref, 6, Rs, sreg)
        krwmx_t = selv(ep_ref, 7, Rs, sreg)
        kromx_t = selv(ep_ref, 8, Rs, sreg)
        krgmx_t = selv(ep_ref, 9, Rs, sreg)
        swco_t = selv(ep_ref, 10, Rs, sreg)

        if has_eps:
            def ech(ch, default):
                v = eps_ref[0, ch]
                return jnp.where(jnp.isnan(v), default, v)

            swl_c = ech(0, swl_t)
            swcr_c = ech(1, swcr_t)
            swu_c = ech(2, swu_t)
            sw0w_c = ech(3, sw0w_t)
            sgcr_c = ech(4, sgcr_t)
            sgu_c = ech(5, sgu_t)
            sg0g_c = ech(6, sg0g_t)
            s_krw = ech(7, krwmx_t) / jnp.maximum(krwmx_t, 1e-12)
            s_kro = ech(8, kromx_t) / jnp.maximum(kromx_t, 1e-12)
            s_krg = ech(9, krgmx_t) / jnp.maximum(krgmx_t, 1e-12)
            m_pcw = ech(10, one)
            m_pcg = ech(11, one)
            swco_c = ech(0, swco_t)
        else:
            swl_c, swcr_c, swu_c = swl_t, swcr_t, swu_t
            sw0w_c, sgcr_c, sgu_c, sg0g_c = sw0w_t, sgcr_t, sgu_t, sg0g_t
            s_krw = s_kro = s_krg = one
            m_pcw = m_pcg = one
            swco_c = swco_t

        def j_krw(sw_jet):
            s_in = _jremap(sw_jet, swcr_c, swu_c, swcr_t, swu_t)
            v = _jmax0(_jinterp(s_in, sw_n, krw_v, Ksw, True, Rs, sreg))
            return _jmul(_jplane(s_krw), v)

        def j_krow(sw_jet):
            s_in = _jremap(sw_jet, swl_c, sw0w_c, swl_t, sw0w_t)
            v = _jmax0(_jinterp(s_in, sw_n, krow_v, Ksw, True, Rs, sreg))
            return _jmul(_jplane(s_kro), v)

        def j_pcow(sw_jet):
            s_in = _jremap(sw_jet, swl_c, swu_c, swl_t, swu_t)
            v = _jinterp(s_in, sw_n, pcow_v, Ksw, True, Rs, sreg)
            return _jmul(_jplane(m_pcw), v)

        def j_krg(sg_jet):
            s_in = _jremap(sg_jet, sgcr_c, sgu_c, sgcr_t, sgu_t)
            v = _jmax0(_jinterp(s_in, sg_n, krg_v, Ksg, True, Rs, sreg))
            return _jmul(_jplane(s_krg), v)

        def j_krog(sg_jet):
            zp = jnp.zeros_like(one)
            s_in = _jremap(sg_jet, zp, sg0g_c, zp, sg0g_t)
            v = _jmax0(_jinterp(s_in, sg_n, krog_v, Ksg, True, Rs, sreg))
            return _jmul(_jplane(s_kro), v)

        def j_pcog(sg_jet):
            v = _jinterp(sg_jet, sg_n, pcog_v, Ksg, True, Rs, sreg)
            return _jmul(_jplane(m_pcg), v)

        pcow = j_pcow(sw)
        pcog = j_pcog(sg)
        pw = _jsub(po, pcow)
        pg = _jadd(po, pcog)

        # water PVT (PVTW second-order expansions), per PVT region
        w_pref = selv(wsc_ref, 0, Rw, preg)
        w_invb = selv(wsc_ref, 1, Rw, preg)
        w_comp = selv(wsc_ref, 2, Rw, preg)
        w_mu = selv(wsc_ref, 3, Rw, preg)
        w_visco = selv(wsc_ref, 4, Rw, preg)
        xw = _jmul(_jplane(w_comp), _jsub(pw, _jplane(w_pref)))
        inv_bw = _jmul(_jplane(w_invb),
                       _jadd(_jadd(_jconst(one), xw),
                             _jscale(0.5, _jmul(xw, xw))))
        yw = _jmul(_jplane(-w_visco), _jsub(pw, _jplane(w_pref)))
        mu_w = _jdiv(_jplane(w_mu),
                     _jadd(_jadd(_jconst(one), yw),
                           _jscale(0.5, _jmul(yw, yw))))

        # live oil: ALWAYS the full 2-D table (branches at constant p
        # blended in Rs) at rs clamped to RsSat — continuous through
        # the Rs<->Sg switch; viscosity interpolates 1/(Bo mu) and
        # divides (props/pvt.LiveOilPvt.inv_b/viscosity semantics,
        # anchored on test_norne_pvt expectations)
        rs_ev = _jwhere(rs[0] < rs_sat_raw[0], rs, rs_sat_raw)
        inv_bo = _jinterp2d(po, rs_ev, rs_v, up_v, ub_v, Kp, Mp, Rp,
                            preg, cfg["pvto_nb"])
        ibmu_o = _jinterp2d(po, rs_ev, rs_v, up_v, ubm_v, Kp, Mp, Rp,
                            preg, cfg["pvto_nb"])
        ibmu_o = _jwhere(ibmu_o[0] > 1e-12, ibmu_o,
                         _jconst(1e-12 * one))
        mu_o = _jdiv(inv_bo, ibmu_o)

        if cfg.get("wetgas"):
            # wet gas (PVTG): rv = x3 in the condensate state, else
            # RvSat(pg) capped by the DRVDT channel; properties from
            # the 2-D table — every pressure line interpolated at rv,
            # blended in p (props/pvt.WetGasPvt._usat; same _jinterp2d
            # with the roles of the row variable and blend axis swapped)
            Mg = cfg["pvtg_m"]
            rv_sat_raw = _jmax0(_jinterp(pg, pg_n, rvsat_v, Kg, False,
                                         Rp, preg))
            rv_sat = _jmin(rv_sat_raw, mob_ref[0, 4])
            rv = _jwhere(is_rv, x3, rv_sat)
            rv_ev = _jwhere(rv[0] < rv_sat_raw[0], rv, rv_sat_raw)
            inv_bg = _jinterp2d(rv_ev, pg, pg_n, urv_v, ugb_v, Kg, Mg,
                                Rp, preg, cfg["pvtg_np"])
            ibmu_g = _jinterp2d(rv_ev, pg, pg_n, urv_v, ugbm_v, Kg, Mg,
                                Rp, preg, cfg["pvtg_np"])
        else:
            rv = zero
            inv_bg = _jinterp(pg, pg_n, invbg_v, Kg, False, Rp, preg)
            ibmu_g = _jinterp(pg, pg_n, ibmug_v, Kg, False, Rp, preg)
        ibmu_g = _jwhere(ibmu_g[0] > 1e-12, ibmu_g,
                         _jconst(1e-12 * one))
        mu_g = _jdiv(inv_bg, ibmu_g)

        krw = j_krw(sw)
        krow = j_krow(sw)
        krog = j_krog(sg)
        krg = j_krg(sg)

        # three-phase kro (ECLIPSE default model, satfunc.kro); the
        # degenerate denominator falls back to krow at connate water
        swn = _jmax0(_jsub(sw, _jplane(swco_c)))
        den = _jadd(sg, swn)
        ok = den[0] > 1e-12
        safe_den = (jnp.where(ok, den[0], 1.0), den[1])
        mixed = _jdiv(_jadd(_jmul(sg, krog), _jmul(swn, krow)), safe_den)
        krow_at_swco = j_krow(_jplane(swco_c))
        kro = _jwhere(ok, mixed, krow_at_swco)

        rho_w_s = selv(rho_ref, 0, Rd, preg)
        rho_o_s = selv(rho_ref, 1, Rd, preg)
        rho_g_s = selv(rho_ref, 2, Rd, preg)
        rho_w = _jmul(_jplane(rho_w_s), inv_bw)
        rho_o = _jmul(_jadd(_jplane(rho_o_s),
                            _jmul(_jplane(rho_g_s), rs)), inv_bo)
        if cfg.get("wetgas"):
            rho_g = _jmul(_jadd(_jplane(rho_g_s),
                                _jmul(_jplane(rho_o_s), rv)), inv_bg)
        else:
            rho_g = _jmul(_jplane(rho_g_s), inv_bg)

        mm = [mob_ref[0, i] for i in range(3)]
        mob_w = _jmul(_jdiv(krw, mu_w), _jconst(mm[0]))
        mob_o = _jmul(_jdiv(kro, mu_o), _jconst(mm[1]))
        mob_g = _jmul(_jdiv(krg, mu_g), _jconst(mm[2]))

        # pore volume with rock compaction; accumulation terms (rv = 0)
        r_pref = selv(rk_ref, 0, Rr, preg)
        r_comp = selv(rk_ref, 1, Rr, preg)
        xr = _jmul(_jplane(r_comp), _jsub(po, _jplane(r_pref)))
        pv = _jmul(_jconst(pv_ref[0, 0]),
                   _jadd(_jadd(_jconst(one), xr),
                         _jscale(0.5, _jmul(xr, xr))))
        aw = _jmul(pv, _jmul(sw, inv_bw))
        so_bo = _jmul(so, inv_bo)
        sg_bg = _jmul(sg, inv_bg)
        if cfg.get("wetgas"):
            # vaporized oil lives in the gas phase
            ao = _jmul(pv, _jadd(so_bo, _jmul(rv, sg_bg)))
        else:
            ao = _jmul(pv, so_bo)
        ag = _jmul(pv, _jadd(sg_bg, _jmul(rs, so_bo)))

        outs = [pw, po, pg, inv_bw, inv_bo, inv_bg, mob_w, mob_o, mob_g,
                rho_w, rho_o, rho_g, rs, rv, aw, ao, ag]
        for i, jet in enumerate(outs):
            q_ref[0, i] = jet[0]
            d = _d3(jet)
            for j in range(3):
                dq_ref[0, i, j] = d[j]

    return kernel


def _smem_spec(length: int, rank2: bool = False):
    # explicit block + i32 index map: the implicit full-array SMEM spec
    # emits i64 block indices under global x64, which Mosaic rejects
    # ("failed to legalize func.return"). ``rank2`` for 2-D grids.
    if rank2:
        return pl.BlockSpec((length,), lambda k, j: (k - k,),
                            memory_space=pltpu.SMEM)
    return pl.BlockSpec((length,), lambda k: (k - k,),
                        memory_space=pltpu.SMEM)


def cellpack_planes(fs, cells, u, flag, dims, interpret: bool = False):
    """Plane-layout Q [nz,17,ny,nx], dQ [nz,17,3,ny,nx] (f32) — feeds
    ops/pallas_flux.flux_bands without a layout round-trip.

    ``dims`` = (nz, ny, nx); cell ordering k-major like everywhere else.
    Multi-region SATNUM/PVTNUM decks ride region-flattened SMEM table
    banks with masked per-region interpolation; EPS decks add the
    12-channel end-point-scaling planes (props/eps.py layout).
    """
    nz, ny, nx = dims
    f32 = jnp.float32
    u4 = jnp.transpose(u.reshape(nz, ny, nx, 3).astype(f32), (0, 3, 1, 2))
    flag4 = flag.reshape(nz, 1, ny, nx).astype(jnp.int32)
    pv4 = cells.pore_vol_ref.reshape(nz, 1, ny, nx).astype(f32)
    mob4 = jnp.transpose(
        cells.mob_mult.reshape(nz, ny, nx, -1).astype(f32), (0, 3, 1, 2))
    sreg4 = cells.regs[:, 0].reshape(nz, 1, ny, nx).astype(jnp.int32)
    preg4 = cells.regs[:, 1].reshape(nz, 1, ny, nx).astype(jnp.int32)
    has_eps = cells.eps is not None
    eps_in = ()
    if has_eps:
        eps4 = jnp.transpose(
            cells.eps.reshape(nz, ny, nx, -1).astype(f32), (0, 3, 1, 2))
        eps_in = (eps4,)

    sat = fs.sat
    oil = fs.oil
    gas = fs.gas
    from opm_autodiff_tpu.props.pvt import WetGasPvt
    wet = isinstance(gas, WetGasPvt)
    # region-flattened banks [R*K]
    tables = [
        sat.sw, sat.krw_tab, sat.krow_tab, sat.pcow_tab,
        sat.sg, sat.krg_tab, sat.krog_tab, sat.pcog_tab,
        oil.p_sat, oil.rs_tab, oil.inv_b_sat, oil.inv_b_mu_sat,
        oil.usat_p, oil.usat_inv_b, oil.usat_inv_b_mu,
    ]
    if wet:
        tables += [gas.p, gas.rv_tab, gas.usat_rv, gas.usat_inv_b,
                   gas.usat_inv_b_mu]
    else:
        tables += [gas.p, gas.inv_b_tab, gas.inv_b_mu_tab]
    tables = [t.astype(f32).reshape(-1) for t in tables]
    cfg = {"swof": int(sat.sw.shape[1]), "sgof": int(sat.sg.shape[1]),
           "pvto": int(oil.p_sat.shape[1]), "pvdg": int(gas.p.shape[1]),
           "pvto_m": int(oil.usat_p.shape[2]),
           "pvto_nb": (tuple(int(x) for x in oil.usat_nb)
                       if oil.usat_nb is not None
                       else (int(oil.p_sat.shape[1]),)
                       * int(oil.p_sat.shape[0])),
           "R_sat": int(sat.sw.shape[0]),
           "R_pvt": int(oil.p_sat.shape[0]),
           "R_wat": int(fs.water.p_ref.shape[0]),
           "R_rock": int(fs.rock.p_ref.shape[0]),
           "R_rho": int(fs.rho_surf.shape[0]),
           "has_eps": has_eps,
           "wetgas": wet}
    if wet:
        cfg["pvtg_m"] = int(gas.usat_rv.shape[2])
        cfg["pvtg_np"] = tuple(int(x) for x in gas.usat_np)
    wsc = jnp.concatenate([
        fs.water.p_ref, fs.water.inv_b_ref, fs.water.comp,
        fs.water.mu_ref, fs.water.viscosibility]).astype(f32)
    rk = jnp.concatenate([fs.rock.p_ref, fs.rock.comp]).astype(f32)
    rho = fs.rho_surf.T.reshape(-1).astype(f32)  # [3*Rd] w then o then g
    ep = jnp.concatenate([
        sat.t_swl, sat.t_swcr, sat.t_swu, sat.t_sw0w,
        sat.t_sgcr, sat.t_sgu, sat.t_sg0g,
        sat.t_krw_mx, sat.t_kro_mx, sat.t_krg_mx, sat.swco,
    ]).astype(f32)

    kernel = _make_kernel(cfg)
    smem = [wsc, rk, rho, ep]
    # --- y-blocking: bound the kernel's scoped-VMEM live set. The body
    # is elementwise on (by, nx) tiles, so splitting y is transparent;
    # richer table machinery (wet-gas PVTG 2-D interpolation, EPS
    # channels, multi-region selects) means more live tile-sized
    # temporaries in the unrolled body. Measured point: the wet-gas +
    # EPS + 2-region body holds ~600 live lane-padded planes, which
    # blew the 16MB scoped-vmem limit on a full 56x46 plane (v5e).
    # Cap the estimated live set at ~8MB and keep full planes whenever
    # they fit (the lean SPE1-physics body measured fastest unblocked).
    live = 150 + (150 if has_eps else 0) + (300 if wet else 0) \
        + 50 * max(cfg["R_sat"], cfg["R_pvt"], 1)
    nx_pad = max(-(-nx // 128) * 128, 128)
    by_cap = max(int(8 * 1024 * 1024 / (live * nx_pad * 4)), 8)
    by = ny if ny <= by_cap else max((by_cap // 8) * 8, 8)
    env_by = os.environ.get("OPM_TPU_CELLPACK_BY")
    if env_by:
        by = min(int(env_by), ny)
    gy = -(-ny // by)

    def idx4(k, j):
        return (k, k - k, j, k - k)

    b_in = [
        pl.BlockSpec((1, 3, by, nx), idx4),
        pl.BlockSpec((1, 1, by, nx), idx4),
        pl.BlockSpec((1, 1, by, nx), idx4),
        pl.BlockSpec((1, mob4.shape[1], by, nx), idx4),
        pl.BlockSpec((1, 1, by, nx), idx4),
        pl.BlockSpec((1, 1, by, nx), idx4),
    ]
    if has_eps:
        b_in.append(pl.BlockSpec((1, eps4.shape[1], by, nx), idx4))
    b_in += [_smem_spec(int(t.shape[0]), rank2=True) for t in tables]
    b_in += [_smem_spec(int(a.shape[0]), rank2=True) for a in smem]
    q, dq = pl.pallas_call(
        kernel,
        grid=(nz, gy),
        in_specs=b_in,
        out_specs=[
            pl.BlockSpec((1, NQ, by, nx), idx4),
            pl.BlockSpec((1, NQ, 3, by, nx),
                         lambda k, j: (k, k - k, k - k, j, k - k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, NQ, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, NQ, 3, ny, nx), f32),
        ],
        interpret=interpret,
    )(u4, flag4, pv4, mob4, sreg4, preg4, *eps_in, *tables, *smem)
    return q, dq


def cellpack(fs, cells, u, flag, dims, interpret: bool = False):
    """Q [N,17], dQ [N,17,3] (f32) via the fused kernel."""
    nz, ny, nx = dims
    q, dq = cellpack_planes(fs, cells, u, flag, dims, interpret)
    Q = jnp.transpose(q, (0, 2, 3, 1)).reshape(nz * ny * nx, NQ)
    dQ = jnp.transpose(dq, (0, 3, 4, 1, 2)).reshape(nz * ny * nx, NQ, 3)
    return Q, dQ
