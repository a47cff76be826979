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

Scope (supports()): live-oil + dry-gas decks, single SATNUM/PVTNUM
region, no end-point scaling — the configuration of the SPE/Norne-class
benchmark path. Anything else falls back to the XLA vmap(jacfwd) path.
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
    """Static (trace-time) check for the fused fast path."""
    from opm_autodiff_tpu.props.pvt import DryGasPvt, LiveOilPvt

    if not isinstance(fs.oil, LiveOilPvt):
        return False
    if not isinstance(fs.gas, DryGasPvt):
        return False
    if cells.eps is not None:
        return False
    sat = fs.sat
    if sat.sw.shape[0] != 1 or sat.sg.shape[0] != 1:
        return False
    if fs.oil.p_sat.shape[0] != 1 or fs.gas.p.shape[0] != 1:
        return False
    if fs.water.p_ref.shape[0] != 1 or fs.rock.p_ref.shape[0] != 1:
        return False
    if fs.rho_surf.shape[0] != 1:
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


def _jinterp(x, nodes_ref, vals_ref, K, clamp_ends):
    """Piecewise-linear jet of a jet x through an SMEM table.

    ``K`` is the static node count; ``clamp_ends`` selects the
    extrapolate=False (end-clamped) semantics of props/tables.interp1d.
    """
    xv = x[0]
    n = [nodes_ref[k] for k in range(K)]
    v = [vals_ref[k] for k in range(K)]
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
    return (val, tuple(_dscale(dfdx, d) for d in x[1]))


def _d3(a):
    """Materialize the three derivative planes (zeros for None)."""
    z = jnp.zeros_like(a[0])
    return [a[1][i] if a[1][i] is not None else z for i in range(3)]


def _make_kernel(Ks: dict):
    """Build the kernel fn; table sizes are static."""

    def kernel(u_ref, flag_ref, pv_ref, mob_ref,
               sw_n, krw_v, krow_v, pcow_v,
               sg_n, krg_v, krog_v, pcog_v,
               psat_n, rs_v, invb_v, musat_v, slb_v, slm_v,
               pg_n, invbg_v, mug_v, scal_ref,
               q_ref, dq_ref):
        # scalar parameter order (SMEM): w_pref w_invb w_comp w_mu
        # w_visco r_pref r_comp rho_w rho_o rho_g swco krow_swco
        (w_pref, w_invb, w_comp, w_mu, w_visco, r_pref, r_comp,
         rho_w_s, rho_o_s, rho_g_s, swco_s, krow_swco) = [
            scal_ref[i] for i in range(12)]
        one = jnp.ones_like(u_ref[0, 0])
        po = (u_ref[0, 0], (one, None, None))
        sw = (u_ref[0, 1], (None, one, None))
        x3 = (u_ref[0, 2], (None, None, one))
        flag = flag_ref[0, 0]
        is_sg = flag == 0
        is_rs = flag == 1
        zero = _jconst(jnp.zeros_like(one))

        sg = _jwhere(is_sg, x3, zero)
        so = _jsub(_jsub(_jconst(one), sw), sg)

        Kp, Kg, Ksw, Ksg = Ks["pvto"], Ks["pvdg"], Ks["swof"], Ks["sgof"]
        # saturated Rs from pressure (linear extrapolation), >= 0,
        # capped by the DRSDT channel
        rs_sat = _jmax0(_jinterp(po, psat_n, rs_v, Kp, False))
        rs_sat = _jmin(rs_sat, mob_ref[0, 3])
        rs = _jwhere(is_rs, x3, rs_sat)

        pcow = _jinterp(sw, sw_n, pcow_v, Ksw, True)
        pcog = _jinterp(sg, sg_n, pcog_v, Ksg, True)
        pw = _jsub(po, pcow)
        pg = _jadd(po, pcog)

        # water PVT (PVTW second-order expansions)
        xw = _jscale(w_comp,
                     _jsub(pw, _jconst(w_pref * one)))
        inv_bw = _jscale(w_invb,
                         _jadd(_jadd(_jconst(one), xw),
                               _jscale(0.5, _jmul(xw, xw))))
        yw = _jscale(-w_visco,
                     _jsub(pw, _jconst(w_pref * one)))
        mu_w = _jdiv(_jconst(w_mu * one),
                     _jadd(_jadd(_jconst(one), yw),
                           _jscale(0.5, _jmul(yw, yw))))

        # live oil: bubble point from Rs, undersaturated slopes in Rs
        pb = _jinterp(rs, rs_v, psat_n, Kp, False)
        dp_us = _jmax0(_jsub(po, pb))
        inv_bo = _jadd(_jinterp(pb, psat_n, invb_v, Kp, False),
                       _jmul(_jinterp(rs, rs_v, slb_v, Kp, True), dp_us))
        mu_o = _jadd(_jinterp(pb, psat_n, musat_v, Kp, True),
                     _jmul(_jinterp(rs, rs_v, slm_v, Kp, True), dp_us))

        inv_bg = _jinterp(pg, pg_n, invbg_v, Kg, False)
        mu_g = _jinterp(pg, pg_n, mug_v, Kg, True)

        krw = _jmax0(_jinterp(sw, sw_n, krw_v, Ksw, True))
        krow = _jmax0(_jinterp(sw, sw_n, krow_v, Ksw, True))
        krog = _jmax0(_jinterp(sg, sg_n, krog_v, Ksg, True))
        krg = _jmax0(_jinterp(sg, sg_n, krg_v, Ksg, True))

        # three-phase kro (ECLIPSE default model, satfunc.kro)
        swn = _jmax0(_jsub(sw, _jconst(swco_s * one)))
        den = _jadd(sg, swn)
        ok = den[0] > 1e-12
        safe_den = (jnp.where(ok, den[0], 1.0), den[1])
        mixed = _jdiv(_jadd(_jmul(sg, krog), _jmul(swn, krow)), safe_den)
        kro = _jwhere(ok, mixed, _jconst(krow_swco * one))

        rho_w = _jscale(rho_w_s, inv_bw)
        rho_o = _jmul(_jadd(_jconst(rho_o_s * one),
                            _jscale(rho_g_s, rs)), inv_bo)
        rho_g = _jscale(rho_g_s, inv_bg)

        mm = [mob_ref[0, i] for i in range(3)]
        mob_w = _jmul(_jdiv(krw, mu_w), _jconst(mm[0]))
        mob_o = _jmul(_jdiv(kro, mu_o), _jconst(mm[1]))
        mob_g = _jmul(_jdiv(krg, mu_g), _jconst(mm[2]))

        # pore volume with rock compaction; accumulation terms (rv = 0)
        xr = _jscale(r_comp,
                     _jsub(po, _jconst(r_pref * one)))
        pv = _jmul(_jconst(pv_ref[0, 0]),
                   _jadd(_jadd(_jconst(one), xr),
                         _jscale(0.5, _jmul(xr, xr))))
        aw = _jmul(pv, _jmul(sw, inv_bw))
        so_bo = _jmul(so, inv_bo)
        ao = _jmul(pv, so_bo)
        ag = _jmul(pv, _jadd(_jmul(sg, inv_bg), _jmul(rs, so_bo)))

        outs = [pw, po, pg, inv_bw, inv_bo, inv_bg, mob_w, mob_o, mob_g,
                rho_w, rho_o, rho_g, rs, zero, aw, ao, ag]
        for i, jet in enumerate(outs):
            q_ref[0, i] = jet[0]
            d = _d3(jet)
            for j in range(3):
                dq_ref[0, i, j] = d[j]

    return kernel


def _smem_spec(length: int):
    # explicit block + i32 index map: the implicit full-array SMEM spec
    # emits i64 block indices under global x64, which Mosaic rejects
    # ("failed to legalize func.return")
    return pl.BlockSpec((length,), lambda k: (k - k,),
                        memory_space=pltpu.SMEM)


def cellpack_planes(fs, cells, u, flag, dims, interpret: bool = False):
    """Plane-layout Q [nz,17,ny,nx], dQ [nz,17,3,ny,nx] (f32) — feeds
    ops/pallas_flux.flux_bands without a layout round-trip.

    ``dims`` = (nz, ny, nx); cell ordering k-major like everywhere else.
    """
    nz, ny, nx = dims
    f32 = jnp.float32
    u4 = jnp.transpose(u.reshape(nz, ny, nx, 3).astype(f32), (0, 3, 1, 2))
    flag4 = flag.reshape(nz, 1, ny, nx).astype(jnp.int32)
    pv4 = cells.pore_vol_ref.reshape(nz, 1, ny, nx).astype(f32)
    mob4 = jnp.transpose(
        cells.mob_mult.reshape(nz, ny, nx, -1).astype(f32), (0, 3, 1, 2))

    sat = fs.sat
    oil = fs.oil
    gas = fs.gas
    tables = [
        sat.sw[0], sat.krw_tab[0], sat.krow_tab[0], sat.pcow_tab[0],
        sat.sg[0], sat.krg_tab[0], sat.krog_tab[0], sat.pcog_tab[0],
        oil.p_sat[0], oil.rs_tab[0], oil.inv_b_sat[0], oil.mu_sat[0],
        oil.slope_inv_b[0], oil.slope_mu[0],
        gas.p[0], gas.inv_b_tab[0], gas.mu_tab[0],
    ]
    tables = [t.astype(f32) for t in tables]
    Ks = {"swof": int(sat.sw.shape[1]), "sgof": int(sat.sg.shape[1]),
          "pvto": int(oil.p_sat.shape[1]), "pvdg": int(gas.p.shape[1])}
    scal_arr = jnp.stack([
        fs.water.p_ref[0], fs.water.inv_b_ref[0], fs.water.comp[0],
        fs.water.mu_ref[0], fs.water.viscosibility[0],
        fs.rock.p_ref[0], fs.rock.comp[0],
        fs.rho_surf[0, 0], fs.rho_surf[0, 1], fs.rho_surf[0, 2],
        sat.swco[0], sat.krow(sat.swco[0], 0),
    ]).astype(f32)

    kernel = _make_kernel(Ks)
    b_in = [
        pl.BlockSpec((1, 3, ny, nx), lambda k: (k, k - k, k - k, k - k)),
        pl.BlockSpec((1, 1, ny, nx), lambda k: (k, k - k, k - k, k - k)),
        pl.BlockSpec((1, 1, ny, nx), lambda k: (k, k - k, k - k, k - k)),
        pl.BlockSpec((1, mob4.shape[1], ny, nx),
                     lambda k: (k, k - k, k - k, k - k)),
    ] + [_smem_spec(int(t.shape[0])) for t in tables] + [_smem_spec(12)]
    q, dq = pl.pallas_call(
        kernel,
        grid=(nz,),
        in_specs=b_in,
        out_specs=[
            pl.BlockSpec((1, NQ, ny, nx), lambda k: (k, k - k, k - k, k - k)),
            pl.BlockSpec((1, NQ, 3, ny, nx),
                         lambda k: (k, k - k, k - k, k - k, k - k)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nz, NQ, ny, nx), f32),
            jax.ShapeDtypeStruct((nz, NQ, 3, ny, nx), f32),
        ],
        interpret=interpret,
    )(u4, flag4, pv4, mob4, *tables, scal_arr)
    return q, dq


def cellpack(fs, cells, u, flag, dims, interpret: bool = False):
    """Q [N,17], dQ [N,17,3] (f32) via the fused kernel."""
    nz, ny, nx = dims
    q, dq = cellpack_planes(fs, cells, u, flag, dims, interpret)
    Q = jnp.transpose(q, (0, 2, 3, 1)).reshape(nz * ny * nx, NQ)
    dQ = jnp.transpose(dq, (0, 3, 4, 1, 2)).reshape(nz * ny * nx, NQ, 3)
    return Q, dQ
