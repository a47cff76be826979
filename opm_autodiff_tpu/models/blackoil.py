"""Black-oil model: primary variables, intensive quantities, accumulation, flux.

Rebuild of opm-models' BlackOilModel equations + EclTransFluxModule
(reference: ebos/eclfluxmodule.hh:212 ``calculateGradients_``) in scalar
per-cell / per-face functions designed to be ``vmap``-batched and
``jacfwd``-differentiated (replacing the ``Evaluation<double, 3>`` forward
AD type, reference: opm-material; SURVEY.md §2.9#3).

Primary variables per cell (opm-models' variable-switching scheme):
  u = (po, sw, x3) with a per-cell meaning flag:
    flag == FLAG_SG: x3 = Sg   (oil+gas present; Rs=RsSat(po), Rv=RvSat)
    flag == FLAG_RS: x3 = Rs   (no free gas; Sg = 0, oil undersaturated)
    flag == FLAG_RV: x3 = Rv   (no oil; Sg = 1-Sw, gas undersaturated —
                                the VAPOIL/condensate state)
The flag is *data*, not control flow — all property evaluations are masked
arithmetic so a single trace covers both states (SURVEY.md §7 hard part 2).

Phase ordering: WATER=0, OIL=1, GAS=2 (matches reference BlackoilPhases).
Equation ordering matches: R[0]=water, R[1]=oil, R[2]=gas, in surface m^3/s.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.props.fluid import FluidSystem

FLAG_SG = 0  # x3 means Sg
FLAG_RS = 1  # x3 means Rs
FLAG_RV = 2  # x3 means Rv (VAPOIL decks only)

NUM_EQ = 3


class PrimaryState(NamedTuple):
    """Dynamic per-cell state (the Newton unknowns + meaning flags)."""

    u: jnp.ndarray     # [N,3]: po [Pa], sw, x3
    flag: jnp.ndarray  # [N] int32


class CellStatic(NamedTuple):
    """Per-cell static data (pytree of [N] arrays)."""

    pore_vol_ref: jnp.ndarray
    depth: jnp.ndarray
    # [N,2] int32 zero-based property regions: col 0 = SATNUM, col 1 = PVTNUM
    regs: jnp.ndarray
    # [N,5] dynamic per-cell channels: [0:3] phase mobility multipliers
    # (polymer/brine/foam/thermal feedback; reference: opm-models
    # blackoil*modules), [3] Rs cap, [4] Rv cap (DRSDT/DRVDT composition
    # change limits, eclproblem.hh:2010). Defaults [1,1,1,inf,inf].
    mob_mult: jnp.ndarray
    # [N,12] end-point-scaling channels (props/eps.py) or None when the
    # deck has no EPS keywords (the scaled-table code then traces away)
    eps: jnp.ndarray | None = None


class FaceStatic(NamedTuple):
    """Per-face static data ([F] arrays, compressed active indices)."""

    left: jnp.ndarray
    right: jnp.ndarray
    trans: jnp.ndarray
    # gravity potential difference factor: g * (depth_L - depth_R)
    gdz: jnp.ndarray
    thpres: jnp.ndarray  # [F] threshold pressure deadband (Pa)
    # ELL (fixed-degree) cell->face adjacency for gather-only assembly
    # and SpMV on TPU (scatter-adds lower to slow serialized updates;
    # gathers vectorize). Padded slots point at face index F (a zero
    # dummy row appended at use time). None when the degree is
    # pathological (models/blackoil.build_ell) — scatters then remain.
    ell_face: jnp.ndarray | None = None  # [N,D] int32 face id (F = pad)
    ell_nbr: jnp.ndarray | None = None   # [N,D] int32 neighbor cell
    ell_left: jnp.ndarray | None = None  # [N,D] bool: cell is face's L


class Intensive(NamedTuple):
    """Per-cell quantities needed by flux and accumulation (scalars here;
    batched via vmap)."""

    p: jnp.ndarray       # [3] phase pressures (water, oil, gas)
    inv_b: jnp.ndarray   # [3] inverse FVF
    mob: jnp.ndarray     # [3] kr / mu  [1/(Pa s)]
    rho: jnp.ndarray     # [3] mass densities at reservoir conditions
    rs: jnp.ndarray      # dissolved GOR
    rv: jnp.ndarray      # vaporized OGR (0 for dry-gas decks)
    sat: jnp.ndarray     # [3] saturations


REG0 = (0, 0)  # default region pair (satnum, pvtnum) — static zeros


def intensive(fs: FluidSystem, u, flag, regs=REG0, mob_mult=None,
              eps=None) -> Intensive:
    """Scalar per-cell intensive quantities; differentiable in u.

    ``regs`` is the (satnum, pvtnum) pair — a length-2 int vector or the
    static default REG0. ``mob_mult`` [5] carries the dynamic per-cell
    channels ([0:3] phase mobility multipliers from the extended
    components, [3]/[4] the DRSDT/DRVDT Rs/Rv caps; None = neutral).
    ``eps`` [12] carries the cell's end-point-scaling channels
    (props/eps.py; None = unscaled)."""
    sr, pr = regs[0], regs[1]
    po, sw, x3 = u[0], u[1], u[2]
    is_sg = flag == FLAG_SG
    is_rv = flag == FLAG_RV
    sg = jnp.where(is_sg, x3, jnp.where(is_rv, 1.0 - sw, 0.0))
    so = 1.0 - sw - sg
    rs_sat_eff = fs.rs_sat(po, pr)
    if mob_mult is not None:
        rs_sat_eff = jnp.minimum(rs_sat_eff, mob_mult[3])
    rs = jnp.where(flag == FLAG_RS, x3, rs_sat_eff)

    pw = po - fs.sat.pcow(sw, sr, eps)
    pg = po + fs.sat.pcog(sg, sr, eps)
    # vaporized oil: saturated where free oil coexists with gas; the
    # primary variable in the no-oil (condensate) state
    rv_sat_eff = fs.rv_sat(pg, pr)
    if mob_mult is not None:
        rv_sat_eff = jnp.minimum(rv_sat_eff, mob_mult[4])
    rv = jnp.where(is_rv, x3, rv_sat_eff)

    inv_bw = fs.water.inv_b(pw, pr)
    inv_bo = fs.oil_inv_b(po, rs, pr)
    inv_bg = fs.gas_inv_b(pg, rv, pr)

    mu_w = fs.water.viscosity(pw, pr)
    mu_o = fs.oil_viscosity(po, rs, pr)
    mu_g = fs.gas_viscosity(pg, rv, pr)

    krw = fs.sat.krw(sw, sr, eps)
    kro = fs.sat.kro(sw, sg, sr, eps)
    krg = fs.sat.krg(sg, sr, eps)

    rho = fs.rho_ref(pr)
    rho_w = rho[0] * inv_bw
    rho_o = (rho[1] + rs * rho[2]) * inv_bo
    rho_g = (rho[2] + rv * rho[1]) * inv_bg

    mob = jnp.stack([krw / mu_w, kro / mu_o, krg / mu_g])
    if mob_mult is not None:
        mob = mob * mob_mult[:3]
    return Intensive(
        p=jnp.stack([pw, po, pg]),
        inv_b=jnp.stack([inv_bw, inv_bo, inv_bg]),
        mob=mob,
        rho=jnp.stack([rho_w, rho_o, rho_g]),
        rs=rs,
        rv=rv,
        sat=jnp.stack([sw, so, sg]),
    )


def accumulation(fs: FluidSystem, u, flag, pore_vol_ref, regs=REG0,
                 eps=None):
    """Per-cell conserved surface volumes [3] (water, oil, gas)."""
    q = intensive(fs, u, flag, regs, None, eps)
    pv = pore_vol_ref * fs.rock.mult(u[0], regs[1])
    sw, so, sg = q.sat[0], q.sat[1], q.sat[2]
    aw = pv * sw * q.inv_b[0]
    # vaporized oil lives in the gas phase; dissolved gas in the oil
    ao = pv * (so * q.inv_b[1] + q.rv * sg * q.inv_b[2])
    ag = pv * (sg * q.inv_b[2] + q.rs * so * q.inv_b[1])
    return jnp.stack([aw, ao, ag])


def face_flux(fs: FluidSystem, uL, uR, flagL, flagR, trans, gdz,
              regsL=REG0, regsR=REG0, thpres=0.0, mobL=None, mobR=None,
              epsL=None, epsR=None):
    """TPFA upwinded phase flux through one face, positive L -> R.

    Semantics follow EclTransFluxModule::calculateGradients_
    (ebos/eclfluxmodule.hh:212-356): gravity-corrected phase potential
    difference with arithmetically-averaged density, deterministic upwind
    (ties resolve to the left cell), flux in *surface* volumes with the
    dissolved-gas term Rs*F_o added to the gas equation. Threshold-pressure
    deadband is a later-round feature.

    Returns [3]: water, oil, gas surface-volume fluxes [m^3/s].
    """
    qL = intensive(fs, uL, flagL, regsL, mobL, epsL)
    qR = intensive(fs, uR, flagR, regsR, mobR, epsR)

    # phase potential difference: dPhi_p = (pL - pR) - rho_avg * g * dz
    # (gdz = g*(depth_L - depth_R); depth positive down)
    rho_avg = 0.5 * (qL.rho + qR.rho)
    dphi = (qL.p - qR.p) - rho_avg * gdz  # [3]
    # THPRES deadband (eclfluxmodule.hh:327-337): flow requires the
    # potential difference to exceed the region-pair threshold; the
    # effective driving force is reduced by it. Kept an exact identity
    # (value AND derivative) where no threshold applies.
    dphi = jnp.where(thpres > 0.0,
                     jnp.sign(dphi) * jnp.maximum(jnp.abs(dphi) - thpres,
                                                  0.0),
                     dphi)

    upwind_L = dphi >= 0.0

    mob_up = jnp.where(upwind_L, qL.mob, qR.mob)
    inv_b_up = jnp.where(upwind_L, qL.inv_b, qR.inv_b)
    rs_up = jnp.where(upwind_L[1], qL.rs, qR.rs)  # follows the oil phase
    rv_up = jnp.where(upwind_L[2], qL.rv, qR.rv)  # follows the gas phase

    vol_flux = trans * mob_up * dphi          # reservoir-volume flux [3]
    surf_flux = inv_b_up * vol_flux           # surface-volume flux [3]

    # dissolved gas rides with the oil phase; vaporized oil with gas
    gas_total = surf_flux[2] + rs_up * surf_flux[1]
    oil_total = surf_flux[1] + rv_up * surf_flux[2]
    return jnp.stack([surf_flux[0], oil_total, gas_total])


def build_ell(left: np.ndarray, right: np.ndarray, n_cells: int,
              max_degree: int = 16):
    """Fixed-degree cell->face adjacency (ELL layout) from a face list.

    Returns (ell_face [N,D], ell_nbr [N,D], ell_left [N,D]) with padded
    slots pointing at face index F, or (None, None, None) when the max
    degree exceeds ``max_degree`` (pathologically connected grids keep
    the scatter path). Vectorized CSR->ELL construction.
    """
    f = len(left)
    rows = np.concatenate([left, right])
    nbrs = np.concatenate([right, left])
    is_left = np.concatenate([np.ones(f, bool), np.zeros(f, bool)])
    face_id = np.concatenate([np.arange(f), np.arange(f)])
    order = np.argsort(rows, kind="stable")
    rows_s = rows[order]
    counts = np.bincount(rows_s, minlength=n_cells)
    d = int(counts.max()) if f else 0
    if d > max_degree:
        return None, None, None
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(2 * f) - starts[rows_s]
    ell_face = np.full((n_cells, max(d, 1)), f, np.int32)
    ell_nbr = np.zeros((n_cells, max(d, 1)), np.int32)
    ell_left = np.zeros((n_cells, max(d, 1)), bool)
    ell_face[rows_s, slot] = face_id[order]
    ell_nbr[rows_s, slot] = nbrs[order]
    ell_left[rows_s, slot] = is_left[order]
    return ell_face, ell_nbr, ell_left


def gravity_constant() -> float:
    return U.GRAVITY


def statics_from_geometry(geo, structured: str = "auto",
                          pad_nz_to: int | None = None
                          ) -> tuple[CellStatic, "FaceStatic"]:
    """Device-ready static pytrees from host Geometry.

    ``structured='auto'`` returns the banded StructuredTopology when the
    grid is fully-active cartesian (the TPU fast path: no gathers);
    'never' forces the general face list; 'always' asserts it.
    ``pad_nz_to`` pads the banded box with inactive z layers (embedded
    path) so z-slab sharding works when nz % n_devices != 0.
    """
    satnum = getattr(geo, "satnum", None)
    if satnum is None:
        satnum = np.zeros(geo.num_active, np.int32)
    pvtnum = getattr(geo, "pvtnum", None)
    if pvtnum is None:
        pvtnum = np.zeros(geo.num_active, np.int32)
    cells = CellStatic(
        pore_vol_ref=jnp.asarray(geo.pore_vol),
        depth=jnp.asarray(geo.depth),
        regs=jnp.asarray(np.stack([satnum, pvtnum], axis=1), jnp.int32),
        mob_mult=jnp.tile(jnp.asarray([1.0, 1.0, 1.0, np.inf, np.inf]),
                          (geo.num_active, 1)),
        eps=None,
    )
    if structured != "never":
        from opm_autodiff_tpu.models.structured import (
            embedded_ok, structured_ok, topology_from_geometry,
            topology_from_geometry_embedded)

        needs_pad = (pad_nz_to is not None
                     and pad_nz_to != geo.cartdims[2])
        if structured_ok(geo) and not needs_pad:
            return cells, topology_from_geometry(geo)
        if embedded_ok(geo) or (structured_ok(geo) and needs_pad):
            # inactive cells (or z padding): embed into the full box
            # with identity rows
            return cells, topology_from_geometry_embedded(
                geo, nz_pad=pad_nz_to)
        if structured == "always":
            raise ValueError("grid is not banded-representable")
    f = geo.faces
    thp = (f.thpres if getattr(f, "thpres", None) is not None
           else np.zeros(len(f.left)))
    ef, en, el = build_ell(np.asarray(f.left), np.asarray(f.right),
                           geo.num_active)
    faces = FaceStatic(
        left=jnp.asarray(f.left),
        right=jnp.asarray(f.right),
        trans=jnp.asarray(f.trans),
        gdz=jnp.asarray(U.GRAVITY * (geo.depth[f.left] - geo.depth[f.right])),
        thpres=jnp.asarray(thp),
        ell_face=None if ef is None else jnp.asarray(ef),
        ell_nbr=None if en is None else jnp.asarray(en),
        ell_left=None if el is None else jnp.asarray(el),
    )
    return cells, faces
