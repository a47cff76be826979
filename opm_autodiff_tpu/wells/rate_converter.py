"""Surface-rate <-> reservoir-voidage conversion (RESV controls).

Rebuild of the reference's ``RateConverter::SurfaceToReservoirVoidage``
(opm/simulators/wells/RateConverter.hpp:406: ``defineState`` :433 computes
per-FIPNUM-region hydrocarbon-PV-weighted average pressure/Rs, ``calcCoeff``
:592 turns them into per-phase coefficients). Runs host-side on tiny data
(one row per FIPNUM region) once per substep — the reference likewise
recomputes at step start.

With Rv == 0 (no vaporized oil yet) the conversion of surface rates
q = (qw, qo, qg) into reservoir voidage is

    V = Bw*qw + (Bo - Rs*Bg)*qo + Bg*qg

(the free-gas surface stream is qg - Rs*qo; dissolved gas travels inside
the reservoir-oil volume Bo*qo).
"""

from __future__ import annotations

import numpy as np


def region_averages(u, flag, pore_vol, sat_oil, sat_gas, fipnum, nreg,
                    rs_cells):
    """Hydrocarbon-PV-weighted average (p, Rs) per FIPNUM region.

    All inputs are host numpy arrays; ``rs_cells`` is the per-cell Rs
    (saturated value in SG cells, the primary variable in RS cells).
    """
    po = u[:, 0]
    hc = pore_vol * np.maximum(sat_oil + sat_gas, 1e-12)
    p_avg = np.zeros(nreg)
    rs_avg = np.zeros(nreg)
    for r in range(nreg):
        m = fipnum == r
        w = hc[m]
        tot = w.sum()
        if tot <= 0.0:
            # fall back to plain PV weights (pure-water region)
            w = pore_vol[m]
            tot = max(w.sum(), 1e-300)
        p_avg[r] = float((po[m] * w).sum() / tot)
        rs_avg[r] = float((rs_cells[m] * w).sum() / tot)
    return p_avg, rs_avg


def voidage_coefficients(fs, p_avg, rs_avg):
    """[nreg, 3] coefficients from region-average (p, Rs).

    Reference: RateConverter::calcCoeff (RateConverter.hpp:592), Rv = 0.
    """
    nreg = len(p_avg)
    out = np.ones((nreg, 3))
    for r in range(nreg):
        p = float(p_avg[r])
        rs = float(rs_avg[r])
        bw = float(fs.water.inv_b(p))
        bo = float(fs.oil_inv_b(p, rs))
        bg = float(fs.gas_inv_b(p, rs * 0.0))
        big_bw = 1.0 / max(bw, 1e-30)
        big_bo = 1.0 / max(bo, 1e-30)
        big_bg = 1.0 / max(bg, 1e-30)
        out[r, 0] = big_bw
        out[r, 1] = max(big_bo - rs * big_bg, 1e-12)
        out[r, 2] = big_bg
    return out


def well_voidage_coefficients(fs, u, flag, pore_vol, fipnum, well_cell0,
                              rs_cells, sat_oil, sat_gas):
    """Per-well [W,3] coefficients: each well uses the averages of the
    FIPNUM region holding its first perforation (reference wells use
    their `fipreg` the same way, RateConverter.hpp:592)."""
    u = np.asarray(u)
    flag = np.asarray(flag)
    fipnum = np.asarray(fipnum)
    nreg = int(fipnum.max()) + 1 if fipnum.size else 1
    p_avg, rs_avg = region_averages(u, flag, np.asarray(pore_vol),
                                    np.asarray(sat_oil),
                                    np.asarray(sat_gas), fipnum, nreg,
                                    np.asarray(rs_cells))
    coeffs = voidage_coefficients(fs, p_avg, rs_avg)
    wreg = fipnum[np.asarray(well_cell0)]
    return coeffs[wreg]
