"""Synthetic SPE1-style decks at arbitrary grid sizes.

Used by bench.py (scaled-up performance runs) and the multi-chip dry run
(tiny shapes). Physics identical to the SPE1 fixture (published Odeh 1981
data); only DIMENS and well placement scale.
"""

from __future__ import annotations

import io


def spe1_deck_text(nx: int = 10, ny: int = 10, nz: int = 3,
                   tstep_days: str = "1 2 3 4 5 10 10 15 25 25") -> str:
    n = nx * ny * nz
    nxy = nx * ny

    def layer_vals(vals):
        per = []
        reps = [nz // 3 + (1 if i < nz % 3 else 0) for i in range(3)]
        for v, r in zip(vals, reps):
            if r:
                per.append(f"{nxy * r}*{v}")
        return " ".join(per)

    dz_total = 100.0  # keep column height fixed as nz scales
    dz = dz_total / nz

    return f"""RUNSPEC
TITLE
 SPE1 scaled {nx}x{ny}x{nz}
DIMENS
 {nx} {ny} {nz} /
OIL
GAS
WATER
DISGAS
FIELD
EQLDIMS
 1 100 10 1 1 /
TABDIMS
 1 1 40 40 1 40 /
WELLDIMS
 2 {nz} 1 2 /
START
 1 'JAN' 2015 /
GRID
DX
 {n}*{10000.0 / nx} /
DY
 {n}*{10000.0 / ny} /
DZ
 {n}*{dz} /
TOPS
 {nxy}*8325 /
PORO
 {n}*0.3 /
PERMX
 {layer_vals([500, 50, 200])} /
PERMY
 {layer_vals([500, 50, 200])} /
PERMZ
 {layer_vals([50, 50, 25])} /
PROPS
PVTW
 4014.7 1.029 3.13E-6 0.31 0 /
ROCK
 14.7 3E-6 /
SWOF
 0.12    0      1      0
 1.0     0.00001 0     0 /
SGOF
 0       0      1      0
 0.001   0      1      0
 0.02    0      0.997  0
 0.05    0.005  0.980  0
 0.12    0.025  0.700  0
 0.2     0.075  0.350  0
 0.25    0.125  0.200  0
 0.3     0.190  0.090  0
 0.4     0.410  0.021  0
 0.45    0.60   0.010  0
 0.5     0.72   0.001  0
 0.6     0.87   0.0001 0
 0.7     0.94   0.000  0
 0.85    0.98   0.000  0
 1.0     1.0    0.000  0 /
DENSITY
 49.1 64.79 0.06054 /
PVDG
 14.7     166.666   0.008
 264.7    12.093    0.0096
 514.7    6.274     0.0112
 1014.7   3.197     0.014
 2014.7   1.614     0.0189
 2514.7   1.294     0.0208
 3014.7   1.080     0.0228
 4014.7   0.811     0.0268
 5014.7   0.649     0.0309
 9014.7   0.386     0.047 /
PVTO
 0.001    14.7    1.062     1.04 /
 0.0905   264.7   1.15      0.975 /
 0.18     514.7   1.207     0.91 /
 0.371    1014.7  1.295     0.83 /
 0.636    2014.7  1.435     0.695 /
 0.775    2514.7  1.5       0.641 /
 0.93     3014.7  1.565     0.594 /
 1.270    4014.7  1.695     0.51
          5014.7  1.671     0.549
          9014.7  1.579     0.74 /
 1.618    5014.7  1.827     0.449
          9014.7  1.726     0.605 /
 2.984    9014.7  2.357     0.203 /
/
SOLUTION
EQUIL
 8400 4800 8500 0 8200 0 1 0 0 /
RSVD
 8200 1.270
 8500 1.270 /
SUMMARY
FOPR
FGOR
SCHEDULE
WELSPECS
 'PROD' 'G1' {nx} {ny} 8400 'OIL' /
 'INJ'  'G1' 1  1  8335 'GAS' /
/
COMPDAT
 'PROD' {nx} {ny} {nz} {nz} 'OPEN' 1* 1* 0.5 /
 'INJ'  1  1  1 1 'OPEN' 1* 1* 0.5 /
/
WCONPROD
 'PROD' 'OPEN' 'ORAT' 20000 4* 1000 /
/
WCONINJE
 'INJ' 'GAS' 'OPEN' 'RATE' 100000 1* 9014 /
/
TSTEP
 {tstep_days} /
END
"""


def write_spe1_deck(path: str, nx: int = 10, ny: int = 10, nz: int = 3,
                    **kw) -> str:
    with open(path, "w") as f:
        f.write(spe1_deck_text(nx, ny, nz, **kw))
    return path


# ---------------------------------------------------------------------------
# Norne-class deck: the BENCH "north-star layout" configuration
# ---------------------------------------------------------------------------

NORNE_PVT_PATH = "/root/reference/tests/norne_pvt.data"


def coord_zcorn_text(nx: int, ny: int, nz: int, dx: float, dy: float,
                     layer_tops, layer_bots, dip_per_i: float = 0.0,
                     fault_after_i: int | None = None,
                     fault_throw: float = 0.0) -> str:
    """COORD/ZCORN for a box grid with optional dip and a stair-case
    fault (vectorized; the test-suite helper is the readable twin)."""
    import numpy as np

    xs = np.arange(nx + 1) * dx
    ys = np.arange(ny + 1) * dy
    coord = np.empty(((ny + 1) * (nx + 1), 6))
    gx, gy = np.meshgrid(xs, ys)  # [ny+1, nx+1]
    coord[:, 0] = coord[:, 3] = gx.reshape(-1)
    coord[:, 1] = coord[:, 4] = gy.reshape(-1)
    coord[:, 2] = 0.0
    coord[:, 5] = 10000.0

    tops = np.asarray(layer_tops)
    bots = np.asarray(layer_bots)
    i_cell = np.arange(nx)                       # [nx]
    # corner z per (k, top/bot, j, jj, i, ii)
    zc = np.empty((nz, 2, ny, 2, nx, 2))
    for k in range(nz):
        for t, zk in ((0, tops[k]), (1, bots[k])):
            base = zk + dip_per_i * (i_cell[None, :] + np.array([[0], [1]])
                                     ).T * dx  # [nx,2] per (i, ii)
            if fault_after_i is not None:
                base = base + np.where(i_cell[:, None] > fault_after_i,
                                       fault_throw, 0.0)
            zc[k, t] = np.broadcast_to(base[None, None], (ny, 2, nx, 2))
    vals = zc.reshape(-1)
    body = "\n".join(" " + " ".join(f"{v:.6g}" for v in vals[s:s + 12])
                     for s in range(0, len(vals), 12))
    lines = ["COORD"]
    lines += [" " + " ".join(f"{v:g}" for v in row) for row in coord]
    lines += ["/", "ZCORN", body, "/"]
    return "\n".join(lines) + "\n"


def _field_actnum(nx: int, ny: int, nz: int, frac: float = 0.39,
                  seed: int = 11):
    """Real-field ACTNUM footprint: an elongated diagonal ellipse in
    (i,j) that shrinks toward the top/bottom layers (pinch-outs), tuned
    to ``frac`` total active fraction — the real Norne field is
    46x112x22 with ~39% active (reference:
    eclgenericcpgridvanguard.cc:91 partitions by ACTIVE cells precisely
    because dense-box padding is this expensive). Returns (act [n] int,
    well_ij) with the wells placed along the field's major axis."""
    import numpy as np

    jj, ii = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    x = (ii + 0.5) / nx - 0.5
    y = (jj + 0.5) / ny - 0.5
    th = np.deg2rad(25.0)
    u = x * np.cos(th) + y * np.sin(th)
    v = -x * np.sin(th) + y * np.cos(th)
    kk = np.arange(nz)
    ctr = (nz - 1) / 2.0
    shrink = 1.0 - 0.28 * ((kk - ctr) / max(ctr, 1.0)) ** 2  # [nz]
    mean_s2 = float(np.mean(shrink**2))
    # ellipse area pi*a*b in normalized units; solve a for the target
    b = 0.62
    # 4% interior speckle removed below -> aim slightly high
    a = (frac / 0.96) / (np.pi * b * mean_s2)
    rng = np.random.default_rng(seed)
    act = np.zeros((nz, ny, nx), int)
    for k in range(nz):
        s = shrink[k]
        inside = (u / (a * s)) ** 2 + (v / (b * s)) ** 2 <= 1.0
        act[k] = inside.astype(int)
    # speckle: a little interior dead rock like the random-8% mode
    dead = rng.random(act.shape) < 0.04
    act[dead & (act == 1)] = 0
    # wells along the major (v/b) axis at fractional stations
    wij = []
    for t in (-0.55, -0.18, 0.2, 0.55):
        uw, vw = 0.0, t * b * 0.8
        xw = uw * np.cos(th) - vw * np.sin(th)
        yw = uw * np.sin(th) + vw * np.cos(th)
        wi = int(np.clip(round((xw + 0.5) * nx - 0.5), 1, nx - 2))
        wjj = int(np.clip(round((yw + 0.5) * ny - 0.5), 1, ny - 2))
        wij.append((wi, wjj))
    flat = act.reshape(-1)
    nxy = nx * ny
    for (wi, wj) in wij:
        flat[wj * nx + wi:: nxy] = 1  # keep well columns alive
    return flat, wij


def norne_class_deck_text(nx: int = 46, ny: int = 56, nz: int = 22,
                          pvt_path: str = NORNE_PVT_PATH,
                          tstep_days: str = "1 5 10",
                          perm_range: tuple | None = None,
                          fault: bool = True,
                          field_frac: float | None = None) -> str:
    """A scalable deck with the Norne regression family's characteristic
    feature set (reference: jenkins run-norne.sh + test_norne_pvt.cpp):
    corner-point geometry with dip and a stair-case fault, ~8% ACTNUM
    inactive cells, two SATNUM/PVTNUM regions, end-point scaling (SWL),
    NTG, heterogeneous layered permeability, the REAL Norne live-oil
    PVTO + wet-gas PVTG tables (read from ``pvt_path`` at call time —
    Open Database License data, never vendored), and DISGAS+VAPOIL
    equilibration against RSVD/RVVD. Raises FileNotFoundError when the
    Norne PVT fixture is unavailable."""
    import numpy as np

    pvt = open(pvt_path).read()
    pvt = pvt[pvt.index("DENSITY"):]

    n = nx * ny * nz
    nxy = nx * ny
    dz = 15.0
    tops = [2550.0 + dz * k for k in range(nz)]
    bots = [t + dz for t in tops]
    grid = coord_zcorn_text(nx, ny, nz, 100.0, 100.0, tops, bots,
                            dip_per_i=0.02,
                            fault_after_i=(nx // 2 - 1) if fault else None,
                            fault_throw=0.5 * dz if fault else 0.0)

    if field_frac is not None:
        # real-field footprint (~field_frac active) with axis wells
        act, wij = _field_actnum(nx, ny, nz, frac=field_frac)
    else:
        # deterministic ~8% inactive, keeping the well columns alive
        rng = np.random.default_rng(42)
        act = np.ones(n, int)
        dead = rng.choice(n, size=n // 12, replace=False)
        act[dead] = 0
        wij = _norne_well_ij(nx, ny)
        for (wi, wj) in wij:
            col = wj * nx + wi
            act[col::nxy] = 1

    half = nz // 2

    def layered(vals_top, vals_bot):
        """Cycle values over layers: top half from vals_top etc."""
        out = []
        for k in range(nz):
            src = vals_top if k < half else vals_bot
            out.append(f"{nxy}*{src[k % len(src)]}")
        return " ".join(out)

    satnum = " ".join(f"{nxy}*{1 if k < half else 2}" for k in range(nz))
    if perm_range is not None:
        # per-cell log-uniform permeability (fp32-robustness probes:
        # VERDICT r2 weak #6 asks for >=1e4 contrast at ~1e5 cells)
        lo, hi = perm_range
        kx = np.exp(rng.uniform(np.log(lo), np.log(hi), size=n))
        permx = " ".join(f"{v:.5g}" for v in kx)
        permz = " ".join(f"{0.1 * v:.5g}" for v in kx)
    else:
        permx = layered([800, 400, 100, 600], [50, 300, 150, 20])
        permz = layered([80, 40, 10, 60], [5, 30, 15, 2])
    poro = layered([0.28, 0.25, 0.20, 0.27], [0.15, 0.22, 0.18, 0.12])
    swl = layered([0.12], [0.18])

    wells = _norne_wells_text(nx, ny, nz, wij=wij)
    return f"""RUNSPEC
TITLE
 NORNECLASS {nx}x{ny}x{nz}
DIMENS
 {nx} {ny} {nz} /
OIL
WATER
GAS
DISGAS
VAPOIL
METRIC
TABDIMS
 2 2 /
WELLDIMS
 8 {nz} 2 8 /
START
 1 'JAN' 2020 /
GRID
{grid}ACTNUM
 {' '.join(map(str, act))} /
PORO
 {poro} /
PERMX
 {permx} /
PERMY
 {permx} /
PERMZ
 {permz} /
NTG
 {n}*0.9 /
SWL
 {swl} /
REGIONS
SATNUM
 {satnum} /
PVTNUM
 {satnum} /
PROPS
PVTW
 277.0 1.038 4.67E-5 0.318 0 /
 277.0 1.038 4.67E-5 0.318 0 /
ROCK
 277.0 4.84E-5 /
 277.0 4.84E-5 /
SWOF
 0.12  0.000  0.95  0.0
 0.35  0.056  0.38  0.0
 0.60  0.270  0.07  0.0
 0.85  0.710  0.00  0.0
 1.00  1.000  0.00  0.0 /
 0.18  0.000  0.90  0.0
 0.40  0.040  0.32  0.0
 0.65  0.210  0.05  0.0
 0.90  0.650  0.00  0.0
 1.00  1.000  0.00  0.0 /
SGOF
 0.00  0.000  1.00  0.0
 0.10  0.012  0.70  0.0
 0.30  0.130  0.33  0.0
 0.55  0.480  0.07  0.0
 0.88  0.950  0.00  0.0 /
 0.00  0.000  1.00  0.0
 0.12  0.010  0.65  0.0
 0.35  0.150  0.28  0.0
 0.60  0.500  0.05  0.0
 0.82  0.900  0.00  0.0 /
{pvt}
SOLUTION
EQUIL
 {tops[half]:.1f} 270 {tops[half] + 3 * dz:.1f} 0 {tops[0] - dz:.1f} 0 1 1 0 /
RSVD
 {tops[0] - dz:.1f} 90.0
 {bots[-1] + dz:.1f} 70.0 /
RVVD
 {tops[0] - dz:.1f} 0.0003
 {bots[-1] + dz:.1f} 0.0001 /
SUMMARY
FOPR
FPR
SCHEDULE
{wells}TSTEP
 {tstep_days} /
END
"""


def _norne_well_ij(nx, ny):
    """Well columns (0-based i,j): 3 producers spread + 1 injector."""
    return [(nx // 4, ny // 4), (3 * nx // 4, ny // 4),
            (nx // 2, 3 * ny // 4), (1, ny - 2)]


def _norne_wells_text(nx, ny, nz, wij=None):
    (p1, p2, p3, inj) = wij if wij is not None else _norne_well_ij(nx, ny)
    k1, k2 = 1, max(nz // 3, 1)
    ki1, ki2 = max(2 * nz // 3, 1), nz
    def one(i, j):
        return i + 1, j + 1
    p1, p2, p3, inj = one(*p1), one(*p2), one(*p3), one(*inj)
    return f"""WELSPECS
 'P-1'   'G1' {p1[0]} {p1[1]} 2600 'OIL' /
 'P-2'   'G1' {p2[0]} {p2[1]} 2600 'OIL' /
 'P-3'   'G1' {p3[0]} {p3[1]} 2600 'OIL' /
 'W-INJ' 'G2' {inj[0]} {inj[1]} 2850 'WATER' /
/
COMPDAT
 'P-1'   {p1[0]} {p1[1]} {k1} {k2} 'OPEN' 1* 1* 0.216 /
 'P-2'   {p2[0]} {p2[1]} {k1} {k2} 'OPEN' 1* 1* 0.216 /
 'P-3'   {p3[0]} {p3[1]} {k1} {k2} 'OPEN' 1* 1* 0.216 /
 'W-INJ' {inj[0]} {inj[1]} {ki1} {ki2} 'OPEN' 1* 1* 0.216 /
/
WCONPROD
 'P-1' 'OPEN' 'ORAT' 1200 4* 150 /
 'P-2' 'OPEN' 'ORAT' 1200 4* 150 /
 'P-3' 'OPEN' 'ORAT' 1200 4* 150 /
/
WCONINJE
 'W-INJ' 'WATER' 'OPEN' 'RATE' 3500 1* 400 /
/
"""


def write_norne_class_deck(path: str, nx: int = 46, ny: int = 56,
                           nz: int = 22, **kw) -> str:
    with open(path, "w") as f:
        f.write(norne_class_deck_text(nx, ny, nz, **kw))
    return path
