"""SPE9 deck generator (Killough, J.E., 1995, "Ninth SPE Comparative
Solution Project: A Reexamination of Black-Oil Simulation", SPE 29110).

Authored for opm_autodiff_tpu from the published problem statement
(reference regression family: spe9/spe9group,
/root/reference/compareECLFiles.cmake + jenkins/run-spe.sh:45-48).

Published data reproduced exactly:
  * 24 x 25 x 15 grid, DX = DY = 300 ft, 10-degree dip in +x,
    top of layer 1 at 9000 ft (updip edge)
  * layer thicknesses and porosities (15 published values each)
  * 25 producers completed in layers 2-4 (1500 STB/d oil target,
    1000 psia BHP floor), cut to 100 STB/d over days 300-360, then
    restored to 1500 STB/d until 900 days
  * water injector at (24, 25) completed in layers 11-15
    (5000 STB/d, 4000 psia BHP cap)
  * initial conditions: 3600 psia at 9035 ft datum, OWC at 9950 ft
    (inside the grid - downdip water leg), reservoir at bubble point
  * surface densities 44.9856 / 63.0210 / 0.0702 lbm/ft3

Documented stand-ins (the published geostatistical permeability field
and the full PVT/relperm tables are external data unavailable offline):
  * PERMX: seeded log-normal field (seed 29110) with layer-dependent
    geometric means echoing the published layered heterogeneity
    (0.01 md .. 3000 md span); PERMY = PERMX, PERMZ = 0.01 PERMX
  * PVTO/PVDG/SWOF/SGOF: smooth physically-consistent tables anchored
    at the published bubble point (3600 psia) and connate water (0.151)
  * producer locations: scattered one-per-row pattern in the style of
    the published location map

Run as a script to (re)write SPE9.DATA + SPE9_PERM.INC next to itself;
`cp_deck()` emits the corner-point twin (COORD/ZCORN for the same
dipping geometry) used by tests/test_spe9.py.
"""

import os

import numpy as np

NX, NY, NZ = 24, 25, 15
DXY = 300.0                      # ft
DIP_STEP = DXY * np.tan(np.radians(10.0))   # 52.8999 ft per column
TOP0 = 9000.0                    # ft, top of layer 1 at i=1

LAYER_DZ = [20, 15, 26, 15, 16, 14, 8, 8, 18, 12, 19, 18, 20, 50, 100]
LAYER_PORO = [0.087, 0.097, 0.111, 0.160, 0.130, 0.170, 0.170, 0.080,
              0.140, 0.130, 0.120, 0.105, 0.120, 0.116, 0.157]
# stand-in geometric means (md) for the published geostatistical field
LAYER_KMEAN = [30, 200, 100, 5, 60, 300, 150, 3, 80, 40, 150, 15, 120,
               60, 8]
SIGMA_LNK = 1.6

# producers PRODU2..PRODU26, one per j-row, scattered i (location-map
# style); injector INJE1 downdip at (24, 25)
PROD_IJ = [(5, 1), (8, 2), (11, 3), (10, 4), (12, 5), (4, 6), (8, 7),
           (14, 8), (11, 9), (12, 10), (10, 11), (5, 12), (8, 13),
           (11, 14), (13, 15), (15, 16), (11, 17), (12, 18), (5, 19),
           (8, 20), (11, 21), (15, 22), (12, 23), (10, 24), (17, 25)]
PROD_NAMES = [f"PRODU{i + 2}" for i in range(25)]


def perm_field():
    """Seeded log-normal stand-in for the published field, [nz*ny*nx]."""
    rng = np.random.default_rng(29110)
    k = np.empty((NZ, NY, NX))
    for kk in range(NZ):
        ln = np.log(LAYER_KMEAN[kk]) + SIGMA_LNK * rng.standard_normal(
            (NY, NX))
        k[kk] = np.clip(np.exp(ln), 0.01, 3000.0)
    return k.reshape(-1)


def _rows(vals, per_line=8, fmt="%.6g"):
    out = []
    for i in range(0, len(vals), per_line):
        out.append(" " + " ".join(fmt % v for v in vals[i:i + per_line]))
    return "\n".join(out)


def _pvto():
    """Saturated branch Rs(p) = 1.2 (p/3600)^1.2 Mscf/STB, Bo and mu_o
    linear in Rs; one undersaturated branch at the bubble point."""
    rows = []
    for p in [400, 800, 1200, 1600, 2000, 2400, 2800, 3200, 3600]:
        rs = 1.2 * (p / 3600.0) ** 1.2
        bo = 1.10 + 0.2917 * rs
        mu = 1.25 - 0.60 * (rs / 1.2)
        if p < 3600:
            rows.append(f" {rs:.4f} {p} {bo:.4f} {mu:.4f} /")
        else:
            u = []
            for pu in [3600, 4000, 4400]:
                bou = bo * (1.0 - 1e-5 * (pu - 3600))
                muu = mu * (1.0 + 4e-5 * (pu - 3600))
                u.append(f"{pu} {bou:.4f} {muu:.4f}")
            rows.append(f" {rs:.4f} " + u[0] + "\n       " + u[1] +
                        "\n       " + u[2] + " /")
    return "\n".join(rows) + "\n/"


def _pvdg():
    rows = []
    for p in [400, 800, 1200, 1600, 2000, 2400, 2800, 3200, 3600, 4000]:
        bg = 2600.0 / p + 0.05
        mu = 0.012 + 2.8e-6 * p
        rows.append(f" {p} {bg:.4f} {mu:.4f}")
    return "\n".join(rows) + " /"


def _swof():
    rows = []
    sws = [0.151, 0.20, 0.25, 0.30, 0.35, 0.40, 0.45, 0.50, 0.55,
           0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 1.00]
    for sw in sws:
        swn = min(max((sw - 0.151) / (0.85 - 0.151), 0.0), 1.0)
        krw = 1.0 if sw >= 1.0 else 0.35 * swn ** 2
        krow = (1.0 - swn) ** 3
        pc = 3.0 * (1.0 - (sw - 0.151) / (1.0 - 0.151))
        rows.append(f" {sw:.3f} {krw:.5f} {krow:.5f} {max(pc, 0.0):.4f}")
    return "\n".join(rows) + " /"


def _sgof():
    rows = []
    sgs = [0.0, 0.03, 0.05, 0.10, 0.15, 0.20, 0.30, 0.40, 0.50, 0.60,
           0.70, 0.849]
    for sg in sgs:
        sgn = min(max((sg - 0.03) / (0.849 - 0.03), 0.0), 1.0)
        krg = 0.9 * sgn ** 1.8
        krog = (1.0 - sg / 0.849) ** 2.5
        rows.append(f" {sg:.3f} {krg:.5f} {krog:.5f} 0.0")
    return "\n".join(rows) + " /"


def _grid_bc():
    """Block-centered grid section: per-column TOPS carries the dip."""
    tops = [TOP0 + i * DIP_STEP for i in range(NX)] * NY
    dz = " ".join(f"{NX * NY}*{d}" for d in LAYER_DZ)
    poro = " ".join(f"{NX * NY}*{p}" for p in LAYER_PORO)
    return f"""DX
 {NX * NY * NZ}*{DXY} /
DY
 {NX * NY * NZ}*{DXY} /
DZ
 {dz} /
TOPS
{_rows(tops, fmt="%.4f")} /
PORO
 {poro} /
INCLUDE
 'SPE9_PERM.INC' /
"""


def _grid_cp():
    """Corner-point twin: vertical pillars, continuously dipping
    horizons z(x) = TOP0 + x tan(10deg) + cumulative layer thickness."""
    zoff = np.concatenate([[0.0], np.cumsum(LAYER_DZ)])
    xe = np.arange(NX + 1) * DXY
    ye = np.arange(NY + 1) * DXY
    ztope = TOP0 + xe * np.tan(np.radians(10.0))   # horizon at x-edges
    coord = []
    for j in range(NY + 1):
        for i in range(NX + 1):
            zt = ztope[i] - 10.0
            zb = ztope[i] + zoff[-1] + 10.0
            coord.append((xe[i], ye[j], zt, xe[i], ye[j], zb))
    coord_flat = [v for c in coord for v in c]

    # zcorn stream order [k, dk, j, dj, i, di]
    lines = []
    for k in range(NZ):
        for dk in range(2):
            zrow = ztope + zoff[k + dk]        # [NX+1] at x-edges
            vals = []
            for i in range(NX):
                vals += [zrow[i], zrow[i + 1]]
            row = " " + " ".join("%.4f" % v for v in vals)
            # identical for every (j, dj): 2*NY copies
            lines += [row] * (2 * NY)
    poro = " ".join(f"{NX * NY}*{p}" for p in LAYER_PORO)
    return ("COORD\n" + _rows(coord_flat, per_line=6, fmt="%.4f") +
            " /\nZCORN\n" + "\n".join(lines) + " /\nPORO\n " + poro +
            " /\nINCLUDE\n 'SPE9_PERM.INC' /\n")


def _schedule(group):
    ws, cd, cp = "", "", ""
    for name, (i, j) in zip(PROD_NAMES, PROD_IJ):
        ws += f" '{name}' 'PLAT' {i} {j} 9110 'OIL' /\n"
        cd += f" '{name}' {i} {j} 2 4 'OPEN' 1* 1* 1.0 /\n"
        ctl = "'GRUP'" if group else "'ORAT'"
        cp += f" '{name}' 'OPEN' {ctl} 1500 4* 1000 /\n"
    ws += " 'INJE1' 'PLAT' 24 25 9110 'WATER' /\n"
    cd += " 'INJE1' 24 25 11 15 'OPEN' 1* 1* 1.0 /\n"
    cp100 = "".join(
        f" '{n}' 'OPEN' 'ORAT' 100 4* 1000 /\n" for n in PROD_NAMES)
    ctl2 = "'GRUP'" if group else "'ORAT'"
    cp1500 = "".join(
        f" '{n}' 'OPEN' {ctl2} 1500 4* 1000 /\n" for n in PROD_NAMES)
    gcon = ("GCONPROD\n 'PLAT' 'ORAT' 20000 /\n/\n" if group else "")
    return f"""SCHEDULE
GRUPTREE
 'PLAT' 'FIELD' /
/
WELSPECS
{ws}/
COMPDAT
{cd}/
{gcon}WCONPROD
{cp}/
WCONINJE
 'INJE1' 'WATER' 'OPEN' 'RATE' 5000 1* 4000 /
/
TSTEP
 1 4 10 15 6*30 30 25 /
WCONPROD
{cp100}/
TSTEP
 2*30 /
WCONPROD
{cp1500}/
TSTEP
 18*30 /
END
"""


def deck(cp=False, group=False):
    grid = _grid_cp() if cp else _grid_bc()
    return f"""-- SPE9 benchmark (Killough 1995, SPE 29110): see make_spe9.py for
-- provenance of each section (published data vs documented stand-ins).

RUNSPEC

TITLE
 SPE9 - KILLOUGH NINTH COMPARATIVE SOLUTION PROJECT

DIMENS
 {NX} {NY} {NZ} /

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
 26 15 2 26 /

UNIFOUT

START
 1 'JAN' 2015 /

GRID

{grid}
PROPS

PVTW
 3600 1.0034 3E-6 0.96 0 /

ROCK
 3600 1E-6 /

DENSITY
 44.9856 63.0210 0.0702 /

SWOF
{_swof()}

SGOF
{_sgof()}

PVDG
{_pvdg()}

PVTO
{_pvto()}

SOLUTION

EQUIL
 9035 3600 9950 0 8800 0 1 0 0 /

RSVD
 8800 1.20
 10600 1.20 /

SUMMARY
FOPR
FGOR
FPR
FWIR
FWCT
FGPR

{_schedule(group)}"""


def write_all(dirpath=None):
    d = dirpath or os.path.dirname(os.path.abspath(__file__))
    perm = perm_field()
    with open(os.path.join(d, "SPE9_PERM.INC"), "w") as f:
        f.write("PERMX\n" + _rows(perm) + " /\n")
        f.write("PERMY\n" + _rows(perm) + " /\n")
        f.write("PERMZ\n" + _rows(perm * 0.01) + " /\n")
    with open(os.path.join(d, "SPE9.DATA"), "w") as f:
        f.write(deck())
    return d


if __name__ == "__main__":
    print("wrote SPE9 deck into", write_all())
