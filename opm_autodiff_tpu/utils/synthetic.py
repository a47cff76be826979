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
