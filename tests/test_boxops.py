"""BOX/EQUALS/COPY/ADD/MULTIPLY grid operations (SPE9/Norne-class decks)."""

import numpy as np
import pytest

from opm_autodiff_tpu import units as U
from opm_autodiff_tpu.io.state import load_state

DECK = """RUNSPEC
DIMENS
 4 3 2 /
OIL
WATER
GAS
METRIC
GRID
DX
 24*100 /
DY
 24*100 /
DZ
 24*10 /
TOPS
 12*1000 /
EQUALS
 'PORO' 0.3 /
 'PERMX' 500 1 4 1 3 1 1 /
 'PERMX' 50 1 4 1 3 2 2 /
/
BOX
 1 2 1 1 1 1 /
MULTIPLY
 'PERMX' 0.1 /
/
ENDBOX
ADD
 'PORO' 0.05 1 1 1 1 1 2 /
/
COPY
 'PERMX' 'PERMY' /
 'PERMX' 'PERMZ' /
/
"""


@pytest.fixture(scope="module")
def grid(tmp_path_factory):
    p = tmp_path_factory.mktemp("box") / "B.DATA"
    p.write_text(DECK)
    return load_state(str(p)).grid


def test_equals_layers(grid):
    mD = U.MILLIDARCY
    assert grid.permx[2] / mD == pytest.approx(500)   # layer 1 untouched
    assert grid.permx[12] / mD == pytest.approx(50)   # layer 2


def test_multiply_in_box(grid):
    mD = U.MILLIDARCY
    # cells (1..2, 1, 1) multiplied by 0.1
    assert grid.permx[0] / mD == pytest.approx(50)
    assert grid.permx[1] / mD == pytest.approx(50)
    assert grid.permx[3] / mD == pytest.approx(500)


def test_add_in_record_box(grid):
    # PORO +0.05 only at i=1, j=1, both layers
    assert grid.poro[0] == pytest.approx(0.35)
    assert grid.poro[12] == pytest.approx(0.35)
    assert grid.poro[1] == pytest.approx(0.30)


def test_copy_full_grid(grid):
    np.testing.assert_allclose(grid.permy, grid.permx)
    np.testing.assert_allclose(grid.permz, grid.permx)


def test_multireg(tmp_path):
    """MULTIREG: multiply an array within a MULTNUM region."""
    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    import os

    p = os.path.join(str(tmp_path), "MR.DATA")
    write_spe1_deck(p, 4, 1, 2)
    txt = open(p).read().replace(
        "PROPS",
        "MULTNUM\n 4*1 4*2 /\nMULTIREG\n 'PERMX' 10.0 2 'M' /\n/\n\nPROPS",
        1)
    open(p, "w").write(txt)
    base = os.path.join(str(tmp_path), "MR0.DATA")
    write_spe1_deck(base, 4, 1, 2)
    px0 = np.asarray(build_geometry(load_state(base)).permx)
    px = np.asarray(build_geometry(load_state(p)).permx)
    # layer 2 (MULTNUM 2) scaled x10; layer 1 untouched
    np.testing.assert_allclose(px[:4], px0[:4], rtol=1e-12)
    np.testing.assert_allclose(px[4:], 10 * px0[4:], rtol=1e-12)
