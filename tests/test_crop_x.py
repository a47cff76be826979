"""x-shift window cropping of the embedded banded box.

Real-Norne economics (VERDICT r4 missing #3): a ~39%-active field in a
46x112x22 box pays ~2.5x padded compute on the dense layout. The crop
narrows the box by shifting y-row windows to their active x range;
cross-window y faces with different offsets ride the COO-extras
machinery, so the assembled operator is EXACTLY the uncropped one on
the active cells.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.models.blackoil import PrimaryState, accumulation
from opm_autodiff_tpu.models.structured import (
    _crop_x_offsets, assemble_structured, embed_cells, pin_inactive,
    structured_matvec, topology_from_geometry_embedded)


def _diagonal_band_problem(tmp_path, nx=16, ny=12, nz=3):
    """SPE1 physics with a diagonal active band ~40% of the box."""
    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    p = str(tmp_path / "DIAG.DATA")
    write_spe1_deck(p, nx, ny, nz)
    act = np.zeros((nz, ny, nx), int)
    for j in range(ny):
        lo = min(j, nx - 6)
        act[:, j, lo:lo + 6] = 1  # 6-wide band drifting with j
    # the band covers both well columns: (1,1) in row 0's [0,6) range
    # and (nx,ny) in the last row's [nx-6,nx) range
    txt = open(p).read()
    open(p, "w").write(txt.replace(
        "PROPS", "ACTNUM\n " + " ".join(map(str, act.reshape(-1)))
        + " /\n\nPROPS", 1))
    state = load_state(p)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    from opm_autodiff_tpu.models.blackoil import statics_from_geometry
    from opm_autodiff_tpu.models.init import equilibrate

    cells, _ = statics_from_geometry(geo, structured="never")
    init = equilibrate(state, geo, fs)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref, cells.regs)
    return geo, fs, cells, init, acc0


def test_crop_adoption_logic():
    rng = np.random.default_rng(0)
    nx, ny = 40, 30
    # diagonal band: crop pays
    jj, ii = [], []
    for j in range(ny):
        lo = j % (nx - 8)
        for i in range(lo, lo + 8):
            ii.append(i)
            jj.append(j)
    off, nxc = _crop_x_offsets(np.asarray(ii), np.asarray(jj), nx, ny,
                               "auto")
    assert nxc < 0.85 * nx
    # random speckle: full-width rows, no crop
    ii = rng.integers(0, nx, 2000)
    jj = rng.integers(0, ny, 2000)
    off, nxc = _crop_x_offsets(ii, jj, nx, ny, "auto")
    assert nxc == nx and not off.any()
    # "never" honored
    off, nxc = _crop_x_offsets(np.asarray([0, 1]), np.asarray([0, 0]),
                               nx, ny, "never")
    assert nxc == nx


def test_cropped_assembly_matches_uncropped(tmp_path):
    geo, fs, cells, init, acc0 = _diagonal_band_problem(tmp_path)
    dt = jnp.asarray(86400.0)
    res = {}
    syss = {}
    embs = {}
    for mode in ("never", "auto"):
        emb = topology_from_geometry_embedded(geo, crop_x=mode)
        cells_f = embed_cells(emb, cells)
        acc0_f = jnp.zeros((emb.mask.shape[0], 3),
                           acc0.dtype).at[emb.act].set(acc0)
        u_f = init.u[emb.fill]
        flag_f = init.flag[emb.fill]
        sys = assemble_structured(fs, cells_f, emb.topo,
                                  PrimaryState(u_f, flag_f), acc0_f, dt)
        if not hasattr(sys, "residual"):  # (sys, packed) form
            sys = sys[0]
        from opm_autodiff_tpu.models.structured import add_extra_faces

        if emb.ex_left is not None:
            sys = add_extra_faces(sys, fs, cells_f, emb, u_f, flag_f)
        sys = pin_inactive(sys, emb.mask)
        res[mode] = np.asarray(sys.residual)[np.asarray(emb.act)]
        syss[mode] = sys
        embs[mode] = emb
    # the cropped box must be materially smaller and carry y extras
    assert (embs["auto"].mask.shape[0]
            < 0.8 * embs["never"].mask.shape[0])
    assert embs["auto"].ex_left is not None
    # assembled residual on the ACTIVE cells is identical physics
    np.testing.assert_allclose(res["auto"], res["never"],
                               rtol=1e-10, atol=1e-12)
    # and the operator acts identically: J @ x restricted to active
    rng = np.random.default_rng(5)
    xa = rng.standard_normal((init.u.shape[0], 3))
    ys = {}
    for mode in ("never", "auto"):
        emb = embs[mode]
        xf = jnp.zeros((emb.mask.shape[0], 3)).at[emb.act].set(
            jnp.asarray(xa))
        y = structured_matvec(syss[mode], xf)
        ys[mode] = np.asarray(y)[np.asarray(emb.act)]
    np.testing.assert_allclose(ys["auto"], ys["never"],
                               rtol=1e-9, atol=1e-10)


def test_norne_real_field_adopts_crop():
    from opm_autodiff_tpu.utils.synthetic import _field_actnum

    nx, ny, nz = 46, 112, 22
    act, _wij = _field_actnum(nx, ny, nz)
    a3 = act.reshape(nz, ny, nx)
    kk, jj, ii = np.nonzero(a3)
    off, nxc = _crop_x_offsets(ii, jj, nx, ny, "auto")
    assert nxc < 0.85 * nx
    # cropped box small enough for the single-launch CPR kernel
    from opm_autodiff_tpu.ops import pallas_cprinner as pci

    assert pci.fits_vmem((nz, ny, nxc)), (nz, ny, nxc)
