"""VTK output (reference: --enable-vtk-output via opm-models' VTK
modules): legacy unstructured-grid snapshots + .pvd collection."""

import os
import subprocess
import sys

import numpy as np
import pytest


def test_vtk_series(tmp_path, spe1_deck_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = tmp_path / "vtkout"
    # truncate to two report steps for speed
    deck = open(spe1_deck_path).read()
    head = deck.split("TSTEP")[0]
    short = head + "TSTEP\n 1 2 /\nEND\n"
    p = tmp_path / "SHORT.DATA"
    p.write_text(short)
    r = subprocess.run(
        [sys.executable, "-m", "opm_autodiff_tpu.main", str(p),
         "--output-dir", str(out), "--enable-vtk-output", "true",
         "--enable-ecl-output", "false", "--quiet",
         "--platform", "cpu"],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    vtks = sorted(out.glob("*.vtk"))
    assert len(vtks) == 2  # TSTEP "1 2" -> two report steps
    txt = vtks[0].read_text()
    assert "DATASET UNSTRUCTURED_GRID" in txt
    assert "SCALARS pressure_bar" in txt
    assert "SCALARS swat" in txt
    # pvd collection references the snapshot
    pvd = (out / "SHORT.pvd").read_text()
    assert vtks[0].name in pvd
    # cell count == active cells
    ncells = int([ln for ln in txt.splitlines()
                  if ln.startswith("CELLS ")][0].split()[1])
    assert ncells == 300  # SPE1CASE1 10x10x3
