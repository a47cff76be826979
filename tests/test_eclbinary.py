"""ECL binary I/O tests: native round-trip + file structure.

The reference's regression contract is ECL-file comparison
(compareECLFiles.cmake); these tests validate our native writer/reader
core and the semantic content of SMSPEC/UNSMRY/EGRID/INIT/UNRST files.
"""

import os
import struct
import subprocess
import sys

import numpy as np
import pytest

from opm_autodiff_tpu.io.eclbinary import (EclFileWriter, read_ecl_file,
                                           write_summary_files)


def test_roundtrip_all_types(tmp_path):
    path = str(tmp_path / "T.BIN")
    ints = np.arange(2500, dtype=np.int32)  # spans multiple 1000-blocks
    reals = np.linspace(0, 1, 1234).astype(np.float32)
    doubs = np.linspace(-5, 5, 7).astype(np.float64)
    logis = np.asarray([0, 1, 1, 0], np.int32)
    names = ["PROD", "INJ", "A-LONG-N", ""]
    with EclFileWriter(path) as w:
        w.write("INTEKW  ", ints)
        w.write("REALKW  ", reals)
        w.write("DOUBKW  ", doubs)
        w.write("LOGIKW  ", logis, kind="LOGI")
        w.write("CHARKW  ", names, kind="CHAR")
        w.write("MESSKW  ", None, kind="MESS")
    kws = read_ecl_file(path)
    assert [k[0] for k in kws] == ["INTEKW", "REALKW", "DOUBKW", "LOGIKW",
                                  "CHARKW", "MESSKW"]
    np.testing.assert_array_equal(kws[0][2], ints)
    np.testing.assert_allclose(kws[1][2], reals)
    np.testing.assert_allclose(kws[2][2], doubs)
    np.testing.assert_array_equal(kws[3][2], logis)
    assert kws[4][2] == ["PROD", "INJ", "A-LONG-N", ""]


def test_fortran_record_format(tmp_path):
    """Verify raw bytes: big-endian length-prefixed records, 16-byte header."""
    path = str(tmp_path / "R.BIN")
    with EclFileWriter(path) as w:
        w.write("FOO     ", np.asarray([7, 8], np.int32))
    raw = open(path, "rb").read()
    # header record: len=16
    assert struct.unpack(">i", raw[0:4])[0] == 16
    assert raw[4:12] == b"FOO     "
    assert struct.unpack(">i", raw[12:16])[0] == 2
    assert raw[16:20] == b"INTE"
    assert struct.unpack(">i", raw[20:24])[0] == 16
    # data record: len=8, values big-endian
    assert struct.unpack(">i", raw[24:28])[0] == 8
    assert struct.unpack(">ii", raw[28:36]) == (7, 8)


def test_summary_files(tmp_path):
    import datetime

    rows = [{"TIME": 1.0, "FOPR": 100.0, "WBHP:PROD": 3000.0},
            {"TIME": 2.0, "FOPR": 90.0, "WBHP:PROD": 2900.0}]
    base = str(tmp_path / "CASE")
    write_summary_files(base, rows, (10, 10, 3),
                        datetime.date(2015, 1, 1), "FIELD")
    smspec = {k: v for k, v, *_ in
              [(n, d) for n, t, d in read_ecl_file(base + ".SMSPEC")]}
    assert smspec["KEYWORDS"] == ["TIME", "FOPR", "WBHP"]
    assert smspec["WGNAMES"][2] == "PROD"
    assert smspec["UNITS"] == ["DAYS", "STB/DAY", "PSIA"]
    np.testing.assert_array_equal(smspec["DIMENS"][:4], [3, 10, 10, 3])
    unsmry = read_ecl_file(base + ".UNSMRY")
    params = [d for n, t, d in unsmry if n == "PARAMS"]
    assert len(params) == 2
    np.testing.assert_allclose(params[0], [1.0, 100.0, 3000.0])
    np.testing.assert_allclose(params[1], [2.0, 90.0, 2900.0])


def test_cli_writes_ecl_files(tmp_path, spe1_deck_path):
    text = open(spe1_deck_path).read()
    short = text.replace("TSTEP\n 1 2 3 4 5 10 10 15 25 25 30 30 30 30 30 30 /",
                         "TSTEP\n 1 2 /")
    short = short.split("TSTEP\n 12*30.4 /")[0] + "\nEND\n"
    deck = tmp_path / "E.DATA"
    deck.write_text(short)
    env = dict(os.environ)
    env["PYTHONPATH"] = (os.path.dirname(os.path.dirname(__file__))
                         + os.pathsep + env.get("PYTHONPATH", ""))
    out = subprocess.run(
        [sys.executable, "-m", "opm_autodiff_tpu.main", str(deck),
         "--platform", "cpu", "--quiet"],
        capture_output=True, text=True, env=env, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]

    egrid = read_ecl_file(str(tmp_path / "E.EGRID"))
    names = [n for n, *_ in egrid]
    assert names[:2] == ["FILEHEAD", "GRIDHEAD"]
    d = dict((n, v) for n, t, v in egrid)
    np.testing.assert_array_equal(d["GRIDHEAD"][1:4], [10, 10, 3])
    assert d["COORD"].size == 11 * 11 * 6
    assert d["ZCORN"].size == 8 * 300
    assert d["ACTNUM"].sum() == 300

    init = dict((n, v) for n, t, v in read_ecl_file(str(tmp_path / "E.INIT")))
    assert init["PORV"].size == 300
    np.testing.assert_allclose(init["PORO"], 0.3, rtol=1e-6)
    # TRANX in field units matches the hand value from test_grid
    assert init["TRANX"][0] == pytest.approx(11.2712, rel=1e-4)

    unrst = read_ecl_file(str(tmp_path / "E.UNRST"))
    seqs = [v for n, t, v in unrst if n == "SEQNUM"]
    assert len(seqs) == 2
    p = [v for n, t, v in unrst if n == "PRESSURE"][0]
    assert 4000 < p.mean() < 5200  # psia
    sw = [v for n, t, v in unrst if n == "SWAT"][0]
    np.testing.assert_allclose(sw, 0.12, atol=1e-2)  # ~connate after 2 days


def test_rft_output(tmp_path, spe1_deck_path):
    """WRFTPLT -> .RFT stream with per-connection depth/pressure/sats
    (reference: EclipseIO RFT via eclwriter)."""
    text = open(spe1_deck_path).read().replace(
        "TSTEP", "WRFTPLT\n 'PROD' 'YES' /\n/\nTSTEP", 1)
    p = tmp_path / "RFT.DATA"
    p.write_text(text)
    import subprocess
    import sys
    r = subprocess.run(
        [sys.executable, "-m", "opm_autodiff_tpu.main", str(p),
         "--platform", "cpu", "--output-dir", str(tmp_path), "--quiet"],
        capture_output=True, text=True, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    rft = tmp_path / "RFT.RFT"
    assert rft.exists()
    from opm_autodiff_tpu.io.eclbinary import read_ecl_file
    kws = read_ecl_file(str(rft))
    names = [k[0] for k in kws]
    assert "WELLETC" in names and "PRESSURE" in names and "DEPTH" in names
