"""Golden-vector regression helper (VERDICT r4 missing #2).

The reference's regression contract is output-file equivalence within
tolerance against frozen data (SURVEY.md §4 tier 4; compareECLFiles
ABS_TOL 2e-2 / REL_TOL 1e-5, compareECLFiles.cmake:198-200). This repo
has no opm-tests data in-environment, so the frozen side is OUR OWN
output, committed once and compared on every run: any silent numeric
drift between rounds fails loudly, and an intentional behavior change
requires re-freezing (delete the npz, rerun, commit) with the diff in
review.

Freezing protocol: if the golden file is absent, the check writes it
from the current run and SKIPS with a reminder to commit — so the same
test is both the freezer and the comparator, and the frozen vectors can
never drift from the fixture that produces them.
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "data", "golden")

# the reference's fine tolerances (compareECLFiles.cmake:198-200)
ABS_TOL = 2e-2
REL_TOL = 1e-5


def check_golden(name: str, summary, vectors, abs_tol=ABS_TOL,
                 rel_tol=REL_TOL):
    """Compare ``summary`` (utils SummaryWriter) against the frozen
    vectors in tests/data/golden/<name>.npz, freezing on first run."""
    from opm_autodiff_tpu.tools.compare_ecl import compare

    cur = {"TIME": np.asarray(summary.series("TIME"), float)}
    for v in vectors:
        cur[v] = np.asarray(summary.series(v), float)
    path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    if not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, **cur)
        pytest.skip(f"golden vectors frozen to {path} — commit the file")
    with np.load(path) as z:
        gold = {k: z[k] for k in z.files}
    msgs = compare(gold, cur, abs_tol, rel_tol, vectors=list(vectors))
    # step counts must match exactly: a changed substep/report pattern
    # is itself a regression signal (compare() would silently interp)
    if len(gold["TIME"]) != len(cur["TIME"]):
        msgs.insert(0, f"TIME length {len(cur['TIME'])} != frozen "
                       f"{len(gold['TIME'])}")
    assert not msgs, "golden drift vs frozen vectors:\n  " + \
        "\n  ".join(msgs)
