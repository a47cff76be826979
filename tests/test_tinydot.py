"""esum (utils/tinydot.py) equality vs jnp.einsum on the well-system specs.

XLA's TPU backend lowers small/odd dot_generals to serial while loops;
the well contractions (wells/standard*.py, wells/multisegment.py,
parallel/shard_wells.py) use the broadcast-multiply form instead. The
contract: bit-identical semantics to jnp.einsum for every spec in use.
"""

import subprocess
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.utils.tinydot import esum

W, P, E, C, K = 3, 4, 4, 3, 17

SPECS = [
    # spec, shape_a, shape_b  — every spec the well modules call
    ("wpej,wpj->we", (W, P, E, 3), (W, P, 3)),      # standard4 Schur Bx
    ("wef,wf->we", (W, E, E), (W, E)),               # D^-1 (.)
    ("wpce,we->wpc", (W, P, C, E), (W, E)),          # C D^-1 (.)
    ("wpck,wpkd->wpcd", (W, P, C, K), (W, P, K, 3)),  # chain-rule dq_du
    ("wpj,wpj->w", (W, P, 3), (W, P, 3)),            # standard 1-DOF Bx
    ("wi,wpij->wpj", (W, 3), (W, P, 3, 3)),          # 1-DOF B row
    ("wi,wpi->w", (W, 3), (W, P, 3)),                # 1-DOF D coupling
    ("msp,mp->ms", (W, E, P), (W, P)),               # multisegment Bx
    ("mst,mt->ms", (W, E, E), (W, E)),               # multisegment D^-1
    ("mps,ms->mp", (W, P, E), (W, E)),               # multisegment C .
]


@pytest.mark.parametrize("spec,sa,sb", SPECS,
                         ids=[s[0] for s in SPECS])
def test_esum_matches_einsum(spec, sa, sb):
    rng = np.random.default_rng(hash(spec) % 2**32)
    a = jnp.asarray(rng.standard_normal(sa), jnp.float32)
    b = jnp.asarray(rng.standard_normal(sb), jnp.float32)
    got = esum(spec, a, b)
    want = jnp.einsum(spec, a, b)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-6, atol=2e-6)


def test_esum_f64_dtype_preserved():
    a = jnp.asarray(np.ones((W, E, E)), jnp.float64)
    b = jnp.asarray(np.ones((W, E)), jnp.float64)
    out = esum("wef,wf->we", a, b)
    assert out.dtype == a.dtype


def test_cprinner_vmem_guard():
    """fits_vmem gates the single-launch kernel off above the VMEM
    budget (ADVICE r4 medium: >1-2M-cell grids would fail Mosaic
    compilation with no fallback)."""
    from opm_autodiff_tpu.ops import pallas_cprinner as pci

    assert pci.fits_vmem((22, 56, 46))          # norne-class: in budget
    # the real-Norne boxes fit only via the transposed orientation
    # (their natural [*,112,*] layout pads past VMEM — observed Mosaic
    # compile crashes on the v5e)
    assert pci._best_orientation((22, 112, 46))[0] == "swap"
    assert pci.fits_vmem((22, 112, 46))
    assert pci.fits_vmem((22, 112, 26))
    assert not pci.fits_vmem((100, 100, 100))   # 1M cells: over budget
    assert not pci.fits_vmem((64, 512, 512))    # pod-scale: over budget
