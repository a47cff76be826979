"""ops/pallas_cprinner: the single-launch CPR inner pressure solve.

Equality vs the XLA fixed-iteration BiCGStab it replaces
(solvers/cpr._pressure_inner_solve_generic), in interpret mode on the
virtual CPU backend — the same anchoring pattern as the other Pallas
kernels (tests/test_pallas_*.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.ops import pallas_cprinner as pci
from opm_autodiff_tpu.solvers.cpr import (CprBandedData,
                                          _pressure_inner_solve_generic,
                                          _pressure_matvec_banded)


def _toy_cpr(nz=4, ny=6, nx=8, seed=0, with_extras=False):
    rng = np.random.default_rng(seed)
    shape = (nz, ny, nx)
    # diagonally dominant scalar 7-point system (f32)
    px_lr = -jnp.asarray(rng.uniform(0.1, 1.0, (nz, ny, nx - 1)), jnp.float32)
    px_rl = -jnp.asarray(rng.uniform(0.1, 1.0, (nz, ny, nx - 1)), jnp.float32)
    py_lr = -jnp.asarray(rng.uniform(0.1, 1.0, (nz, ny - 1, nx)), jnp.float32)
    py_rl = -jnp.asarray(rng.uniform(0.1, 1.0, (nz, ny - 1, nx)), jnp.float32)
    pz_lr = -jnp.asarray(rng.uniform(0.1, 1.0, (nz - 1, ny, nx)), jnp.float32)
    pz_rl = -jnp.asarray(rng.uniform(0.1, 1.0, (nz - 1, ny, nx)), jnp.float32)
    p_diag = jnp.asarray(rng.uniform(6.0, 8.0, shape), jnp.float32)
    ex = {}
    if with_extras:
        n = nz * ny * nx
        e = 10
        le = rng.choice(n, e, replace=False).astype(np.int32)
        ri = rng.choice(n, e, replace=False).astype(np.int32)
        ex = dict(ex_left=jnp.asarray(le), ex_right=jnp.asarray(ri),
                  p_ex_lr=-jnp.asarray(rng.uniform(0.05, 0.2, e),
                                       jnp.float32),
                  p_ex_rl=-jnp.asarray(rng.uniform(0.05, 0.2, e),
                                       jnp.float32))
    return CprBandedData(weights=None, p_diag=p_diag, px_lr=px_lr,
                         px_rl=px_rl, py_lr=py_lr, py_rl=py_rl,
                         pz_lr=pz_lr, pz_rl=pz_rl, inv_diag=None, **ex)


def test_kernel_matches_xla_inner_solve():
    c = _toy_cpr()
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(c.p_diag.shape), jnp.float32)
    ref = _pressure_inner_solve_generic(
        lambda v: _pressure_matvec_banded(c, v), c.p_diag, b, 6)
    out = pci.inner_solve_bands(c, b, 6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_defect_correction_keeps_extras_in_operator():
    """The kernel path's defect correction must solve the FULL system
    (bands + extras) at preconditioner accuracy: after two kernel
    passes the residual of the full operator must be well below the
    bands-only single-pass residual."""
    c = _toy_cpr(with_extras=True)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(c.p_diag.shape), jnp.float32)
    dp0 = pci.inner_solve_bands(c, b, 8, interpret=True)
    res0 = b - _pressure_matvec_banded(c, dp0)
    dp = dp0 + pci.inner_solve_bands(c, res0, 8, interpret=True)
    res1 = b - _pressure_matvec_banded(c, dp)
    n0 = float(jnp.linalg.norm(res0))
    n1 = float(jnp.linalg.norm(res1))
    nb = float(jnp.linalg.norm(b))
    assert n1 < 0.5 * n0
    assert n1 < 0.05 * nb


def test_inner_solve_swapped_orientation_matches():
    """A tall-plane box (ny >> nx) routes through the transposed kernel
    frame (Mosaic pads the minor dims to (8,128)); the math must be
    identical to the natural orientation."""
    import numpy as np

    from opm_autodiff_tpu.ops import pallas_cprinner as pci

    nz, ny, nx = 4, 24, 5
    assert pci._best_orientation((nz, ny, nx))[0] == "swap"
    rng = np.random.default_rng(3)

    class C:
        p_diag = jnp.asarray(4.0 + rng.random((nz, ny, nx)))
        px_lr = jnp.asarray(0.1 * rng.standard_normal((nz, ny, nx - 1)))
        px_rl = jnp.asarray(0.1 * rng.standard_normal((nz, ny, nx - 1)))
        py_lr = jnp.asarray(0.1 * rng.standard_normal((nz, ny - 1, nx)))
        py_rl = jnp.asarray(0.1 * rng.standard_normal((nz, ny - 1, nx)))
        pz_lr = jnp.asarray(0.1 * rng.standard_normal((nz - 1, ny, nx)))
        pz_rl = jnp.asarray(0.1 * rng.standard_normal((nz - 1, ny, nx)))

    b = jnp.asarray(rng.standard_normal((nz, ny, nx)))
    got = np.asarray(pci.inner_solve_bands(C, b, 6, interpret=True))

    # natural-orientation reference: transpose the PROBLEM so the
    # auto-orientation picks "asis", then map the answer back
    class CT:
        p_diag = jnp.swapaxes(C.p_diag, 1, 2)
        px_lr = jnp.swapaxes(C.py_lr, 1, 2)
        px_rl = jnp.swapaxes(C.py_rl, 1, 2)
        py_lr = jnp.swapaxes(C.px_lr, 1, 2)
        py_rl = jnp.swapaxes(C.px_rl, 1, 2)
        pz_lr = jnp.swapaxes(C.pz_lr, 1, 2)
        pz_rl = jnp.swapaxes(C.pz_rl, 1, 2)

    assert pci._best_orientation((nz, nx, ny))[0] == "asis"
    ref = np.asarray(jnp.swapaxes(
        pci.inner_solve_bands(CT, jnp.swapaxes(b, 1, 2), 6,
                              interpret=True), 1, 2))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-7)
