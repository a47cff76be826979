"""Pallas TPU kernel: CPR's inner pressure solve in ONE launch.

The CPR pressure stage runs a fixed-iteration Jacobi-preconditioned
BiCGStab on the scalar banded pressure system (solvers/cpr.py
``_pressure_inner_solve_generic`` — the reference's analog is one AMG
V-cycle, amgcpr.hh). As XLA ops that is ~35 executed op instances per
iteration; on the tunneled single-chip runtime every executed HLO
instance costs ~20us of dispatch latency, so the 6-iteration inner
solve alone measured ~4ms at 52k cells while the device compute in it
is microseconds. The whole pressure system is tiny (~230KB f32 per
field), so this kernel holds everything in VMEM and unrolls the entire
Krylov loop inside ONE ``pallas_call``.

Fault/NNC COO extras cannot gather inside a TPU kernel (no dynamic
vector gathers in Mosaic); the caller keeps them in the operator by
defect correction — see solvers/cpr.py ``_pressure_inner_solve_banded``:
one bands-only kernel solve, one XLA residual including the extras
(they are few), one more kernel solve on the correction. That keeps the
extras inside the effective coarse operator (VERDICT r2 #3) at the cost
of two launches.

Algorithm and breakdown guards mirror ``_pressure_inner_solve_generic``
exactly (equality-tested in interpret mode, tests/test_pallas_cpr.py),
with two deliberate deviations:

* **f32-only.** All operands are cast to f32 (Mosaic has no f64) and
  the breakdown guards use 1e-30 instead of the generic path's 1e-300.
  On f64-stored systems the CPR coarse solve therefore runs in reduced
  precision — harmless for a preconditioner (it multiplies a Krylov
  method that measures true residuals in the system dtype), but callers
  needing a full-precision inner solve must use the generic path.
* **VMEM-bounded.** The kernel keeps the 8 band/rhs arrays plus ~10
  live Krylov vectors resident in VMEM with the iteration loop fully
  unrolled; ``fits_vmem`` gates it off (callers fall back to the
  generic XLA path) once the resident footprint would crowd the ~16MB
  budget — calibrated to ~85k cells single-chip (the 113k-cell
  real-Norne box crashes the Mosaic compile; the 57k norne-class box
  is fine). Grids above that either crop (structured.py x-shift
  window cropping) or take the XLA inner solve.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def enabled() -> bool:
    env = os.environ.get("OPM_TPU_PALLAS_CPR")
    if env is not None:
        return env == "1"
    return (jax.default_backend() not in ("cpu",)
            and jax.device_count() == 1)


# ~16MB VMEM per TPU core; leave headroom for Mosaic's own spills and
# the compiler-managed scratch. 8 band/rhs inputs + x,r,rhat,p,v,phat,
# s,shat,t live vectors + the output ≈ 18 resident fields.
#
# The footprint that matters is the PADDED one: Mosaic tiles the two
# minor dims to (8, 128), so a [22,112,28] box occupies 22*112*128
# elements per field (nx=28 pads 4.6x) — observed on the v5e: the
# [22,56,46] norne-class box (padded ~11.4MB) compiles, every ny=112
# box in its natural orientation (padded >=22MB) crashes the Mosaic
# compile helper. ``inner_solve_bands`` therefore TRANSPOSES the plane
# to whichever (minor, second-minor) orientation pads least, and
# fits_vmem budgets the padded best-orientation footprint.
_VMEM_BUDGET_BYTES = 12 * 2**20
_RESIDENT_FIELDS = 18


def _padded_plane(ny: int, nx: int) -> int:
    return ((ny + 7) // 8 * 8) * ((nx + 127) // 128 * 128)


def _best_orientation(shape):
    """('asis'|'swap', padded elements/plane) minimizing Mosaic's
    (8, 128) tile padding of the two minor dims."""
    _nz, ny, nx = (int(s) for s in shape)
    as_is = _padded_plane(ny, nx)
    swapped = _padded_plane(nx, ny)
    if swapped < as_is:
        return "swap", swapped
    return "asis", as_is


def fits_vmem(shape) -> bool:
    """True when the single-launch kernel's PADDED resident footprint
    fits VMEM in its best orientation (ADVICE r4: no problem-size guard
    meant large grids failed Mosaic compilation at runtime with no
    fallback)."""
    nz = int(shape[0])
    _o, plane = _best_orientation(shape)
    return _RESIDENT_FIELDS * nz * plane * 4 <= _VMEM_BUDGET_BYTES


def _make_kernel(iters: int):
    def kernel(d_ref, pxl_ref, pxr_ref, pyl_ref, pyr_ref, pzl_ref,
               pzr_ref, b_ref, x_ref):
        d = d_ref[...]
        pxl = pxl_ref[...]
        pxr = pxr_ref[...]
        pyl = pyl_ref[...]
        pyr = pyr_ref[...]
        pzl = pzl_ref[...]
        pzr = pzr_ref[...]
        b = b_ref[...]

        zx = jnp.zeros_like(d[:, :, :1])
        zy = jnp.zeros_like(d[:, :1, :])
        zz = jnp.zeros_like(d[:1])

        def mv(x):
            # slice+concatenate instead of .at[].add: Mosaic has no
            # scatter lowering, and these are static shifts anyway
            y = d * x
            y = y + jnp.concatenate([pxl * x[:, :, 1:], zx], axis=2)
            y = y + jnp.concatenate([zx, pxr * x[:, :, :-1]], axis=2)
            y = y + jnp.concatenate([pyl * x[:, 1:, :], zy], axis=1)
            y = y + jnp.concatenate([zy, pyr * x[:, :-1, :]], axis=1)
            y = y + jnp.concatenate([pzl * x[1:], zz], axis=0)
            y = y + jnp.concatenate([zz, pzr * x[:-1]], axis=0)
            return y

        inv_d = 1.0 / jnp.where(jnp.abs(d) > 0, d, 1.0)

        def prec(x):
            return inv_d * x

        def vdot(a, c):
            return jnp.sum(a * c)

        x = jnp.zeros_like(b)
        r = b
        rhat = r
        rho = jnp.float32(1.0)
        alpha = jnp.float32(1.0)
        omega = jnp.float32(1.0)
        p = jnp.zeros_like(b)
        v = jnp.zeros_like(b)
        for _ in range(iters):
            rho_new = vdot(rhat, r)
            safe = jnp.abs(rho * omega) > 1e-30
            beta = jnp.where(
                safe, (rho_new / jnp.where(safe, rho, 1.0))
                * (alpha / jnp.where(safe, omega, 1.0)), 0.0)
            p = r + beta * (p - omega * v)
            phat = prec(p)
            v = mv(phat)
            den = vdot(rhat, v)
            alpha = jnp.where(jnp.abs(den) > 1e-30, rho_new / den, 0.0)
            s = r - alpha * v
            shat = prec(s)
            t = mv(shat)
            tt = vdot(t, t)
            omega_new = jnp.where(
                tt > 0, vdot(t, s) / jnp.where(tt > 0, tt, 1.0), 0.0)
            x = x + alpha * phat + omega_new * shat
            r = s - omega_new * t
            rho, omega = rho_new, omega_new
        x_ref[...] = x

    return kernel


def inner_solve_bands(c, b3, iters: int, interpret: bool = False):
    """Bands-only fixed-iteration BiCGStab, one kernel launch.

    ``c`` is a CprBandedData (solvers/cpr.py); ``b3`` [nz,ny,nx].
    Runs in f32 regardless of the stored dtype (see module docstring:
    f32-only contract) and casts the result back. The COO extras are
    NOT in this operator — callers defect-correct (see module
    docstring).
    """
    f32 = jnp.float32
    orient, _ = _best_orientation(b3.shape)
    if orient == "swap":
        # run in the transposed frame: the x and y band roles swap
        # wholesale (identical math; Mosaic pads the minor dims to
        # (8, 128), so putting the LONG plane dim minor can shrink the
        # resident footprint several-fold — see module constants)
        t = lambda a: jnp.swapaxes(a, 1, 2)  # noqa: E731
        args = [t(c.p_diag), t(c.py_lr), t(c.py_rl), t(c.px_lr),
                t(c.px_rl), t(c.pz_lr), t(c.pz_rl), t(b3)]
        out_shape = args[-1].shape
    else:
        args = [c.p_diag, c.px_lr, c.px_rl, c.py_lr, c.py_rl, c.pz_lr,
                c.pz_rl, b3]
        out_shape = b3.shape
    args = [a.astype(f32) for a in args]
    out = pl.pallas_call(
        _make_kernel(iters),
        out_shape=jax.ShapeDtypeStruct(out_shape, f32),
        interpret=interpret,
    )(*args)
    if orient == "swap":
        out = jnp.swapaxes(out, 1, 2)
    return out.astype(b3.dtype)
