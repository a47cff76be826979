"""CPR: two-stage constrained-pressure-residual preconditioner.

Rebuild of the reference's CPR stack (OwningTwoLevelPreconditioner +
PressureTransferPolicy + AMG coarse solve, SURVEY.md §2.6):

  1. quasi-IMPES weights w_i = D_i^-T e_p  (getQuasiImpesWeights.hpp:48-78)
     decouple saturation columns from the weighted pressure equation;
  2. restrict: r_p = w . r; scalar pressure matrix A_p = w . J[:, p-col];
  3. coarse solve: where the reference runs one AMG V-cycle (amgcpr.hh),
     the TPU build runs a fixed small number of Jacobi-preconditioned
     BiCGStab iterations on the scalar system — fixed iteration count
     keeps the whole apply inside one XLA computation and avoids AMG's
     sequential setup (SURVEY.md §7 hard part 1);
  4. prolong + fine smoothing with block-Jacobi (the reference uses
     ILU0; colored ILU lands later).

All shapes static; the apply is (mildly) nonlinear in r because of the
inner Krylov — acceptable at the outer 1e-2 reduction target, mirroring
industry practice of loose CPR tolerances.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.models.assembler import BsrSystem, bsr_matvec


class CprData(NamedTuple):
    weights: jnp.ndarray      # [N,nb] quasi-IMPES weights
    p_diag: jnp.ndarray       # [N] scalar pressure matrix diagonal
    p_off_lr: jnp.ndarray     # [F]
    p_off_rl: jnp.ndarray     # [F]
    inv_diag: jnp.ndarray     # [N,nb,nb] block-Jacobi of the full system
    left: jnp.ndarray
    right: jnp.ndarray
    # f32 de-similarity map: the Krylov-level row+column equilibration
    # turns the pressure operator into Γ^-1 A_p Γ with γ the pressure-
    # column factors — a similarity that wrecks its near-symmetry and
    # diagonal dominance (off-diag rows up to 4.4x the unit diagonal on
    # a 1e4-contrast faulted case, diverging the AMG V-cycle;
    # tests/test_f32_scale.py). When set, p_off_* store the DE-SCALED
    # (raw-similarity) entries and the pressure stage solves
    # A_p y = γ·r_p, dp = y/γ — exact in exact arithmetic, and the
    # hierarchy sees the well-behaved raw operator.
    gamma: jnp.ndarray | None = None


def _solve_transpose_3x3(diag, e_idx: int):
    """w = D^-T e: per-cell transposed block solves (closed form; 3x3
    cofactor or 4x4 bordered Schur via invert_blocks)."""
    from opm_autodiff_tpu.solvers.linear import invert_blocks

    inv_t = jnp.swapaxes(invert_blocks(diag), -1, -2)
    return inv_t[..., :, e_idx]  # [N,3]


def trueimpes_weights(acc_jac, pressure_var: int = 0,
                      pressure_scale: float = 50e5):
    """True-IMPES weights from the storage-term Jacobian
    (reference: getQuasiImpesWeights.hpp:89 getTrueImpesWeights —
    block = d storage/du with the pressure column scaled by 50 bar,
    w = block^-T e_p, /1000 to land near O(1))."""
    scale = (jnp.ones(acc_jac.shape[-1], acc_jac.dtype)
             .at[pressure_var].set(pressure_scale))
    block = acc_jac * scale[None, None, :]
    w = _solve_transpose_3x3(block, pressure_var) / 1000.0
    return jnp.where(jnp.isfinite(w), w, 0.0)


def _weights(sys, pressure_var: int, mode: str):
    """quasiimpes: D^-T e_p from the full diagonal; trueimpes: from the
    storage Jacobian (falls back to quasi when unavailable)."""
    if mode == "trueimpes" and sys.acc_jac is not None:
        return trueimpes_weights(sys.acc_jac, pressure_var)
    w = _solve_transpose_3x3(sys.diag, pressure_var)
    return jnp.where(jnp.isfinite(w), w, 0.0)


def build_cpr(sys: BsrSystem, inv_diag: jnp.ndarray,
              pressure_var: int = 0,
              weights: str = "quasiimpes",
              col_p: jnp.ndarray | None = None) -> CprData:
    """``col_p`` [N]: the pressure-column equilibration factors of a
    row+column-scaled ``sys`` (solve_linear's f32 path). See
    CprData.gamma."""
    # quasi-IMPES: w . diag[:,:,p] == 1 by construction of D^-T e
    w = _weights(sys, pressure_var, weights)
    p_diag = jnp.einsum("ni,nip->n", w,
                        sys.diag[:, :, pressure_var:pressure_var + 1])
    p_off_lr = jnp.einsum("fi,fi->f", w[sys.left],
                          sys.off_lr[:, :, pressure_var])
    p_off_rl = jnp.einsum("fi,fi->f", w[sys.right],
                          sys.off_rl[:, :, pressure_var])
    if col_p is not None:
        # undo the similarity: raw_ij = (γ_i / γ_j) scaled_ij
        p_off_lr = p_off_lr * (col_p[sys.left] / col_p[sys.right])
        p_off_rl = p_off_rl * (col_p[sys.right] / col_p[sys.left])
    return CprData(weights=w, p_diag=p_diag, p_off_lr=p_off_lr,
                   p_off_rl=p_off_rl, inv_diag=inv_diag,
                   left=sys.left, right=sys.right, gamma=col_p)


def _pressure_matvec(c: CprData, x):
    y = c.p_diag * x
    y = y.at[c.left].add(c.p_off_lr * x[c.right])
    y = y.at[c.right].add(c.p_off_rl * x[c.left])
    return y


def _pressure_inner_solve(c: CprData, b, iters: int):
    """Fixed-iteration Jacobi-preconditioned BiCGStab on the scalar
    pressure system (stands in for the reference's single AMG V-cycle)."""
    return _pressure_inner_solve_generic(lambda x: _pressure_matvec(c, x),
                                         c.p_diag, b, iters)


def _pressure_inner_solve_generic(mv, diag, b, iters: int, prec=None):
    """Fixed-iteration preconditioned BiCGStab; ``prec`` defaults to
    Jacobi. The fori_loop keeps the whole solve one XLA computation."""
    if prec is None:
        inv_d = 1.0 / jnp.where(jnp.abs(diag) > 0, diag, 1.0)

        def prec(x):
            return inv_d * x

    x = jnp.zeros_like(b)
    r = b
    rhat = r
    rho = jnp.asarray(1.0, b.dtype)
    alpha = jnp.asarray(1.0, b.dtype)
    omega = jnp.asarray(1.0, b.dtype)
    p = jnp.zeros_like(b)
    v = jnp.zeros_like(b)

    def body(i, carry):
        x, r, p, v, rho, alpha, omega = carry
        rho_new = jnp.vdot(rhat, r)
        safe = jnp.abs(rho * omega) > 1e-300
        beta = jnp.where(safe, (rho_new / jnp.where(safe, rho, 1.0))
                         * (alpha / jnp.where(safe, omega, 1.0)), 0.0)
        p = r + beta * (p - omega * v)
        phat = prec(p)
        v = mv(phat)
        den = jnp.vdot(rhat, v)
        alpha = jnp.where(jnp.abs(den) > 1e-300, rho_new / den, 0.0)
        s = r - alpha * v
        shat = prec(s)
        t = mv(shat)
        tt = jnp.vdot(t, t)
        omega_new = jnp.where(tt > 0, jnp.vdot(t, s) / jnp.where(tt > 0, tt, 1.0), 0.0)
        x = x + alpha * phat + omega_new * shat
        r = s - omega_new * t
        return (x, r, p, v, rho_new, alpha, omega_new)

    # unroll: the pressure system is tiny (~230KB at 52k cells) and the
    # loop-carried while-op blocks cross-iteration fusion — unrolled,
    # XLA fuses the axpy/dot chains and overlaps the band shifts, which
    # measures ~2x on the fixed-iteration inner solve
    (x, *_ ) = jax.lax.fori_loop(0, iters, body,
                                 (x, r, p, v, rho, alpha, omega),
                                 unroll=True)
    return x


class CprBandedData(NamedTuple):
    """Scalar pressure system in banded form (structured grids):
    same two-stage CPR but every inner op is a static slice."""

    weights: jnp.ndarray   # [N,nb]
    p_diag: jnp.ndarray    # [nz, ny, nx]
    px_lr: jnp.ndarray     # [nz, ny, nx-1]
    px_rl: jnp.ndarray
    py_lr: jnp.ndarray     # [nz, ny-1, nx]
    py_rl: jnp.ndarray
    pz_lr: jnp.ndarray     # [nz-1, ny, nx]
    pz_rl: jnp.ndarray
    inv_diag: jnp.ndarray  # [N,nb,nb] block-Jacobi of the full system
    # non-band (fault throw / NNC) scalar pressure couplings, COO over
    # flat full-box indices (VERDICT r2 #2: the coarse pressure operator
    # must include the extras)
    ex_left: jnp.ndarray | None = None
    ex_right: jnp.ndarray | None = None
    p_ex_lr: jnp.ndarray | None = None
    p_ex_rl: jnp.ndarray | None = None
    # f32 de-similarity map [nz,ny,nx] (see CprData.gamma)
    gamma: jnp.ndarray | None = None


def build_cpr_banded(sys, inv_diag, pressure_var: int = 0,
                     weights: str = "quasiimpes",
                     col_p: jnp.ndarray | None = None) -> CprBandedData:
    """Quasi/true-IMPES CPR on the StructuredSystem banded layout.
    ``col_p`` [N]: pressure-column equilibration factors (see
    CprData.gamma)."""
    w = _weights(sys, pressure_var, weights)
    nz, ny, nxm = sys.x_lr.shape[:3]
    nx = nxm + 1
    w3 = w.reshape(nz, ny, nx, w.shape[-1])
    p_diag = jnp.einsum("ni,ni->n", w,
                        sys.diag[:, :, pressure_var]).reshape(nz, ny, nx)

    def contract(band, w_row):
        # band [..., 3, 3] row-weighted: w_row . band[..., :, p]
        return jnp.einsum("...i,...i->...", w_row,
                          band[..., :, pressure_var])

    ex = {}
    if sys.ex_left is not None:
        ex = dict(
            ex_left=sys.ex_left, ex_right=sys.ex_right,
            p_ex_lr=contract(sys.ex_lr, w[sys.ex_left]),
            p_ex_rl=contract(sys.ex_rl, w[sys.ex_right]))
    bands = dict(
        px_lr=contract(sys.x_lr, w3[:, :, :-1]),
        px_rl=contract(sys.x_rl, w3[:, :, 1:]),
        py_lr=contract(sys.y_lr, w3[:, :-1, :]),
        py_rl=contract(sys.y_rl, w3[:, 1:, :]),
        pz_lr=contract(sys.z_lr, w3[:-1]),
        pz_rl=contract(sys.z_rl, w3[1:]),
    )
    g = None
    if col_p is not None:
        # undo the similarity: raw_ij = (γ_i / γ_j) scaled_ij
        g = col_p.reshape(nz, ny, nx)
        bands["px_lr"] *= g[:, :, :-1] / g[:, :, 1:]
        bands["px_rl"] *= g[:, :, 1:] / g[:, :, :-1]
        bands["py_lr"] *= g[:, :-1, :] / g[:, 1:, :]
        bands["py_rl"] *= g[:, 1:, :] / g[:, :-1, :]
        bands["pz_lr"] *= g[:-1] / g[1:]
        bands["pz_rl"] *= g[1:] / g[:-1]
        if ex:
            gf = col_p
            ex["p_ex_lr"] = ex["p_ex_lr"] * (gf[sys.ex_left]
                                             / gf[sys.ex_right])
            ex["p_ex_rl"] = ex["p_ex_rl"] * (gf[sys.ex_right]
                                             / gf[sys.ex_left])
    return CprBandedData(
        weights=w,
        p_diag=p_diag,
        inv_diag=inv_diag,
        gamma=g,
        **bands,
        **ex,
    )


def _pressure_inner_solve_banded(c: CprBandedData, b3, iters: int):
    """Inner pressure solve on the banded layout: the single-launch
    Pallas kernel when available (ops/pallas_cprinner.py), with the
    fault/NNC COO extras kept in the effective operator by one defect-
    correction pass (kernel solve -> XLA residual incl. extras ->
    kernel solve on the correction). Falls back to the XLA
    fixed-iteration BiCGStab otherwise."""
    from opm_autodiff_tpu.ops import pallas_cprinner as pci

    if pci.enabled() and pci.fits_vmem(b3.shape):
        dp = pci.inner_solve_bands(c, b3, iters)
        if c.ex_left is not None:
            res = b3 - _pressure_matvec_banded(c, dp)
            dp = dp + pci.inner_solve_bands(c, res, iters)
        return dp
    return _pressure_inner_solve_generic(
        lambda v: _pressure_matvec_banded(c, v), c.p_diag, b3, iters)


def _pressure_matvec_banded(c: CprBandedData, x3):
    y = c.p_diag * x3
    y = y.at[:, :, :-1].add(c.px_lr * x3[:, :, 1:])
    y = y.at[:, :, 1:].add(c.px_rl * x3[:, :, :-1])
    y = y.at[:, :-1, :].add(c.py_lr * x3[:, 1:, :])
    y = y.at[:, 1:, :].add(c.py_rl * x3[:, :-1, :])
    y = y.at[:-1].add(c.pz_lr * x3[1:])
    y = y.at[1:].add(c.pz_rl * x3[:-1])
    if c.ex_left is not None:
        xf = x3.reshape(-1)
        yf = y.reshape(-1)
        yf = yf.at[c.ex_left].add(c.p_ex_lr * xf[c.ex_right])
        yf = yf.at[c.ex_right].add(c.p_ex_rl * xf[c.ex_left])
        y = yf.reshape(y.shape)
    return y


def cpr_banded_apply(c: CprBandedData, sys, r, inner_iters: int = 12,
                     pressure_var: int = 0, smooth=None):
    """Two-stage apply on the banded layout.

    ``smooth(r2) -> x2`` overrides the fine smoother (default
    block-Jacobi). solve_linear passes the z-line block-Thomas apply —
    the banded analog of the reference's ParOverILU0 finesmoother
    (setupPropertyTree.cpp:95-120), which roughly halves the outer
    Krylov iterations on gravity-segregated systems for one extra
    Pallas launch per apply."""
    from opm_autodiff_tpu.models.structured import structured_matvec

    nz, ny, nx = c.p_diag.shape
    r_p = jnp.einsum("ni,ni->n", c.weights, r).reshape(nz, ny, nx)
    if c.gamma is not None:
        r_p = r_p * c.gamma
    dp = _pressure_inner_solve_banded(c, r_p, inner_iters)
    if c.gamma is not None:
        dp = dp / c.gamma
    x1 = jnp.zeros_like(r).at[:, pressure_var].set(dp.reshape(-1))
    r2 = r - structured_matvec(sys, x1)
    if smooth is None:
        x2 = jnp.einsum("nij,nj->ni", c.inv_diag, r2)
    else:
        x2 = smooth(r2)
    return x1 + x2


def build_gmg_hierarchy(c: CprBandedData):
    """Semi-coarsened geometric-multigrid hierarchy of the scalar
    pressure system (reference: the AMG hierarchy amgcpr.hh builds
    algebraically — rebuilt per Newton iteration like cpr_reuse_setup=0).
    Fault/NNC COO extras enter the hierarchy and are Galerkin-restricted
    through every level (solvers/gmg.py)."""
    from opm_autodiff_tpu.solvers.gmg import build_hierarchy

    return build_hierarchy(c.p_diag, c.px_lr, c.px_rl, c.py_lr, c.py_rl,
                           c.pz_lr, c.pz_rl, ex_left=c.ex_left,
                           ex_right=c.ex_right, ex_lr=c.p_ex_lr,
                           ex_rl=c.p_ex_rl)


def cpr_banded_apply_gmg(c: CprBandedData, sys, r, hierarchy,
                         cycles: int = 1, pressure_var: int = 0):
    """Two-stage apply with geometric-multigrid V-cycles as the coarse
    pressure solve (the reference's '1 AMG V-cycle' made geometric —
    SURVEY.md §7 hard part 1). Linear in r, so plain BiCGStab can wrap it."""
    from opm_autodiff_tpu.models.structured import structured_matvec
    from opm_autodiff_tpu.solvers.gmg import level_matvec, vcycle

    nz, ny, nx = c.p_diag.shape
    r_p = jnp.einsum("ni,ni->n", c.weights, r).reshape(nz, ny, nx)
    if c.gamma is not None:
        r_p = r_p * c.gamma
    dp = vcycle(hierarchy, r_p)
    for _ in range(cycles - 1):
        res = r_p - level_matvec(hierarchy[0], dp)
        dp = dp + vcycle(hierarchy, res)
    if c.gamma is not None:
        dp = dp / c.gamma
    x1 = jnp.zeros_like(r).at[:, pressure_var].set(dp.reshape(-1))
    r2 = r - structured_matvec(sys, x1)
    x2 = jnp.einsum("nij,nj->ni", c.inv_diag, r2)
    return x1 + x2


def cpr_apply(c: CprData, sys: BsrSystem, r, inner_iters: int = 12,
              pressure_var: int = 0, smooth=None):
    """Two-stage apply: coarse pressure correction + fine smoothing.

    ``smooth(r2) -> x2`` overrides the fine smoother; default is
    block-Jacobi. The reference's canned cpr uses ParOverILU0 there
    (setupPropertyTree.cpp:95-120) — pass a Chow-Patel ILU0 apply for
    the equivalent (wired in solvers/linear.py _make_precond)."""
    # stage 1: pressure correction (through the de-similarity map when
    # the f32 equilibration is active — see CprData.gamma)
    r_p = jnp.einsum("ni,ni->n", c.weights, r)
    if c.gamma is not None:
        r_p = r_p * c.gamma
    dp = _pressure_inner_solve(c, r_p, inner_iters)
    if c.gamma is not None:
        dp = dp / c.gamma
    x1 = jnp.zeros_like(r).at[:, pressure_var].set(dp)
    # stage 2: fine smoothing on the updated residual
    r2 = r - bsr_matvec(sys, x1)
    if smooth is None:
        x2 = jnp.einsum("nij,nj->ni", c.inv_diag, r2)
    else:
        x2 = smooth(r2)
    return x1 + x2


def build_amg_hierarchy(c: CprData):
    """Aggregation-AMG hierarchy of the scalar pressure system on the
    face-list (BSR) layout (reference: amgcpr.hh's AMG V-cycle —
    solvers/amg.py holds the TPU-shaped rebuild). Used by the 'cpramg'
    preconditioner when the system is not banded."""
    from opm_autodiff_tpu.solvers.amg import build_amg

    return build_amg(c.p_diag, c.left, c.right, c.p_off_lr, c.p_off_rl)


def cpr_apply_amg(c: CprData, sys: BsrSystem, r, hierarchy,
                  inner_iters: int = 4, pressure_var: int = 0,
                  smooth=None):
    """Two-stage apply with an aggregation-AMG-preconditioned inner
    Krylov as the coarse pressure solve (the BSR twin of
    cpr_banded_apply_gmg; reference: amgcpr.hh's V-cycle precondition-
    ing the pressure stage). A BARE V-cycle of piecewise-constant
    aggregation is not a strong enough standalone solve here: in f32 on
    a 1e4-contrast faulted system at dt=365d the outer Krylov stagnated
    (tests/test_f32_scale.py); 4 V-cycle-preconditioned BiCGStab
    iterations converge it. The inner Krylov makes the apply nonlinear
    in r — solve_linear wraps every cpr variant in FGMRES."""
    from opm_autodiff_tpu.solvers.amg import vcycle

    levels, lvl_n = hierarchy
    r_p = jnp.einsum("ni,ni->n", c.weights, r)
    if c.gamma is not None:
        r_p = r_p * c.gamma
    dp = _pressure_inner_solve_generic(
        lambda x: _pressure_matvec(c, x), c.p_diag, r_p, inner_iters,
        prec=lambda x: vcycle(levels, lvl_n, x))
    if c.gamma is not None:
        dp = dp / c.gamma
    x1 = jnp.zeros_like(r).at[:, pressure_var].set(dp)
    r2 = r - bsr_matvec(sys, x1)
    if smooth is None:
        x2 = jnp.einsum("nij,nj->ni", c.inv_diag, r2)
    else:
        x2 = smooth(r2)
    return x1 + x2
