"""Linear solver: preconditioned BiCGStab on the block-sparse system.

TPU-native rebuild of the reference's solver stack
(opm/simulators/linalg/ISTLSolverEbos.hpp:243 ``solve``;
FlexibleSolver_impl.hpp:145 bicgstab; the GPU path
bda/cusparseSolverBackend ``gpu_pbicgstab``): a matrix-free BiCGStab in a
``lax.while_loop`` — the whole Krylov iteration is one XLA computation,
no host round-trips per iteration (the reference pays a PCIe copy per
solve; we pay nothing, SURVEY.md §2.9#4).

Preconditioners:
  * block-Jacobi: invert the [3,3] diagonal blocks once per solve —
    embarrassingly parallel, the TPU-friendly default for small cases.
  * more (colored ILU0, CPR/AMG) land in later stages per SURVEY.md §7-7.

Defaults mirror FlowLinearSolverParameters.hpp: reduction 1e-2,
maxiter 200.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from opm_autodiff_tpu.models.assembler import BsrSystem, bsr_matvec


def system_matvec(sys, x):
    """J @ x for either sparse layout (BSR face-list or banded)."""
    from opm_autodiff_tpu.models.structured import (StructuredSystem,
                                                    structured_matvec)

    if isinstance(sys, StructuredSystem):
        return structured_matvec(sys, x)
    return bsr_matvec(sys, x)


def _scale_system(sys, row, col, dtype):
    """Row/column-equilibrated cast of either system layout."""
    from opm_autodiff_tpu.models.structured import StructuredSystem

    dscaled = (sys.diag * row[:, :, None] * col[:, None, :]).astype(dtype)
    # the storage jacobian scales like the diagonal so true-IMPES
    # weights built from the scaled system stay consistent with it
    aj = (None if sys.acc_jac is None else
          (sys.acc_jac * row[:, :, None] * col[:, None, :]).astype(dtype))
    if isinstance(sys, StructuredSystem):
        nz, ny, nxm = sys.x_lr.shape[:3]
        nx = nxm + 1
        nb = sys.diag.shape[-1]
        r3 = row.reshape(nz, ny, nx, nb)
        c3 = col.reshape(nz, ny, nx, nb)

        def sc(band, rsl, csl):
            return (band * rsl[..., :, None] * csl[..., None, :]).astype(dtype)

        ex = {}
        if sys.ex_left is not None:
            ex = dict(
                ex_lr=sc(sys.ex_lr, row[sys.ex_left], col[sys.ex_right]),
                ex_rl=sc(sys.ex_rl, row[sys.ex_right], col[sys.ex_left]))
        return sys._replace(
            diag=dscaled, acc_jac=aj,
            x_lr=sc(sys.x_lr, r3[:, :, :-1], c3[:, :, 1:]),
            x_rl=sc(sys.x_rl, r3[:, :, 1:], c3[:, :, :-1]),
            y_lr=sc(sys.y_lr, r3[:, :-1, :], c3[:, 1:, :]),
            y_rl=sc(sys.y_rl, r3[:, 1:, :], c3[:, :-1, :]),
            z_lr=sc(sys.z_lr, r3[:-1], c3[1:]),
            z_rl=sc(sys.z_rl, r3[1:], c3[:-1]), **ex)
    return BsrSystem(
        residual=sys.residual,
        diag=dscaled, acc_jac=aj,
        off_lr=(sys.off_lr * row[sys.left][:, :, None]
                * col[sys.right][:, None, :]).astype(dtype),
        off_rl=(sys.off_rl * row[sys.right][:, :, None]
                * col[sys.left][:, None, :]).astype(dtype),
        left=sys.left, right=sys.right,
        ell_face=sys.ell_face, ell_nbr=sys.ell_nbr,
        ell_left=sys.ell_left)


class LinearSolveResult(NamedTuple):
    x: jnp.ndarray          # [N,3]
    iterations: jnp.ndarray  # int
    rel_residual: jnp.ndarray
    converged: jnp.ndarray  # bool


def _dot(a, b):
    return jnp.vdot(a.reshape(-1), b.reshape(-1))


def invert_blocks(diag: jnp.ndarray) -> jnp.ndarray:
    """Batched 3x3 block inversion via the cofactor (adjugate) formula.

    The reference keeps explicit D^-1 too (MatrixBlock stable in-place
    inversion; StandardWell invDuneD_). Closed-form instead of
    ``jnp.linalg.inv``: XLA's TPU LuDecomposition only supports f32, and
    the cofactor form is branch-free and fuses into surrounding code.
    """
    a = diag
    if a.shape[-1] == 4:
        # bordered form for the implicit-polymer 4x4 blocks: invert the
        # 3x3 black-oil block by cofactors, eliminate the polymer
        # row/column by its scalar Schur complement (branch-free, no LU
        # — TPU LuDecomposition is f32-only)
        ainv = invert_blocks(a[..., :3, :3])          # [...,3,3]
        bcol = a[..., :3, 3:]                          # [...,3,1]
        crow = a[..., 3:, :3]                          # [...,1,3]
        d = a[..., 3:, 3:]                             # [...,1,1]
        aib = ainv @ bcol                              # [...,3,1]
        cai = crow @ ainv                              # [...,1,3]
        s = d - crow @ aib                             # [...,1,1]
        s_inv = 1.0 / s
        top_left = ainv + aib * s_inv * cai
        top_right = -aib * s_inv
        bot_left = -s_inv * cai
        top = jnp.concatenate([top_left, top_right], axis=-1)
        bot = jnp.concatenate([bot_left, s_inv], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)
    if a.shape[-1] != 3:
        return jnp.linalg.inv(a)
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = (a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02)
    inv_det = 1.0 / det
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return adj * inv_det[..., None, None]


def block_jacobi_apply(inv_diag: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("nij,nj->ni", inv_diag, r)


def bicgstab(matvec: Callable, precond: Callable, b: jnp.ndarray,
             x0: jnp.ndarray | None = None, tol: float = 1e-2,
             maxiter: int = 200) -> LinearSolveResult:
    """Right-preconditioned BiCGStab; ``tol`` is relative residual reduction.

    Entirely jit-compatible: fixed-bound while_loop, breakdown guards as
    status flags (the reference throws; we surface codes — SURVEY.md §7-6).
    """
    if x0 is None:
        x0 = jnp.zeros_like(b)
        r0 = b  # skip the b - A@0 matvec
    else:
        r0 = b - matvec(x0)
    bnorm = jnp.sqrt(jnp.real(_dot(b, b)))
    bnorm = jnp.where(bnorm > 0, bnorm, 1.0)
    # absolute floor: an (equilibrated) rhs this small means the Newton
    # iterate is already converged — dx = 0 is the correct step, and
    # iterating would only break down on f32-underflowed dot products
    # (dune-istl's solvers likewise accept on the initial defect)
    target = jnp.maximum(tol * bnorm, jnp.asarray(1e-25, b.dtype))

    eps_breakdown = 1e-140

    def cond(carry):
        (x, r, rhat, p, v, rho, alpha, omega, k, ok) = carry
        rnorm = jnp.sqrt(jnp.real(_dot(r, r)))
        return jnp.logical_and(jnp.logical_and(rnorm > target, k < maxiter), ok)

    def safediv(a, b):
        good = jnp.abs(b) > eps_breakdown
        return jnp.where(good, a / jnp.where(good, b, 1.0), 0.0), good

    def body(carry):
        (x, r, rhat, p, v, rho, alpha, omega, k, ok) = carry
        rho_new = _dot(rhat, r)
        f1, _ = safediv(rho_new, rho)
        f2, _ = safediv(alpha, omega)
        beta = f1 * f2
        p = r + beta * (p - omega * v)
        phat = precond(p)
        v = matvec(phat)
        denom = _dot(rhat, v)
        alpha, alpha_ok = safediv(rho_new, denom)
        s = r - alpha * v
        shat = precond(s)
        t = matvec(shat)
        tt = _dot(t, t)
        # t ~ 0 means s ~ 0 (converged within the step): omega = 0 keeps
        # the s-update only and the residual check exits next iteration
        omega_new, _ = safediv(_dot(t, s), tt)
        x = x + alpha * phat + omega_new * shat
        r = s - omega_new * t
        ok = jnp.logical_and(jnp.abs(rho_new) > eps_breakdown, alpha_ok)
        ok = jnp.logical_and(ok, jnp.all(jnp.isfinite(r)))
        return (x, r, rhat, p, v, rho_new, alpha, omega_new, k + 1, ok)

    one = jnp.asarray(1.0, b.dtype)
    init = (x0, r0, r0, jnp.zeros_like(b), jnp.zeros_like(b),
            one, one, one, jnp.asarray(0), jnp.asarray(True))
    (x, r, *_, k, ok) = jax.lax.while_loop(cond, body, init)
    rel = jnp.sqrt(jnp.real(_dot(r, r))) / bnorm
    return LinearSolveResult(x=x, iterations=k, rel_residual=rel,
                             converged=rel <= tol)


# ---------------------------------------------------------------------------
# Z-line block-tridiagonal preconditioner (structured grids)
# ---------------------------------------------------------------------------
# One exact block-Thomas solve along every vertical column (the gravity-
# segregated flow direction, where the stencil is stiffest), Jacobi
# between columns. The reference's analog is line/level-scheduled ILU
# (bda/BILU0 reorderings); on TPU the columns batch perfectly: the scan
# runs nz sequential steps of [ny*nx, 3, 3] dense math.


def build_zline(sys):
    """Factor the per-column block tridiagonal of a StructuredSystem
    (block-size generic: 3x3 black-oil or 4x4 extension blocks — the
    4x4 inverse rides the bordered form in invert_blocks)."""
    nz, ny, nxm = sys.x_lr.shape[:3]
    nx = nxm + 1
    nb = sys.diag.shape[-1]
    D = sys.diag.reshape(nz, ny, nx, nb, nb)
    zero = jnp.zeros((1, ny, nx, nb, nb), D.dtype)
    # row k couples to k+1 via z_lr[k] (upper) and row k+1 to k via z_rl[k]
    U = jnp.concatenate([sys.z_lr, zero], axis=0)    # [nz, ...]
    L = jnp.concatenate([zero, sys.z_rl], axis=0)    # [nz, ...] row k col k-1

    def step(cprev, inp):
        Dk, Lk, Uk = inp
        denom = Dk - jnp.einsum("...ij,...jk->...ik", Lk, cprev)
        inv = invert_blocks(denom)
        ck = jnp.einsum("...ij,...jk->...ik", inv, Uk)
        return ck, (inv, ck)

    c0 = jnp.zeros((ny, nx, nb, nb), D.dtype)
    _, (inv, c) = jax.lax.scan(step, c0, (D, L, U))
    return (inv, c, L)


def zline_apply(fact, r):
    """Apply the factored z-line preconditioner to r [N,nb]."""
    inv, c, L = fact
    nz, ny, nx = inv.shape[:3]
    nb = inv.shape[-1]
    r3 = r.reshape(nz, ny, nx, nb)

    def fwd(dprev, inp):
        invk, Lk, rk = inp
        dk = jnp.einsum("...ij,...j->...i",
                        invk, rk - jnp.einsum("...ij,...j->...i", Lk,
                                              dprev))
        return dk, dk

    d0 = jnp.zeros((ny, nx, nb), r3.dtype)
    _, d = jax.lax.scan(fwd, d0, (inv, L, r3))

    def bwd(xnext, inp):
        dk, ck = inp
        xk = dk - jnp.einsum("...ij,...j->...i", ck, xnext)
        return xk, xk

    _, x = jax.lax.scan(bwd, jnp.zeros((ny, nx, nb), r3.dtype), (d, c),
                        reverse=True)
    return x.reshape(-1, nb)


def solve_linear(sys: BsrSystem, b: jnp.ndarray | None = None,
                 extra_matvec: Callable | None = None,
                 tol: float = 1e-2, maxiter: int = 200,
                 dtype=None, precond: str = "jacobi",
                 cpr_inner_iters: int = 12,
                 method: str | None = None,
                 setup=None, want_setup: bool = False):
    """Solve J dx = b (default b = -residual) with block-Jacobi BiCGStab.

    ``extra_matvec(x)`` adds terms to J@x — the well Schur complement
    rides here (reference: WellOperators.hpp:99 WellModelMatrixAdapter
    fuses y -= C^T D^-1 B x into the operator).

    Mixed precision: the Krylov iteration runs in ``dtype`` (f32 by
    default — native TPU speed; f64 is software-emulated on TPU). The
    default 1e-2 reduction target (FlowLinearSolverParameters.hpp:144)
    is far above f32 roundoff; the f64 Newton loop outside corrects any
    residual error. The reference contemplated the same trade
    (BlackoilModelEbos.hpp:330). To scale the system for f32 range, rows
    are equilibrated by the inf-norm of their diagonal block first.

    Setup reuse (reference: FlowLinearSolverParameters
    linear_solver_reuse-style policies + the CPR reuse ladder,
    ISTLSolverEbos.hpp:401-426): pass ``setup`` (a factorization pytree
    returned by an earlier call with ``want_setup=True``) to skip the
    preconditioner build and apply the stale factors — valid because a
    preconditioner need not track the Jacobian exactly, only stay
    spectrally close. Reusable for zline/ilu0/jacobi; the cpr variants
    always rebuild (their coarse hierarchy closes over the system).
    With ``want_setup``, returns (result, setup_pytree_or_None).
    """
    if b is None:
        b = -sys.residual
    f64 = sys.residual.dtype
    if method is None:
        # Every CPR variant's apply contains an inner Krylov somewhere
        # (the pressure stage or the AMG coarsest level) — a NONLINEAR
        # operator: use the flexible outer solver (see solvers/fgmres.py)
        method = ("fgmres" if precond in ("cpr", "cprt", "cpramg",
                                          "cpramgt") else "bicgstab")
    if dtype is None:
        # f32 roundoff ~1e-7; pick it automatically for loose reductions
        dtype = jnp.float32 if tol >= 1e-5 else f64

    if dtype != f64 or jnp.dtype(dtype) == jnp.dtype(jnp.float32):
        # Row + column equilibration so both matrix entries AND the
        # solution components are O(1) in f32: the raw unknowns span ~1e10
        # (dp ~ 1e5 Pa vs dSw ~ 1e-3), which f32 cannot carry in one
        # vector. Solve (R A C) y = R b, then dx = C y. (Also taken when
        # the SYSTEM is already stored f32 — banded fast paths — where
        # the casts below become no-ops but the scaling still matters.)
        tiny = jnp.finfo(sys.diag.dtype).tiny
        row = 1.0 / jnp.maximum(jnp.abs(sys.diag).max(axis=2), tiny)  # [N,3]
        dscaled = sys.diag * row[:, :, None]
        col = 1.0 / jnp.maximum(jnp.abs(dscaled).max(axis=1), tiny)  # [N,3]
        scaled = _scale_system(sys, row, col, dtype)
        b_s = (b * row).astype(dtype)
        row32 = row.astype(dtype)
        col64 = col

        from opm_autodiff_tpu.models.structured import StructuredSystem
        from opm_autodiff_tpu.ops import pallas_spmv

        from opm_autodiff_tpu.parallel import shard_kernels as sk
        from opm_autodiff_tpu.parallel.mesh import get_active_mesh

        mesh = get_active_mesh()
        # the Pallas SpMV/zline kernels unroll the block algebra for the
        # 3x3 black-oil and 4x4 extension blocks (ops/pallas_zline.py)
        nb_ok = scaled.diag.shape[-1] in (3, 4)
        sharded = (mesh is not None and sk.kernels_enabled(mesh) and nb_ok
                   and isinstance(scaled, StructuredSystem)
                   and scaled.diag.shape[0]
                   % (mesh.devices.size * scaled.x_lr.shape[1]
                      * (scaled.x_lr.shape[2] + 1)) == 0)
        prec = None
        setup_out = None
        cpr_smooth = None
        if sharded:
            # multi-chip: shard_mapped SpMV (per-matvec x halo exchange)
            # + per-slab Schwarz z-line (parallel/shard_kernels.py)
            prep_ext = sk.prepare_banded_sharded(mesh, scaled)
            if scaled.ex_left is None:
                base_mv = partial(sk.banded_spmv_sharded, mesh, prep_ext)
            else:
                def base_mv(y, _s=scaled, _p=prep_ext):
                    z = sk.banded_spmv_sharded(mesh, _p, y)
                    z = z.at[_s.ex_left].add(
                        jnp.einsum("fij,fj->fi", _s.ex_lr, y[_s.ex_right]))
                    z = z.at[_s.ex_right].add(
                        jnp.einsum("fij,fj->fi", _s.ex_rl, y[_s.ex_left]))
                    return z
            if precond == "zline":
                # no setup reuse here: the sharded fact carries a static
                # interpret flag that must not round-trip through the
                # jit boundary as a traced leaf
                fact = sk.prepare_zline_sharded(mesh, scaled)
                prec = partial(sk.zline_apply_sharded, mesh, fact)
        elif (isinstance(scaled, StructuredSystem) and nb_ok
                and pallas_spmv.enabled()):
            prep = pallas_spmv.prepare_banded(scaled)
            if scaled.ex_left is None:
                base_mv = partial(pallas_spmv.banded_spmv_pallas, prep)
            else:
                def base_mv(y, _s=scaled, _p=prep):
                    z = pallas_spmv.banded_spmv_pallas(_p, y)
                    z = z.at[_s.ex_left].add(
                        jnp.einsum("fij,fj->fi", _s.ex_lr, y[_s.ex_right]))
                    z = z.at[_s.ex_right].add(
                        jnp.einsum("fij,fj->fi", _s.ex_rl, y[_s.ex_left]))
                    return z
            if precond == "zline":
                # single-launch Pallas block-Thomas (4.6x the XLA scan,
                # and full-f32 where XLA's einsum rounds through bf16)
                from opm_autodiff_tpu.ops import pallas_zline

                fact = (setup if setup is not None
                        else pallas_zline.prepare_zline(prep))
                prec = partial(pallas_zline.zline_apply_pallas, fact)
                setup_out = fact
            elif precond in ("cpr", "cprt"):
                # z-line block-Thomas as the CPR fine smoother (the
                # banded analog of the reference's ParOverILU0
                # finesmoother): one extra Pallas launch per apply for
                # roughly half the outer Krylov iterations
                from opm_autodiff_tpu.ops import pallas_zline

                zfact = pallas_zline.prepare_zline(prep)
                cpr_smooth = partial(pallas_zline.zline_apply_pallas,
                                     zfact)
        else:
            base_mv = partial(system_matvec, scaled)
            if (not isinstance(scaled, StructuredSystem)
                    and getattr(scaled, "ell_face", None) is not None):
                # face-list layout: hoist the ELL block gather out of
                # the Krylov loop (assembler.prepare_bsr_ell)
                from opm_autodiff_tpu.models.assembler import (
                    bsr_matvec_ell, prepare_bsr_ell)

                ell_blocks = prepare_bsr_ell(scaled)
                base_mv = partial(bsr_matvec_ell, scaled, ell_blocks)

        col32 = col64.astype(dtype)

        def matvec(y):
            z = base_mv(y)
            if extra_matvec is not None:
                # stays in the Krylov dtype end-to-end: the well Schur
                # matvecs compute in x.dtype (wells/standard4.py), so no
                # full-length f64 scale/cast passes ride every iteration
                x = y * col32
                z = z + extra_matvec(x).astype(dtype) * row32
            return z

        if prec is None:
            prec, setup_out = _setup_and_precond(
                precond, scaled, cpr_inner_iters, setup,
                col_p=col64[:, 0].astype(dtype), smooth=cpr_smooth)
        res = _run(method, matvec, prec, b_s, tol, maxiter)
        out = LinearSolveResult(x=res.x.astype(f64) * col64,
                                iterations=res.iterations,
                                rel_residual=res.rel_residual.astype(f64),
                                converged=res.converged)
        return (out, setup_out) if want_setup else out

    def matvec(x):
        y = system_matvec(sys, x)
        if extra_matvec is not None:
            y = y + extra_matvec(x)
        return y

    prec, setup_out = _setup_and_precond(precond, sys, cpr_inner_iters,
                                         setup)
    res = _run(method, matvec, prec, b, tol, maxiter)
    return (res, setup_out) if want_setup else res


def _run(method: str, matvec, prec, b, tol, maxiter):
    if method == "fgmres":
        from opm_autodiff_tpu.solvers.fgmres import fgmres

        # restart 8 (was 15): steady-state CPR solves converge in 1-4
        # Arnoldi steps, and the V/Z basis buffers, masked CGS2 matmuls
        # and Givens chains all scale with the restart window — on the
        # dispatch-latency-bound attachment the smaller window measured
        # faster with no iteration-count change; hard systems just take
        # more cycles (max_cycles scales to keep maxiter total steps)
        restart = 8
        return fgmres(matvec, prec, b, tol=tol,
                      max_cycles=max(maxiter // restart, 1), restart=restart)
    if method == "bicgstab":
        return bicgstab(matvec, prec, b, tol=tol, maxiter=maxiter)
    raise ValueError(f"unknown method {method!r}")


def _setup_and_precond(name: str, sys, cpr_inner_iters: int, setup,
                       col_p=None, smooth=None):
    """Build (or reuse) the preconditioner setup for ``name``.

    Returns (apply_fn, reusable_setup_or_None). The zline / ilu0 /
    jacobi factorizations are plain array pytrees and can be carried
    across Newton iterations (reference setup-reuse policies,
    ISTLSolverEbos.hpp:401-426); the cpr variants close over the system
    and always rebuild (setup None).
    """
    from opm_autodiff_tpu.models.structured import StructuredSystem

    eff = name
    if eff == "zline" and not isinstance(sys, StructuredSystem):
        eff = "ilu0"
    if eff == "ilu0" and isinstance(sys, StructuredSystem):
        eff = "zline"
    if sys.diag.shape[-1] not in (3, 4) and eff.startswith("cpr"):
        # quasi/true-IMPES weights need the closed-form block inverse
        # (3x3 cofactor / 4x4 bordered Schur, invert_blocks); other
        # block sizes take the strongest layout-matched smoother
        eff = "zline" if isinstance(sys, StructuredSystem) else "ilu0"
    if eff == "zline":
        fact = setup if setup is not None else build_zline(sys)
        return partial(zline_apply, fact), fact
    if eff == "ilu0":
        from opm_autodiff_tpu.solvers.ilu import build_cpilu0, cpilu0_apply

        fact = setup if setup is not None else build_cpilu0(sys)
        return partial(cpilu0_apply, fact), fact
    if eff == "jacobi":
        fact = setup if setup is not None else invert_blocks(sys.diag)
        return partial(block_jacobi_apply, fact), fact
    inv_diag = invert_blocks(sys.diag)
    return _make_precond(name, sys, inv_diag, cpr_inner_iters,
                         col_p=col_p, smooth=smooth), None


def _make_precond(name: str, sys, inv_diag, cpr_inner_iters: int,
                  col_p=None, smooth=None):
    from opm_autodiff_tpu.models.structured import StructuredSystem

    # true-IMPES weight variants (reference: --cpr-weights=trueimpes,
    # ISTLSolverEbos.hpp:447; weights from the storage Jacobian)
    cpr_weights = "quasiimpes"
    if name in ("cpramgt", "cprt"):
        cpr_weights = "trueimpes"
        name = {"cpramgt": "cpramg", "cprt": "cpr"}[name]
    if name == "cpramg":
        # CPR with a multigrid coarse pressure solve (the reference
        # default two-level cpr: fine smoother + 1 AMG V-cycle,
        # setupPropertyTree.cpp:95-120). Linear apply -> BiCGStab-safe.
        if isinstance(sys, StructuredSystem):
            from opm_autodiff_tpu.solvers.cpr import (build_cpr_banded,
                                                      build_gmg_hierarchy,
                                                      cpr_banded_apply_gmg)

            cprb = build_cpr_banded(sys, inv_diag, weights=cpr_weights,
                                    col_p=col_p)
            hier = build_gmg_hierarchy(cprb)
            return lambda r: cpr_banded_apply_gmg(cprb, sys, r, hier)
        # face-list (BSR) layout: aggregation-AMG coarse stage +
        # Chow-Patel ILU0 fine smoothing (solvers/amg.py; the
        # reference's amgcpr.hh analog for general sparsity)
        from opm_autodiff_tpu.solvers.cpr import (build_amg_hierarchy,
                                                  build_cpr, cpr_apply_amg)
        from opm_autodiff_tpu.solvers.ilu import build_cpilu0, cpilu0_apply

        cpr = build_cpr(sys, inv_diag, weights=cpr_weights,
                        col_p=col_p)
        hier = build_amg_hierarchy(cpr)
        fact = build_cpilu0(sys)
        smooth = partial(cpilu0_apply, fact)
        return lambda r: cpr_apply_amg(cpr, sys, r, hier, smooth=smooth)
    if name == "cpr":
        if isinstance(sys, StructuredSystem):
            from opm_autodiff_tpu.solvers.cpr import (build_cpr_banded,
                                                      cpr_banded_apply)

            cprb = build_cpr_banded(sys, inv_diag, weights=cpr_weights,
                                    col_p=col_p)
            return lambda r: cpr_banded_apply(cprb, sys, r,
                                              inner_iters=cpr_inner_iters,
                                              smooth=smooth)
        from opm_autodiff_tpu.solvers.cpr import build_cpr, cpr_apply
        from opm_autodiff_tpu.solvers.ilu import build_cpilu0, cpilu0_apply

        cpr = build_cpr(sys, inv_diag, weights=cpr_weights,
                        col_p=col_p)
        # fine smoother: Chow-Patel block-ILU0, the BSR-path analog of
        # the reference's ParOverILU0 finesmoother
        fact = build_cpilu0(sys)
        smooth = partial(cpilu0_apply, fact)
        return lambda r: cpr_apply(cpr, sys, r,
                                   inner_iters=cpr_inner_iters,
                                   smooth=smooth)
    if name == "zline":
        if not isinstance(sys, StructuredSystem):
            # unstructured fallback: Chow-Patel block-ILU0 (the BSR-path
            # answer to the reference's ILU0; solvers/ilu.py)
            return _make_precond("ilu0", sys, inv_diag, cpr_inner_iters)
        fact = build_zline(sys)
        return partial(zline_apply, fact)
    if name == "ilu0":
        if isinstance(sys, StructuredSystem):
            # banded layout: the z-line block-Thomas IS the structured
            # ILU-class smoother (exact in z, Jacobi across columns)
            fact = build_zline(sys)
            return partial(zline_apply, fact)
        from opm_autodiff_tpu.solvers.ilu import build_cpilu0, cpilu0_apply

        fact = build_cpilu0(sys)
        return partial(cpilu0_apply, fact)
    if name == "jacobi":
        return partial(block_jacobi_apply, inv_diag)
    raise ValueError(f"unknown preconditioner {name!r}")
