"""Linear solver tests on synthetic block systems (SURVEY.md §4: solve
small systems like the reference's test_flexiblesolver on matr33)."""

import pytest as _pytest

pytestmark = _pytest.mark.smoke


import jax.numpy as jnp
import numpy as np
import pytest

from opm_autodiff_tpu.models.assembler import BsrSystem, bsr_matvec
from opm_autodiff_tpu.solvers.linear import bicgstab, solve_linear


def _chain_system(n=40, seed=0, coupling=0.3):
    """1D chain of 3x3 blocks: diagonally-dominant random system."""
    rng = np.random.default_rng(seed)
    left = np.arange(n - 1, dtype=np.int32)
    right = left + 1
    off_lr = coupling * rng.standard_normal((n - 1, 3, 3))
    off_rl = coupling * rng.standard_normal((n - 1, 3, 3))
    diag = rng.standard_normal((n, 3, 3))
    diag += np.einsum("ij,kl->ikl", np.zeros((1, 1)), np.zeros((1, 1))).sum() \
        if False else 0
    for i in range(n):
        diag[i] += np.eye(3) * (3.0 + np.abs(off_lr).sum() / n
                                + np.abs(off_rl).sum() / n)
    r = rng.standard_normal((n, 3))
    return BsrSystem(residual=jnp.asarray(r), diag=jnp.asarray(diag),
                     off_lr=jnp.asarray(off_lr), off_rl=jnp.asarray(off_rl),
                     left=jnp.asarray(left), right=jnp.asarray(right))


def _to_dense(sys):
    n = sys.num_cells
    a = np.zeros((n * 3, n * 3))
    d = np.asarray(sys.diag)
    for i in range(n):
        a[3 * i:3 * i + 3, 3 * i:3 * i + 3] = d[i]
    ol = np.asarray(sys.off_lr)
    orl = np.asarray(sys.off_rl)
    for f, (l, r) in enumerate(zip(np.asarray(sys.left),
                                   np.asarray(sys.right))):
        a[3 * l:3 * l + 3, 3 * r:3 * r + 3] += ol[f]
        a[3 * r:3 * r + 3, 3 * l:3 * l + 3] += orl[f]
    return a


def test_matvec_matches_dense():
    sys = _chain_system()
    a = _to_dense(sys)
    x = np.random.default_rng(1).standard_normal((sys.num_cells, 3))
    y = np.asarray(bsr_matvec(sys, jnp.asarray(x)))
    np.testing.assert_allclose(y.reshape(-1), a @ x.reshape(-1), rtol=1e-12)


def test_bicgstab_solves():
    sys = _chain_system()
    a = _to_dense(sys)
    res = solve_linear(sys, tol=1e-10, maxiter=500)
    assert bool(res.converged)
    x_ref = np.linalg.solve(a, -np.asarray(sys.residual).reshape(-1))
    np.testing.assert_allclose(np.asarray(res.x).reshape(-1), x_ref,
                               rtol=1e-6, atol=1e-8)


def test_bicgstab_reduction_target():
    sys = _chain_system(n=100, coupling=0.6, seed=3)
    res = solve_linear(sys, tol=1e-2, maxiter=200)
    assert bool(res.converged)
    assert float(res.rel_residual) <= 1e-2
    assert int(res.iterations) < 60


def test_extra_matvec():
    """Rank-1 modification through extra_matvec changes the solution."""
    sys = _chain_system(n=10)
    v = jnp.ones((10, 3)) * 0.01

    def extra(x):
        return v * jnp.sum(v * x)

    a = _to_dense(sys) + 0.01 ** 2 * np.outer(np.ones(30), np.ones(30))
    res = solve_linear(sys, extra_matvec=extra, tol=1e-12, maxiter=500)
    x_ref = np.linalg.solve(a, -np.asarray(sys.residual).reshape(-1))
    np.testing.assert_allclose(np.asarray(res.x).reshape(-1), x_ref,
                               rtol=1e-6, atol=1e-9)


def test_breakdown_reported():
    """Singular system must report non-convergence, not NaN-loop."""
    n = 4
    diag = np.zeros((n, 3, 3))
    sys = BsrSystem(residual=jnp.asarray(np.ones((n, 3))),
                    diag=jnp.asarray(diag + np.eye(3) * 0.0),
                    off_lr=jnp.zeros((0, 3, 3)), off_rl=jnp.zeros((0, 3, 3)),
                    left=jnp.zeros(0, jnp.int32),
                    right=jnp.zeros(0, jnp.int32))
    # fully singular: block-jacobi inverse produces inf/nan; solver must not
    # report success
    res = solve_linear(sys, tol=1e-8, maxiter=20)
    assert not bool(res.converged)


def test_cpr_fgmres_path():
    """CPR + FGMRES (the scalable path for stiff systems) solves too."""
    sys = _chain_system(n=60, coupling=0.5, seed=7)
    res = solve_linear(sys, tol=1e-3, maxiter=150, precond="cpr",
                       method="fgmres")
    assert bool(res.converged)
    a = _to_dense(sys)
    x_ref = np.linalg.solve(a, -np.asarray(sys.residual).reshape(-1))
    err = np.abs(np.asarray(res.x).reshape(-1) - x_ref).max()
    assert err < 1e-2 * np.abs(x_ref).max()


def test_setup_reuse_matches_rebuild():
    """linear_setup_reuse='substep': applying iteration-0 factors for
    the whole substep (reference reuse policies,
    ISTLSolverEbos.hpp:401-426) converges to the same state as
    rebuilding every iteration."""
    import os
    import tempfile

    import jax.numpy as jnp

    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
    from opm_autodiff_tpu.solvers.newton import NewtonParams
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    path = os.path.join(tempfile.mkdtemp(), "SPE1R.DATA")
    write_spe1_deck(path, 6, 6, 3)
    text = open(path).read().replace(
        "TSTEP", "TSTEP\n 1 5 10 /\nEND\nDUMMY", 1)
    # keep only the first TSTEP
    text = text.split("DUMMY")[0]
    open(path, "w").write(text)

    def run(reuse):
        sim = Simulator(load_state(path), SimulatorOptions(
            newton=NewtonParams(linear_setup_reuse=reuse)))
        sim.run()
        return np.asarray(sim.u), sim.report

    u_never, rep_never = run("never")
    u_sub, rep_sub = run("substep")
    np.testing.assert_allclose(u_sub, u_never, rtol=1e-4)
    # the stale preconditioner may cost a few extra Krylov iterations
    # but not an explosion
    it_n = sum(s.linear_iterations for s in rep_never.steps)
    it_s = sum(s.linear_iterations for s in rep_sub.steps)
    assert it_s <= max(2 * it_n, it_n + 20)


def test_setup_reuse_with_cpr_rebuilds():
    """linear_setup_reuse='substep' with a CPR preconditioner: the CPR
    hierarchy is not reusable and must silently rebuild each iteration
    (setup None round-trips through the Newton state)."""
    import os
    import tempfile

    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
    from opm_autodiff_tpu.solvers.newton import NewtonParams
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck

    path = os.path.join(tempfile.mkdtemp(), "SPE1RC.DATA")
    write_spe1_deck(path, 5, 5, 3)
    text = open(path).read().split("TSTEP")[0] + "TSTEP\n 1 3 /\nEND\n"
    open(path, "w").write(text)
    sim = Simulator(load_state(path), SimulatorOptions(
        newton=NewtonParams(linear_precond="cpramg",
                            linear_setup_reuse="substep")))
    sim.run()
    assert np.isfinite(np.asarray(sim.u)).all()
