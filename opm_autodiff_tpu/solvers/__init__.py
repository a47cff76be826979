from opm_autodiff_tpu.solvers.linear import solve_linear  # noqa: F401
