"""Benchmark: Newton cell-updates/sec on a scaled SPE1 model (real TPU).

Metric per BASELINE.json: cell-updates/sec = cells x Newton iterations /
wall time, where each Newton iteration is the full pipeline (property
evaluation, AD assembly, Schur-coupled BiCGStab solve, chopped update) as
one jitted device program.

Baseline: OPM Flow's CPU throughput on comparable black-oil models is
~1e6 cell-updates/sec on a multicore node (derived from the solver-time
measurements in arXiv 2309.11488 — Norne-class models, ~45k cells,
~20-50 ms per assembled+solved Newton iteration on 8-16 cores — and the
reference's own SimulatorReport accounting). vs_baseline = value / 1e6.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CELL_UPDATES_PER_SEC = 1.0e6


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__
    from opm_autodiff_tpu.solvers.newton import (NewtonParams, NewtonState,
                                                 newton_iteration_impl)

    nx = int(os.environ.get("BENCH_NX", "64"))
    ny = int(os.environ.get("BENCH_NY", "64"))
    nz = int(os.environ.get("BENCH_NZ", "12"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    precond = os.environ.get("BENCH_PRECOND", "zline")

    (_state, geo, fs, cells, faces, init, ws, acc0,
     pbh) = __graft_entry__._build_problem(nx, ny, nz)
    n_cells = init.u.shape[0]
    params = NewtonParams(linear_precond=precond)

    dt = jnp.asarray(86400.0)

    # explicit connection densities once per substep, exactly like
    # newton_solve (reference: calculateExplicitQuantities on iter 0)
    from opm_autodiff_tpu.wells.standard import connection_densities
    rho_conn = jax.jit(connection_densities)(fs, init.u, init.flag, pbh,
                                             ws, cells.regs)

    def step(u, flag, pbh, mode, acc0):
        st = NewtonState(u=u, flag=flag, pbh=pbh, active_mode=mode)
        new_st, info, _q, _qa = newton_iteration_impl(
            params, fs, cells, faces, st, ws, acc0, dt,
            rho_conn=rho_conn)  # _q = (tot, perf)
        return new_st.u, new_st.flag, new_st.pbh, new_st.active_mode

    jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3))

    # warmup / compile
    u, flag, mode = init.u, init.flag, ws.ctrl_mode
    t0 = time.perf_counter()
    u, flag, pbh, mode = jstep(u, flag, pbh, mode, acc0)
    jax.block_until_ready(u)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for _ in range(iters):
        u, flag, pbh, mode = jstep(u, flag, pbh, mode, acc0)
    jax.block_until_ready(u)
    elapsed = time.perf_counter() - t0

    value = n_cells * iters / elapsed
    result = {
        "metric": "newton_cell_updates_per_sec",
        "value": round(value, 1),
        "unit": "cell_updates/s",
        "vs_baseline": round(value / BASELINE_CELL_UPDATES_PER_SEC, 4),
        "cells": n_cells,
        "iters": iters,
        "elapsed_s": round(elapsed, 4),
        "compile_s": round(compile_s, 2),
        "device": str(jax.devices()[0].device_kind),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
