"""Benchmark: Newton cell-updates/sec on a scaled SPE1 model (real TPU).

Metric per BASELINE.json: cell-updates/sec = cells x Newton iterations /
wall time, where each Newton iteration is the full pipeline (property
evaluation, AD assembly, Schur-coupled BiCGStab solve, chopped update) as
one jitted device program.

The headline number is the banded fast path (fully-active cartesian,
SPE1 physics — the layout most production runs spend their time in);
the same JSON line also reports the EMBEDDED path (10% ACTNUM-inactive
cells, the Norne-class layout) as value_embedded so the two named
configurations are both measured on every round. BENCH_EMBEDDED=0
skips the secondary measurement.

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


def _measure(problem, iters, precond):
    import jax
    import jax.numpy as jnp

    from opm_autodiff_tpu.solvers.newton import (NewtonParams, NewtonState,
                                                 newton_iteration_impl)
    from opm_autodiff_tpu.wells.standard import connection_densities

    (_state, _geo, fs, cells, faces, init, ws, acc0, pbh) = problem
    n_cells = init.u.shape[0]
    params = NewtonParams(linear_precond=precond)
    dt = jnp.asarray(86400.0)

    # explicit connection densities once per substep, exactly like
    # newton_solve (reference: calculateExplicitQuantities on iter 0)
    rho_conn = jax.jit(connection_densities)(fs, init.u, init.flag, pbh,
                                             ws, cells.regs)

    def step(u, flag, pbh, mode, acc0):
        st = NewtonState(u=u, flag=flag, pbh=pbh, active_mode=mode)
        new_st, info, _q, _qa = newton_iteration_impl(
            params, fs, cells, faces, st, ws, acc0, dt,
            rho_conn=rho_conn)
        return new_st.u, new_st.flag, new_st.pbh, new_st.active_mode

    jstep = jax.jit(step, donate_argnums=(0, 1, 2, 3))

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
    return n_cells * iters / elapsed, n_cells, elapsed, compile_s


def _actnum_problem(nx, ny, nz):
    """SPE1-physics deck with ~10% inactive cells: the embedded banded
    (Norne-class ACTNUM) layout."""
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from opm_autodiff_tpu.grid import build_geometry
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.models.blackoil import (accumulation,
                                                  statics_from_geometry)
    from opm_autodiff_tpu.models.init import equilibrate
    from opm_autodiff_tpu.props import FluidSystem
    from opm_autodiff_tpu.utils.synthetic import write_spe1_deck
    from opm_autodiff_tpu.wells import build_wellset

    path = os.path.join(tempfile.mkdtemp(), "SPE1A.DATA")
    write_spe1_deck(path, nx, ny, nz)
    txt = open(path).read()
    n = nx * ny * nz
    rng = np.random.default_rng(7)
    act = np.ones(n, int)
    # keep the well columns alive; deactivate a random 10% elsewhere
    dead = rng.choice(n, size=n // 10, replace=False)
    act[dead] = 0
    act[:: nx * ny] = 1          # (1,1,k) injector column
    act[nx * ny - 1:: nx * ny] = 1  # (nx,ny,k) producer column
    txt = txt.replace("PROPS", "ACTNUM\n " + " ".join(map(str, act))
                      + " /\n\nPROPS", 1)
    open(path, "w").write(txt)
    state = load_state(path)
    geo = build_geometry(state)
    fs = FluidSystem.from_state(state)
    cells, faces = statics_from_geometry(geo)
    init = equilibrate(state, geo, fs)
    ws = build_wellset(geo, state.schedule.steps[0].wells)
    acc0 = jax.vmap(accumulation, in_axes=(None, 0, 0, 0))(
        fs, init.u, init.flag, cells.pore_vol_ref)
    pbh = init.u[ws.cell[:, 0], 0] + jnp.where(ws.is_injector, 1e5, -1e5)
    return state, geo, fs, cells, faces, init, ws, acc0, pbh


def main():
    # watchdog: if the TPU tunnel is wedged, backend creation blocks
    # forever inside jax; emit a diagnosable JSON line instead of
    # hanging the bench driver
    import threading

    budget = float(os.environ.get("BENCH_WATCHDOG_S", "2700"))

    def _watchdog():
        import time as _t
        _t.sleep(budget)
        print(json.dumps({
            "metric": "newton_cell_updates_per_sec", "value": 0.0,
            "unit": "cell_updates/s", "vs_baseline": 0.0,
            "error": f"watchdog: no result within {budget}s "
                     f"(TPU backend unavailable/wedged?)"}), flush=True)
        os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    import __graft_entry__

    nx = int(os.environ.get("BENCH_NX", "64"))
    ny = int(os.environ.get("BENCH_NY", "64"))
    nz = int(os.environ.get("BENCH_NZ", "12"))
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    precond = os.environ.get("BENCH_PRECOND", "zline")

    problem = __graft_entry__._build_problem(nx, ny, nz)
    value, n_cells, elapsed, compile_s = _measure(problem, iters, precond)

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

    if os.environ.get("BENCH_EMBEDDED", "1") == "1":
        emb_iters = max(iters // 2, 10)
        try:
            emb = _actnum_problem(nx, ny, nz)
            v_emb, n_emb, el_emb, c_emb = _measure(emb, emb_iters, precond)
            result.update({
                "value_embedded": round(v_emb, 1),
                "cells_embedded": n_emb,
                "vs_baseline_embedded": round(
                    v_emb / BASELINE_CELL_UPDATES_PER_SEC, 4),
                "compile_embedded_s": round(c_emb, 2),
            })
        except Exception as e:  # secondary metric must not kill the bench
            result["embedded_error"] = str(e)[:200]

    print(json.dumps(result))


if __name__ == "__main__":
    main()
