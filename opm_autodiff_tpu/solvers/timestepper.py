"""Adaptive sub-stepping with failure-driven chopping.

Rebuild of AdaptiveTimeSteppingEbos (reference:
opm/simulators/timestepping/AdaptiveTimeSteppingEbos.hpp:357 ``step``):
run the Newton solver on a trial dt; on failure chop dt by
``restart_factor`` (default 0.33, :522) up to ``max_restarts``; on success
grow dt with an iteration-count policy (TimeStepControl.hpp:35
SimpleIterationCount; PID control later round). Failures are status codes
from the Newton layer, not exceptions.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class TimeStepParams:
    # reference AdaptiveTimeSteppingEbos defaults
    initial_fraction: float = 1.0   # first substep = fraction of report step
    restart_factor: float = 0.33
    growth_factor: float = 3.0      # max growth per step
    max_restarts: int = 10
    target_iterations: int = 8      # SimpleIterationCountTimeStepControl
    min_dt_days: float = 1e-3
    max_dt_days: float = 365.0
    initial_dt_days: float = 1.0


@dataclasses.dataclass
class SubStepReport:
    time_days: float
    dt_days: float
    newton_iterations: int
    linear_iterations: int
    restarts: int


def run_report_step(step_days: float, suggested_dt_days: float, solve_fn,
                    params: TimeStepParams):
    """Advance one report step of length ``step_days``.

    ``solve_fn(dt_seconds)`` runs a Newton solve from the current committed
    state and returns (converged: bool, iterations: int, commit: callable).
    ``commit()`` advances the committed state. Returns (reports, next_dt).
    """
    t = 0.0
    dt = min(suggested_dt_days, step_days, params.max_dt_days)
    reports = []
    restarts_total = 0
    while t < step_days - 1e-9:
        dt = min(dt, step_days - t)
        restarts = 0
        while True:
            ok, iters, lin_iters, commit = solve_fn(dt * 86400.0)
            if ok:
                commit()
                reports.append(SubStepReport(t + dt, dt, iters, lin_iters,
                                             restarts))
                t += dt
                # growth policy
                factor = params.target_iterations / max(iters, 1)
                factor = min(max(factor, params.restart_factor),
                             params.growth_factor)
                dt = min(dt * factor, params.max_dt_days)
                break
            restarts += 1
            restarts_total += 1
            if restarts > params.max_restarts or dt <= params.min_dt_days:
                raise RuntimeError(
                    f"substep failed after {restarts} restarts at "
                    f"t={t:.2f}d dt={dt:.4f}d")
            dt *= params.restart_factor
    return reports, dt
