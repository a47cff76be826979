"""CLI driver: ``python -m opm_autodiff_tpu.main CASE.DATA [options]``.

Rebuild of the `flow` binary's CLI (reference: flow/flow.cpp:26,
Opm::Main::runDynamic, opm/simulators/flow/Main.hpp:155): parse the deck,
print the banner, run the schedule, write summary output next to the
deck (CASE.csv / CASE.npz) and the .INFOSTEP performance table
(FlowMainEbos.hpp:593).
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opm_autodiff_tpu",
        description="TPU-native fully-implicit black-oil simulator")
    p.add_argument("deck", help="ECLIPSE .DATA input deck")
    p.add_argument("--output-dir", default=None,
                   help="directory for output files (default: deck's)")
    p.add_argument("--linear-solver-configuration", default=None,
                   help="canned config (ilu0/cpr/cpr_trueimpes/"
                        "cpr_quasiimpes/amg) or a .json property tree "
                        "(reference: setupPropertyTree.cpp:36)")
    p.add_argument("--linear-solver", default="zline",
                   choices=["zline", "jacobi", "ilu0", "cpr", "cprt",
                            "cpramg", "cpramgt"],
                   help="preconditioner (reference --linear-solver; the "
                        "*t variants use true-IMPES CPR weights, cpramg "
                        "adds the GMG/AMG coarse pressure stage)")
    p.add_argument("--tolerance-cnv", type=float, default=1e-2)
    p.add_argument("--tolerance-mb", type=float, default=1e-6)
    p.add_argument("--newton-max-iterations", type=int, default=20)
    p.add_argument("--initial-time-step-in-days", type=float, default=1.0)
    p.add_argument("--solver-restart-factor", type=float, default=0.33)
    p.add_argument("--time-step-control", default="iterationcount",
                   choices=["pid", "iterationcount"])
    p.add_argument("--platform", default=None,
                   help="jax platform override (cpu for testing)")
    p.add_argument("--quiet", action="store_true")
    p.add_argument("--profile-dir", default=None,
                   help="write a jax profiler trace (open with "
                        "TensorBoard/xprof) covering the whole run — the "
                        "reference's SimulatorReport timing tree plus "
                        "device-level detail (SURVEY.md §5 tracing)")
    p.add_argument("--enable-vtk-output", default="false",
                   choices=("true", "false"),
                   help="write per-step VTK snapshots + .pvd collection "
                        "(reference: --enable-vtk-output, default off)")
    p.add_argument("--enable-ecl-output", default="true",
                   choices=["true", "false"],
                   help="write EGRID/INIT/UNRST/SMSPEC/UNSMRY binaries")
    p.add_argument("--enable-async-ecl-output", default="true",
                   choices=["true", "false"],
                   help="serialize ECL binary output on a background "
                        "thread, off the stepping critical path "
                        "(reference: EnableAsyncEclOutput TaskletRunner, "
                        "eclwriter.hh:49)")
    return p


class AsyncOutput:
    """Single background writer thread (reference: TaskletRunner,
    ebos/eclgenericwriter.hh:121): tasks run in submission order; the
    file handles are touched only by this thread once started."""

    def __init__(self, enabled: bool):
        self.enabled = enabled
        if enabled:
            import queue
            import threading

            self._q = queue.Queue()
            self._t = threading.Thread(target=self._run, daemon=True)
            self._t.start()

    def submit(self, fn):
        if self.enabled:
            self._q.put(fn)
        else:
            fn()

    def _run(self):
        while True:
            fn = self._q.get()
            if fn is None:
                return
            fn()

    def close(self):
        if self.enabled:
            self._q.put(None)
            self._t.join()


def main(argv=None) -> int:
    args = build_argparser().parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # persistent XLA compilation cache: report-step shapes repeat across
    # runs, so warm starts skip the 20-40s first-compile cost
    cache = os.environ.get("OPM_TPU_CACHE",
                           os.path.expanduser("~/.cache/opm_autodiff_tpu"))
    if cache:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    import dataclasses

    from opm_autodiff_tpu import __version__
    from opm_autodiff_tpu.io.state import load_state
    from opm_autodiff_tpu.simulator import Simulator, SimulatorOptions
    from opm_autodiff_tpu.solvers.newton import NewtonParams
    from opm_autodiff_tpu.solvers.timestepper import TimeStepParams

    if not args.quiet:
        print(f"opm_autodiff_tpu {__version__} — TPU-native black-oil "
              f"simulator (capabilities of OPM Flow)")
        print(f"reading deck: {args.deck}")

    state = load_state(args.deck)
    newton = NewtonParams(
        max_iter=args.newton_max_iterations,
        tol_cnv=args.tolerance_cnv,
        tol_mb=args.tolerance_mb,
        linear_precond=args.linear_solver,
    )
    if args.linear_solver_configuration:
        from opm_autodiff_tpu.solvers.config import apply_to_params
        newton = apply_to_params(newton, args.linear_solver_configuration)
    opts = SimulatorOptions(
        newton=newton,
        tstep=TimeStepParams(
            initial_dt_days=args.initial_time_step_in_days,
            restart_factor=args.solver_restart_factor,
            control=args.time_step_control,
        ),
        verbose=0 if args.quiet else 1,
    )
    sim = Simulator(state, opts)
    base = os.path.splitext(os.path.basename(args.deck))[0]
    outdir = args.output_dir or os.path.dirname(os.path.abspath(args.deck))
    os.makedirs(outdir, exist_ok=True)

    # .PRT run log (the reference's OpmLog/.PRT stream, Main.hpp:442
    # setupLogging): banner, keyword validation, per-step convergence
    prt = PrtLog(os.path.join(outdir, base + ".PRT"), __version__,
                 args.deck)
    for m in sim.diagnostics:
        prt.line(m)

    ecl_out = args.enable_ecl_output == "true"
    unit_name = state.runspec.unit_system.name
    unrst = None
    if ecl_out:
        from opm_autodiff_tpu.io import eclbinary as eb

        eb.write_egrid(os.path.join(outdir, base + ".EGRID"), sim.geo,
                       unit_name)
        eb.write_init(os.path.join(outdir, base + ".INIT"), sim.geo, state,
                      unit_name)
        unrst = eb.EclFileWriter(os.path.join(outdir, base + ".UNRST"))
    vtk = None
    if args.enable_vtk_output == "true":
        from opm_autodiff_tpu.io.vtk import VtkSeries

        vtk = VtkSeries(outdir, base)
    rft = None
    if ecl_out and any(getattr(w, "rft", False)
                       for st in state.schedule.steps for w in st.wells):
        from opm_autodiff_tpu.io import eclbinary as eb

        rft = eb.EclFileWriter(os.path.join(outdir, base + ".RFT"))

    t0 = time.perf_counter()
    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    nsteps = len(state.schedule.steps)
    aout = AsyncOutput(ecl_out and args.enable_async_ecl_output == "true")
    import numpy as _np
    while sim._step_index < nsteps:
        reports = sim.step()
        if unrst is not None:
            from opm_autodiff_tpu.io import eclbinary as eb

            # snapshot to host now; the write happens off-thread
            u_snap = _np.asarray(sim.u)
            flag_snap = _np.asarray(sim.flag)
            aout.submit(lambda s=sim._step_index, u=u_snap, f=flag_snap,
                        d=sim._suggested_dt:
                        eb.write_unrst_arrays(unrst, s, u, f,
                                              sim.geo.cartdims,
                                              sim.geo.num_active,
                                              unit_name, next_dt_days=d))
        if rft is not None:
            from opm_autodiff_tpu.io import eclbinary as eb

            r_last = sim.summary.rows[-1]
            eb.write_rft_step(rft, sim, r_last["TIME"], unit_name)
        if vtk is not None:
            r_now = sim.summary.rows[-1]
            vtk.write_step(sim.geo, sim.u, sim.flag, r_now["TIME"])
        # drain the deferred event log (reference: gatherDeferredLogger
        # flush on the I/O rank once per step)
        for line in sim.deferred.drain():
            prt.line(line)
        r = sim.summary.rows[-1]
        srep = sim.report.steps[-1]
        prt.line(
            f"Report step {sim._step_index:4d}/{nsteps} t={r['TIME']:10.2f} "
            f"days  substeps={len(reports)}  newton={srep.newton_iterations}"
            f"  linear={srep.linear_iterations}  FOPR={r.get('FOPR', 0):.2f}"
            f"  FPR={r.get('FPR', 0):.2f}")
        if not args.quiet:
            print(f"step {sim._step_index}/{nsteps} t={r['TIME']:.1f}d "
                  f"FOPR={r.get('FOPR', 0):.1f} FPR={r.get('FPR', 0):.1f} "
                  f"substeps={len(reports)}")
    wall = time.perf_counter() - t0
    aout.close()
    if args.profile_dir:
        jax.profiler.stop_trace()
        if not args.quiet:
            print(f"profiler trace written to {args.profile_dir}")
    if unrst is not None:
        unrst.close()
    if rft is not None:
        rft.close()
    if vtk is not None:
        vtk.close()

    sim.summary.to_csv(os.path.join(outdir, base + ".csv"))
    sim.summary.to_npz(os.path.join(outdir, base + ".npz"))
    if ecl_out:
        from opm_autodiff_tpu.io import eclbinary as eb

        eb.write_summary_files(os.path.join(outdir, base),
                               sim.summary.rows, state.cartdims,
                               state.runspec.start, unit_name)
    write_infostep(os.path.join(outdir, base + ".INFOSTEP"), sim)
    rep = sim.report
    prt.line(f"End of simulation: wall={wall:.1f}s {rep.summary_line()}")
    prt.close()
    if not args.quiet:
        rep = sim.report
        print(f"done in {wall:.1f}s: {rep.summary_line()}")
        print(f"summary written to {os.path.join(outdir, base + '.csv')}")
    return 0


class PrtLog:
    """Minimal .PRT print-file writer (reference: OpmLog file backend,
    opm/simulators/utils logging set up in Main.hpp:442)."""

    def __init__(self, path: str, version: str, deck: str):
        self._f = open(path, "w")
        import datetime

        self.line("=" * 70)
        self.line(f" opm_autodiff_tpu {version} — TPU-native black-oil "
                  "simulator")
        self.line(f" deck: {deck}")
        self.line(f" started: {datetime.datetime.now().isoformat()}")
        self.line("=" * 70)

    def line(self, msg: str) -> None:
        self._f.write(msg + "\n")

    def close(self) -> None:
        self._f.close()


def write_infostep(path: str, sim) -> None:
    """Per-report-step performance table (reference .INFOSTEP file,
    SimulatorReport printing, FlowMainEbos.hpp:576-599)."""
    with open(path, "w") as f:
        f.write("# step  substeps  newton_its  linear_its  wall_s\n")
        for i, s in enumerate(sim.report.steps):
            f.write(f"{i:6d} {s.substeps:9d} {s.newton_iterations:11d} "
                    f"{s.linear_iterations:11d} {s.wall_time:8.3f}\n")
        r = sim.report
        f.write(f"# total substeps={r.total_substeps} "
                f"newton={r.total_newton_iterations} "
                f"linear={r.total_linear_iterations} "
                f"wall={r.total_wall_time:.2f}s\n")


if __name__ == "__main__":
    sys.exit(main())
