"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's answer to "test distributed without a cluster"
(SURVEY.md §4 tier 2: multi-rank mpirun on one host): JAX's virtual host
devices stand in for a TPU slice. Must run before the first jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU harness overrides the JAX_PLATFORMS env var; the config API
# still wins as long as no backend has been initialized yet.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: OPT-IN via OPM_TPU_TEST_CACHE=1.
# Within one `pytest tests/` process compiled programs are shared
# in-memory anyway, so the on-disk cache mostly helps REPEATED local
# runs — and some jaxlib builds segfault in PJRT executable
# (de)serialization when the suite's largest programs (whole-substep
# device Newton loops) hit the cache from a warmed process (observed:
# SIGSEGV under both put_executable_and_time and
# get_executable_and_time mid-suite, never in a fresh process). Default
# OFF keeps the suite deterministic-green; enable locally for faster
# re-runs and fall back if a run dies in the cache writer.
if os.environ.get("OPM_TPU_TEST_CACHE", "0") == "1":
    _cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import faulthandler
import pathlib
import signal

import pytest

# ---------------------------------------------------------------------------
# Suite hygiene (VERDICT r4 weak #3 / next #8): a wedged XLA compile must
# never leave a pytest (or xdist worker) process alive for hours. Two
# layers:
#   1. per-test hard timeout — faulthandler dumps all thread stacks and
#      hard-exits the process if ONE test exceeds the budget (SIGALRM
#      can't interrupt a C-held GIL; faulthandler's watchdog thread
#      can). Crude (kills the whole worker) but that is exactly the
#      contract: no stray processes, ever.
#   2. session-end child reaping — any still-live DIRECT child of this
#      process at sessionfinish is a leak (re-exec subprocasses, wedged
#      xdist workers) and is SIGKILLed by pid (never by pattern).
# ---------------------------------------------------------------------------

_PER_TEST_TIMEOUT_S = float(os.environ.get("OPM_TPU_TEST_TIMEOUT_S", "900"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_protocol(item, nextitem):
    if _PER_TEST_TIMEOUT_S > 0:
        faulthandler.dump_traceback_later(_PER_TEST_TIMEOUT_S, exit=True)
    yield
    if _PER_TEST_TIMEOUT_S > 0:
        faulthandler.cancel_dump_traceback_later()


def _live_child_pids():
    me = os.getpid()
    pids = []
    try:
        for p in os.listdir("/proc"):
            if not p.isdigit():
                continue
            try:
                with open(f"/proc/{p}/stat") as f:
                    fields = f.read().rsplit(")", 1)[1].split()
                if int(fields[1]) == me:  # ppid (field 4 overall)
                    pids.append(int(p))
            except (OSError, IndexError, ValueError):
                continue
    except OSError:
        pass
    return pids


def pytest_sessionfinish(session, exitstatus):
    for pid in _live_child_pids():
        try:
            os.kill(pid, signal.SIGKILL)
        except OSError:
            pass


# ---------------------------------------------------------------------------
# Whole-suite split runner (round-5): this image's jaxlib deterministically
# SIGSEGVs inside backend_compile_and_load once a single process has
# accumulated enough compile history (reproduced at the same test across
# runs with and without the per-test watchdog; no single poisoning test —
# every 2-of-5-file subset of the crashing prefix passes). Fresh processes
# never crash, so a full-suite invocation re-execs itself as SHORT-LIVED
# batch subprocesses sharing the on-disk XLA compile cache. Engaged only
# for broad runs (>= 20 test files, no -k/-m filter); child batches and
# subset runs use the normal in-process loop.
# ---------------------------------------------------------------------------

_SUITE_CHILD = os.environ.get("OPM_TPU_SUITE_CHILD") == "1"
_BATCH_FILES = int(os.environ.get("OPM_TPU_SUITE_BATCH", "5"))


def pytest_runtestloop(session):
    import subprocess
    import sys

    cfg = session.config
    if (_SUITE_CHILD
            or os.environ.get("OPM_TPU_SUITE_SPLIT", "1") != "1"
            or cfg.getoption("collectonly", False)
            or cfg.getoption("keyword", "")
            or cfg.getoption("markexpr", "")):
        return None  # normal in-process loop
    files = sorted({str(it.path) for it in session.items})
    if len(files) < 20:
        return None
    exitfirst = bool(cfg.getoption("exitfirst", False))
    sys.stderr.write(
        f"suite-split: running {len(files)} test files in batches of "
        f"{_BATCH_FILES} fresh subprocesses (shared on-disk compile "
        f"cache); this image's jaxlib segfaults in long-lived compile "
        f"sessions — see tests/conftest.py\n")
    failed_files = []
    for i in range(0, len(files), _BATCH_FILES):
        chunk = files[i:i + _BATCH_FILES]
        env = dict(os.environ, OPM_TPU_SUITE_CHILD="1",
                   OPM_TPU_TEST_CACHE="1")
        r = subprocess.run(
            [sys.executable, "-m", "pytest", *chunk, "-q",
             "--no-header"], env=env)
        if r.returncode in (-11, 139, -6, 134):
            # a child still died in native code: retry once, one file
            # per process (shortest possible compile history)
            sys.stderr.write(
                f"suite-split: batch crashed (rc={r.returncode}); "
                f"retrying its files individually\n")
            for f in chunk:
                r1 = subprocess.run(
                    [sys.executable, "-m", "pytest", f, "-q",
                     "--no-header"], env=env)
                if r1.returncode != 0:
                    failed_files.append(f)
        elif r.returncode != 0:
            failed_files.extend(chunk)
        if failed_files and exitfirst:
            break
    if failed_files:
        session.testsfailed += len(failed_files)
        sys.stderr.write("suite-split: failing batches: "
                         + " ".join(failed_files) + "\n")
    return True  # we ran everything; skip the in-process loop


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def spe1_deck_path(data_dir) -> str:
    return str(data_dir / "SPE1CASE1.DATA")
