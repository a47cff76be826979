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


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def spe1_deck_path(data_dir) -> str:
    return str(data_dir / "SPE1CASE1.DATA")
