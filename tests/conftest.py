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

import pathlib

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def spe1_deck_path(data_dir) -> str:
    return str(data_dir / "SPE1CASE1.DATA")
