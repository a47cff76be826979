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

# persistent compilation cache: the suite's cost is dominated by XLA
# recompiles of the same Newton/solver kernels across test processes
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
if os.environ.get("OPM_TPU_TEST_CACHE_WRITE", "1") == "1":
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
else:
    # OPM_TPU_TEST_CACHE_WRITE=0: read-only cache. Some jaxlib builds
    # segfault intermittently in executable.serialize() when writing
    # persistent-cache entries mid-suite (observed: SIGSEGV under
    # compilation_cache.put_executable_and_time); reads are safe. Use
    # this when the suite dies with "Fatal Python error" in the cache
    # writer.
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1e9)

import pathlib

import pytest


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def spe1_deck_path(data_dir) -> str:
    return str(data_dir / "SPE1CASE1.DATA")
