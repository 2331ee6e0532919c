"""Test configuration: run everything on a virtual 8-device CPU mesh so the
suite exercises the multi-chip sharding paths without TPU hardware.

Notes for this environment:
  * a sitecustomize registers the `axon` TPU plugin and force-overrides
    `jax_platforms` to "axon,cpu" (ignoring the JAX_PLATFORMS env var), so we
    must override back via jax.config *after* importing jax;
  * XLA_FLAGS must be set before the backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache across test runs.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(20260816)


@pytest.fixture(autouse=True, scope="module")
def _release_jax_executables():
    """Free compiled executables between test modules.

    Every live XLA:CPU executable holds multiple mmap regions (JIT code
    pages); a full-suite process accumulates 1000+ executables and can
    exhaust ``vm.max_map_count`` (default 65530), which XLA answers with
    a SEGFAULT in the next compile/serialize. Dropping the jit caches at
    module boundaries caps the live set; the persistent on-disk cache
    makes the re-entries cheap."""
    yield
    jax.clear_caches()
