"""Test configuration: force an 8-device virtual CPU mesh.

The reference (JonathonLuiten/PReMVOS) has no test suite; validation there is
end-metric only (DAVIS J&F via external evaluator). Our strategy (SURVEY.md §4)
is kernel unit tests, stage parity tests against pure-numpy re-derivations,
CPU-mesh distributed tests, and an end-to-end smoke test.

NOTE: this environment's sitecustomize initializes the axon TPU plugin at
interpreter startup, so JAX_PLATFORMS env tricks are too late here — we switch
platforms via jax.config instead (works because the CPU backend itself is
still created lazily, after XLA_FLAGS below is set).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: CPU compiles cache fine and the suite's wall time
# was dominated by recompiling the big contract-test models every run.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("PREMVOS_TEST_CACHE", "/tmp/premvos_jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
