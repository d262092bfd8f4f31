"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding logic is testable without TPUs via XLA's host-platform
device-count override (SURVEY.md §4).  The session presets
JAX_PLATFORMS=axon (the real TPU tunnel) and the axon plugin ignores the
env var, so we must force the platform through the config API before any
backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()


# Every XLA:CPU compile leaves LLVM JIT code mappings in the process; the
# full suite's several hundred compiles exceed the kernel's default
# vm.max_map_count (65530), after which mmap fails and the next compile
# SEGFAULTS (observed deterministically at ~88% of the suite, maps
# monitor in docs/RESULTS.md "test-suite mmap exhaustion").  Dropping the
# jit caches between modules releases the LoadedExecutables — and their
# code mappings — bounding the map count at the cost of recompiling the
# few graphs shared across test files.
@pytest.fixture(autouse=True, scope="module")
def _release_jit_mappings_per_module():
    yield
    jax.clear_caches()
