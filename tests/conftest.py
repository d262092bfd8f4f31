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

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()
