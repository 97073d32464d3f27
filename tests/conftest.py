"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment preimports jax from a sitecustomize that pins
``jax_platforms=axon,cpu`` (the TPU tunnel) — env vars alone do NOT switch
tests to CPU.  Override the config explicitly before any backend
initialization so multi-chip sharding logic is testable without TPU
hardware (SURVEY.md §4 / build-plan §8) and compiles stay local and fast.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu"
