"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This environment preimports jax from a sitecustomize that pins
``jax_platforms=axon,cpu`` (the TPU tunnel) — env vars alone do NOT switch
tests to CPU.  Override the config explicitly before any backend
initialization so multi-chip sharding logic is testable without TPU
hardware (SURVEY.md §4 / build-plan §8) and compiles stay local and fast.
"""

import os

os.environ["JAX_COMPILATION_CACHE_DIR"] = ""  # see note below

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NO persistent compilation cache under pytest: serializing the 8-device
# train_step executable (test_dryrun_multichip_entrypoint) wedges inside
# jax's cache put/get when the whole suite has run first — three suite
# runs hung >20 min at that exact test (faulthandler stacks in
# compilation_cache.get/put_executable_and_time), while the same test
# alone passes in seconds.  CPU compiles are fast; tests don't need the
# disk cache (the package enables it for CLI/bench TPU runs, where the
# remote-helper compiles it amortizes are minutes each).
# (the empty JAX_COMPILATION_CACHE_DIR env above makes the package skip
# re-enabling it on import)
jax.config.update("jax_compilation_cache_dir", None)
assert jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# Full-suite wedge guard: by the ~100th test the process holds ~9 GB of
# cached executables/jaxprs and the remaining modules' compiles slow from
# ~1 min standalone to >30 min (three timestamped runs wedged at
# test_replay while every file-subset passes).  Dropping the jit caches at
# module boundaries keeps the tracked-object count (and CPython GC cost
# during tracing) bounded; intra-module compile reuse — where nearly all
# actual reuse is — is untouched.
import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bounded_jax_caches():
    yield
    jax.clear_caches()
    gc.collect()
    gc.freeze()  # longlived survivors stop inflating later gen-2 scans
