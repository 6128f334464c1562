"""Test configuration: CPU backend with 8 virtual devices, fp64 enabled.

Tests run the same equivalence-oracle strategy as the reference suite
(/root/reference/tests/): end-to-end numerical equivalence on synthetic
low-rank tensors, in double precision. Sharding tests use the virtual
8-device CPU mesh.
"""

import os

# Force CPU: the session env pins JAX_PLATFORMS to the TPU plugin, but tests
# run on a virtual 8-device CPU mesh in fp64 (the verification oracle).
# The env var alone is not enough (jax may be partially pre-imported), so we
# also set the config explicitly before any backend initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_parallel_codegen_split_count" not in flags:
    # XLA:CPU's parallel LLVM codegen has segfaulted (SIGSEGV inside
    # backend_compile_and_load) late in cold-cache full-suite runs on this
    # host (3x, round 3; never in short runs). Serializing codegen removes
    # the race; compile wall grows a little on a cold cache only.
    flags = flags + " --xla_cpu_parallel_codegen_split_count=1"
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# CPU-ONLY cache dir, separate from the TPU runs' .jax_cache: XLA:CPU
# persists AOT executables keyed without the host's CPU feature set, and
# this machine changes under the session (tunneled backends migrate
# hosts). Loading an AOT entry compiled for a different feature set warns
# "could lead to execution errors such as SIGILL" and has produced a real
# SIGSEGV mid-suite (round 3); an isolated per-oracle cache avoids it.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()


# Free compiled executables between test modules. XLA:CPU has segfaulted
# (SIGSEGV inside backend_compile_and_load, 5/5 cold and warm full-suite
# runs, always ~110 tests in, never in any subset run alone) when a
# process accumulates hundreds of live JIT executables — dropping them
# between modules keeps the live-code footprint bounded. The persistent
# cache (.jax_cache_cpu) makes the re-warm cheap.
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    yield
    jax.clear_caches()
