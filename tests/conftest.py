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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.devices()[0].platform == "cpu", jax.devices()
