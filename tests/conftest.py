"""Test configuration: run all tests on a simulated 8-device CPU backend.

Multi-chip sharding is validated on a virtual CPU mesh
(--xla_force_host_platform_device_count=8), the JAX idiom for testing
pjit/shard_map programs without real TPU hardware.

NOTE: this environment pre-sets JAX_PLATFORMS=axon (remote TPU tunnel) via a
sitecustomize hook, so plain env-var overrides are not enough — we force the
platform through jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent XLA compile cache: MACE variants are compile-heavy on CPU
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), ".jax_test_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
