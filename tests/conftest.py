"""Test configuration: run all tests on a simulated 8-device CPU backend.

Multi-chip sharding is validated on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), the JAX idiom for
testing pjit/shard_map programs without real TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
