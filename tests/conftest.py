"""Test env: force an 8-device CPU mesh before JAX initializes.

The TPU-native analog of "test multi-node without a cluster" (SURVEY.md §4):
``xla_force_host_platform_device_count=8`` gives eight virtual CPU devices so
every sharding/collective path runs exactly as it would on a v5e-8.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")
