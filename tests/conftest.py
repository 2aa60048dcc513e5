"""Test configuration: run the suite on a virtual 8-device CPU mesh with
float64 enabled, per SURVEY.md §4 (multi-host tests simulated with
``xla_force_host_platform_device_count``)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force CPU through the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
