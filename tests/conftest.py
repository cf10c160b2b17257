"""Test harness configuration.

Tests run on a simulated 8-device CPU mesh so that every sharding/collective
path is exercised without TPU hardware (the SURVEY.md §4 test strategy).

Note: the environment pre-imports jax at interpreter startup (sitecustomize)
with a TPU backend selected, so plain env vars are too late — the platform is
forced through jax.config before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.device_count() == 8, jax.devices()
