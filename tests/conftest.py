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

# persistent compilation cache: planner-step compiles dominate suite time;
# warm re-runs skip them entirely (the dir is gitignored, machine-local)
# per-backend subdirectory: executables written by the TPU-attached
# processes (whose CPU client compiles with different machine-feature
# flags) segfault on deserialization here if the directories are shared
_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache", "cpu")
os.makedirs(_CACHE_DIR, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.device_count() == 8, jax.devices()
