"""Test harness setup: force the CPU backend with 8 virtual devices so the
multi-chip sharding paths are exercised without TPU hardware (the reference
has no analog of this; see SURVEY.md section 4).

The container's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS pinned to the TPU tunnel, so plain env vars here are too late;
override through jax.config before any backend is initialized.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: the suite is compile-bound (many small jitted
# programs), so repeat runs drop from ~7 min to well under the 400 s budget.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".cache", "jax")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
