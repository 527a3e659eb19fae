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
