"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding logic is exercised without a TPU slice
(xla_force_host_platform_device_count, per SURVEY.md §4).

NOTE: on this box a sitecustomize hook registers the tunneled TPU
backend at interpreter startup and force-sets jax_platforms="axon,cpu",
which overrides the JAX_PLATFORMS env var. Re-updating the config after
import (before any backend init) reclaims the CPU backend.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
