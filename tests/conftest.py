"""Test config: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a simulated CPU mesh (SURVEY.md SS4);
the axon TPU plugin registers itself via sitecustomize, so the platform
must be overridden through jax.config (env JAX_PLATFORMS is ignored).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # f64 available; default stays f32
