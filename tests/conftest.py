"""Test configuration: force an 8-device CPU backend.

Multi-device sharding tests run on XLA's virtual host platform devices
(`--xla_force_host_platform_device_count=8`), the standard JAX trick for
testing mesh/pjit code without TPU hardware.

Note: this environment's sitecustomize imports JAX at interpreter startup
(before pytest loads conftest), so JAX_PLATFORMS in os.environ is already
consumed — we must go through jax.config instead.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
