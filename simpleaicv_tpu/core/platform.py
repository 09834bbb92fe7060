"""Platform selection helper for the CLI tools.

The container's sitecustomize pins JAX to the TPU relay before user code runs,
so env vars like JAX_PLATFORMS are ignored. Tools call ``apply_platform_env()``
first; it honours:
  SIMPLEAICV_PLATFORM=cpu|tpu      (default: leave as-is)
  SIMPLEAICV_CPU_DEVICES=N         (virtual host devices for SPMD testing)
"""

from __future__ import annotations

import os

import jax


def apply_platform_env():
    plat = os.environ.get("SIMPLEAICV_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    n = os.environ.get("SIMPLEAICV_CPU_DEVICES")
    if n:
        jax.config.update("jax_num_cpu_devices", int(n))
