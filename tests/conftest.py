"""Test environment: CPU backend with 8 virtual devices (multi-chip sharding
tests run on a virtual mesh, SURVEY §5.8), float64 enabled (the reference is
f64; f64 oracles validate the f32 TPU path).

Note: this image registers the TPU (axon) PJRT plugin from sitecustomize at
interpreter startup, so jax is already imported and JAX_PLATFORMS from the
environment is already latched — the override must go through jax.config.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
