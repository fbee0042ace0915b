"""Test config: force an 8-device virtual CPU mesh.

Tests must run identically with or without a real TPU attached; sharding
tests need multiple devices, which we get via XLA's host-platform device
virtualization.  The environment pre-imports jax with a TPU plugin platform,
so plain env vars are too late — override via jax.config before any backend
is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
