"""Test config: force CPU with 8 virtual devices (sharding tests run without
real multi-chip hardware, SURVEY.md section 4), f64 enabled for parity with
the Rust reference's FloatGeneric<f64> tests.

Note: the TPU plugin on this host ignores JAX_PLATFORMS, so the CPU pin
is done via jax_default_device (mesh tests grab jax.devices("cpu")
explicitly)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_device", jax.devices("cpu")[0])
