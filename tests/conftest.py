"""Test env: force CPU backend with 8 virtual devices so sharding tests run
without TPU hardware (JAX docs pattern; also how the driver validates our
multi-chip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # hard override: tests must not grab the TPU
# full fp32 matmuls for numeric parity tests (default on this stack is
# bf16-like reduced precision even on CPU)
os.environ["JAX_DEFAULT_MATMUL_PRECISION"] = "highest"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# A sitecustomize on this machine registers a remote-TPU PJRT plugin in
# every interpreter and pins jax_platforms to it, ignoring the env var.
# Force the selection back to CPU at the config level (verified to win
# over the plugin registration).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
