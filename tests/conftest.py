"""Test configuration: run on a virtual 8-device CPU mesh with float64 enabled
so the dense oracles are exact.  The TPU bench path uses float32; tests here
exercise the same code on the CPU backend (SURVEY.md §7, reference test
strategy §4)."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
