"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The driver benches on real TPU hardware; tests must run anywhere, so we force
the CPU backend with 8 virtual devices (multi-chip sharding tests run on this
mesh, per SURVEY.md §4).
"""

import os
import sys

# The driver environment exports JAX_PLATFORMS=axon (the tunneled TPU) and a
# sitecustomize registers that backend at interpreter start, so the env var
# alone is not enough — override through jax.config after import.
# CFN_TEST_TPU=1 keeps the real TPU backend instead, for the tpu-marked
# hardware parity tests (e.g. the compiled-bf16 stencil packing checks):
#   CFN_TEST_TPU=1 python -m pytest tests/ -m tpu
if os.environ.get("CFN_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if os.environ.get("CFN_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
