"""Test configuration: force an 8-device virtual CPU mesh.

Distributed logic (pjit sharding, psum metric aggregation) is tested on a
virtual CPU mesh instead of a real pod — the substitute for the reference's
SLURM-only multi-node path (SURVEY.md §4).
"""
import os

# Force CPU: the session env may pin JAX_PLATFORMS to a TPU platform (and a
# sitecustomize may override the env var via jax.config), and fp32 parity
# tests need exact CPU matmuls.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
