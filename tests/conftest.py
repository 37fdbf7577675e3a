"""Test harness config: force an 8-device virtual CPU mesh.

Tests never touch the real TPU; multi-chip sharding tests run on the
virtual CPU mesh (the TPU-world analog of a fake backend). The axon TPU
plugin ignores JAX_PLATFORMS, so we force the platform through jax.config
before any backend is initialized, and raise matmul precision so golden
comparisons against torch are meaningful.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
