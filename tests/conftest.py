"""Test configuration: force an 8-device virtual CPU mesh BEFORE jax initialises.

Multi-chip sharding tests run on this fake mesh (SURVEY.md §4: JAX's standard
`xla_force_host_platform_device_count` fake); benches run separately on real TPU.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
