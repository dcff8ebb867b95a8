"""Test configuration: force an 8-device virtual CPU mesh.

This environment's sitecustomize registers the axon TPU PJRT plugin at interpreter
start and sets jax_platforms="axon,cpu" — env vars alone cannot opt out, and the
remote TPU tunnel is single-tenant (concurrent clients wedge it). Tests therefore
override the platform at the jax.config level BEFORE any backend initialises; the
XLA flag below gives the 8 virtual CPU devices used by the sharding tests
(SURVEY.md §4). Benches and `__graft_entry__` run separately on the real chip.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
