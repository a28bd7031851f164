"""Test configuration: force CPU with 8 virtual devices for sharding tests.

Mirrors the reference's CPU-friendly test style (reference
`part5_squad/tests/test_model.py:55-61` builds tiny models on CPU); multi-chip
sharding is validated on a virtual 8-device CPU mesh per SURVEY.md §4.4.
Must set env vars before JAX initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the session-level 'axon' TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the tunneled TPU backend and sets
# jax_platforms="axon,cpu"; tests must run on the local virtual-8-device CPU
# mesh, so override the config after import (backends initialize lazily).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
