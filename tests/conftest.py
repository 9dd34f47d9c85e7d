"""Test env: force CPU with 8 virtual devices so multi-chip sharding tests
run anywhere (SURVEY.md §4 test plan).

Note: this image preloads jax via an axon sitecustomize with
JAX_PLATFORMS=axon (TPU tunnel), so jax is already imported when pytest
starts. Backend initialization is lazy, so switching the config to CPU here
(before any computation runs) still works — env vars alone would be ignored.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
