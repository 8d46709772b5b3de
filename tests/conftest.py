"""Test harness: run everything on a virtual 8-device CPU mesh.

`XLA_FLAGS=--xla_force_host_platform_device_count=8` gives the real
shard_map/pjit code path without TPU hardware (SURVEY.md §4 point 3); must be
set before jax initializes.
"""

import os

_ON_TPU = os.environ.get("DELTAKD_TEST_TPU") == "1"

if not _ON_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if not _ON_TPU:
    # The axon/TPU sitecustomize registers its platform before conftest runs
    # and pins JAX_PLATFORMS; override through the config API as well so tests
    # run on the virtual 8-device CPU mesh. Set DELTAKD_TEST_TPU=1 to run the
    # TPU-gated kernel tests on real hardware instead.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
