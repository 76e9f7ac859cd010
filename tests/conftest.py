"""Test harness: run every test on a virtual 8-device CPU mesh.

Multi-chip behaviour is validated without TPU hardware by forcing the host
platform to expose 8 XLA CPU devices (the JAX-native answer to multi-node
testing — SURVEY.md §4).

NOTE on the environment: this image's ``sitecustomize`` registers the axon
TPU PJRT plugin in *every* Python process and pins ``jax_platforms`` via an
explicit ``config.update`` — so neither the env var nor pre-import
``os.environ`` tweaks can disable it.  Overriding the config *after* the jax
import (but before first backend use) is the supported escape hatch, and it
also prevents concurrent test processes from deadlocking on the single TPU
grant.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
