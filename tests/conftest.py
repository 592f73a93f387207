"""Test configuration: force a deterministic 8-device CPU platform.

Multi-"rank" behavior is validated the TPU-native way — a virtual device mesh
via ``--xla_force_host_platform_device_count`` — replacing the reference's
``mpirun -n K`` testing strategy (SURVEY §4).  f64 is enabled so golden
comparisons against scipy are exact-precision.

Note: ``jax.config.update`` is used instead of env vars because this image
pre-registers an experimental TPU platform plugin that would otherwise grab
the backend before env settings are read.
"""

import os
import pathlib

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest

DATA = pathlib.Path("/root/reference/data")


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA
