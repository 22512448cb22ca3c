"""Test configuration: run everything on an 8-device virtual CPU mesh.

Multi-chip sharding (data-parallel all-gather loss, pjit train step) is
validated on the host backend; real-TPU benchmarking lives in ``bench.py``.
"""

import os

import re

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
# The suite hard-requires EXACTLY 8 devices (2x4 meshes, MeshConfig(data=8));
# override any inherited count rather than failing with opaque reshape errors.
flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's site hook pins jax_platforms to the TPU tunnel; tests run
# on the virtual CPU mesh, so force it back before any backend initializes.
jax.config.update("jax_platforms", "cpu")
# Parity tests compare fp32 activations against torch; keep fp32 matmuls fp32.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
