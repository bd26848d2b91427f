"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this executes
at conftest import time (pytest imports conftest before test modules).
"""

import os
import sys

# SGNN_TESTS_TPU=1 keeps the real TPU backend for the @pytest.mark.tpu
# compiled-vs-interpret parity suite (tests/test_tpu_parity.py):
#   SGNN_TESTS_TPU=1 python -m pytest tests/test_tpu_parity.py -m tpu
if not os.environ.get("SGNN_TESTS_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo root importable regardless of how pytest is invoked.
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

# The container's sitecustomize registers a remote TPU backend (platform
# "axon") in every interpreter and force-appends it to jax_platforms.
# Point jax back at the virtual 8-device CPU mesh before any backend
# initializes; otherwise each test op is a network round-trip.
import jax  # noqa: E402

if not os.environ.get("SGNN_TESTS_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
