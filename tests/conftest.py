"""Test configuration: force a virtual 8-device CPU mesh.

Multi-device sharding is validated on CPU (the driver separately dry-runs
the multi-chip path); benchmarks run on real TPU via bench.py.  Must run
before jax is imported anywhere.
"""

import os

# NB: the runtime image may pre-import jax with JAX_PLATFORMS=axon via
# sitecustomize, so plain env vars are too late — switch the platform via
# jax.config (safe before first backend use).
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


@pytest.fixture(scope="session")
def ml100k():
    from rsparse_tpu import load_movielens100k
    return load_movielens100k()


@pytest.fixture(scope="session")
def ml100k_split(ml100k):
    """train/cv split used throughout the reference test-suite
    (reference tests/testthat/test-wrmf.R:6-7)."""
    train = sp.csr_matrix(ml100k)[:900]
    cv = sp.csr_matrix(ml100k)[900:]
    train.row_names = ml100k.row_names[:900]
    train.col_names = ml100k.col_names
    cv.row_names = ml100k.row_names[900:]
    cv.col_names = ml100k.col_names
    return train, cv
