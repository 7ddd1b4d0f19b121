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
# persistent compile cache: the suite compiles hundreds of per-shape
# programs; warm reruns skip nearly all of it.  Separate dir from the
# TPU bench cache — that one accumulates CPU AOT entries compiled on the
# relay machine (different CPU features -> SIGILL risk if loaded here).
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import scipy.sparse as sp  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Drop compiled executables between modules: one long process
    accumulating 1000+ XLA-CPU JIT programs can segfault inside LLVM
    (observed on the full suite around the 25-minute mark)."""
    yield
    jax.clear_caches()


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
