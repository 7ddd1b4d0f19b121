"""VMEM-resident Pallas batched Cholesky solve vs oracles (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rsparse_tpu.ops.pallas_chol import pallas_spd_solve
from rsparse_tpu.ops.solvers import batched_spd_solve_blocked


def _problem(B, d, seed=0, ridge=0.1):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((B, d, 3 * d)).astype(np.float32)
    lhs = X @ X.transpose(0, 2, 1) / (3 * d) + ridge * np.eye(
        d, dtype=np.float32)
    rhs = rng.standard_normal((B, d)).astype(np.float32)
    return lhs, rhs


@pytest.mark.parametrize("B,d,bc", [(8, 64, 4), (6, 96, 4)])
def test_matches_f64_oracle(B, d, bc):
    lhs, rhs = _problem(B, d, seed=B + d)
    oracle = np.linalg.solve(lhs.astype(np.float64),
                             rhs.astype(np.float64)[..., None])[..., 0]
    x = np.asarray(pallas_spd_solve(jnp.asarray(lhs), jnp.asarray(rhs),
                                    bs=32, bc=bc, interpret=True))
    err = np.linalg.norm(x - oracle) / np.linalg.norm(oracle)
    assert err < 5e-6


def test_padded_dims_and_batch():
    # d not a multiple of the panel size, B not a multiple of the chunk
    lhs, rhs = _problem(5, 50, seed=3)
    oracle = np.linalg.solve(lhs.astype(np.float64),
                             rhs.astype(np.float64)[..., None])[..., 0]
    x = np.asarray(pallas_spd_solve(jnp.asarray(lhs), jnp.asarray(rhs),
                                    bs=32, bc=4, interpret=True))
    assert x.shape == (5, 50)
    err = np.linalg.norm(x - oracle) / np.linalg.norm(oracle)
    assert err < 5e-6


def test_matches_xla_blocked_solver():
    lhs, rhs = _problem(16, 128, seed=9)
    ref = np.asarray(batched_spd_solve_blocked(jnp.asarray(lhs),
                                               jnp.asarray(rhs)))
    x = np.asarray(pallas_spd_solve(jnp.asarray(lhs), jnp.asarray(rhs),
                                    bs=32, bc=8, interpret=True))
    assert np.allclose(x, ref, atol=2e-4, rtol=2e-3)


def test_dispatch_pallas_matches_blocked():
    """batched_spd_solve's routing (Pallas on TPU f32, blocked elsewhere)
    must be output-equivalent: compare both concrete implementations."""
    from rsparse_tpu.ops.solvers import (batched_spd_solve,
                                         batched_spd_solve_blocked)
    rng = np.random.default_rng(2)
    B, d = 64, 48
    A = rng.standard_normal((B, d, d))
    lhs = jnp.asarray((A @ A.transpose(0, 2, 1) + d * np.eye(d)),
                      jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((B, d)), jnp.float32)
    x_dispatch = np.asarray(batched_spd_solve(lhs, rhs))
    x_blocked = np.asarray(batched_spd_solve_blocked(lhs, rhs))
    x_kernel = np.asarray(pallas_spd_solve(lhs, rhs, interpret=True))
    np.testing.assert_allclose(x_dispatch, x_blocked, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(x_kernel, x_blocked, rtol=2e-4, atol=1e-5)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="compiled-kernel check needs real TPU")
def test_pallas_chol_compiled_on_tpu():
    """Hardware-mode numerics: the compiled Mosaic kernel (not interpret
    mode) vs an f64 oracle at d=128 — catches VMEM-compile regressions and
    silent precision demotions that interpret-mode tests cannot see."""
    rng = np.random.default_rng(0)
    B, d = 256, 128
    A = rng.standard_normal((B, d, d))
    lhs = (A @ A.transpose(0, 2, 1) + d * np.eye(d)).astype(np.float32)
    rhs = rng.standard_normal((B, d)).astype(np.float32)
    x = np.asarray(pallas_spd_solve(jnp.asarray(lhs), jnp.asarray(rhs)))
    x64 = np.linalg.solve(lhs.astype(np.float64),
                          rhs.astype(np.float64)[..., None])[..., 0]
    rel = np.abs(x - x64).max() / np.abs(x64).max()
    assert rel < 5e-6, f"compiled-kernel relative error {rel:.2e}"
