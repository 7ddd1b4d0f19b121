"""VMEM-resident Pallas batched Cholesky solve vs oracles (interpret mode)."""

import numpy as np
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
