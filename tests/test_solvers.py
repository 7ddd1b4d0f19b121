"""Batched dense solver kernels vs. numpy/scipy oracles."""

import numpy as np
import jax.numpy as jnp
import scipy.optimize

from rsparse_tpu.ops.solvers import batched_cg, batched_nnls, batched_spd_solve


def _spd_batch(rng, B, d, jitter=1.0):
    A = rng.standard_normal((B, d, d))
    lhs = A @ A.transpose(0, 2, 1) + jitter * np.eye(d)
    rhs = rng.standard_normal((B, d))
    return lhs, rhs


def test_batched_spd_solve():
    rng = np.random.default_rng(0)
    lhs, rhs = _spd_batch(rng, 17, 12)
    x = np.asarray(batched_spd_solve(jnp.asarray(lhs), jnp.asarray(rhs)))
    expect = np.linalg.solve(lhs, rhs[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-5, atol=1e-8)


def test_batched_cg_matches_exact():
    rng = np.random.default_rng(1)
    lhs, rhs = _spd_batch(rng, 9, 8, jitter=5.0)
    matvec = lambda p: jnp.einsum("bij,bj->bi", jnp.asarray(lhs), p)
    x = np.asarray(batched_cg(matvec, jnp.asarray(rhs),
                              jnp.zeros_like(jnp.asarray(rhs)), n_steps=50))
    expect = np.linalg.solve(lhs, rhs[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-4, atol=1e-6)


def test_batched_cg_warm_start_early_freeze():
    # already-converged entries must not move (per-entity freeze mirrors the
    # reference's CG_TOL break, inst/include/wrmf_implicit.hpp:27)
    rng = np.random.default_rng(2)
    lhs, rhs = _spd_batch(rng, 4, 6, jitter=3.0)
    exact = np.linalg.solve(lhs, rhs[..., None])[..., 0]
    matvec = lambda p: jnp.einsum("bij,bj->bi", jnp.asarray(lhs), p)
    x = np.asarray(batched_cg(matvec, jnp.asarray(rhs), jnp.asarray(exact),
                              n_steps=3))
    np.testing.assert_allclose(x, exact, rtol=1e-5, atol=1e-7)


def test_batched_nnls():
    rng = np.random.default_rng(3)
    B, d = 12, 7
    lhs, rhs = _spd_batch(rng, B, d, jitter=2.0)
    init = np.abs(rng.standard_normal((B, d)))
    x = np.asarray(batched_nnls(jnp.asarray(lhs), jnp.asarray(rhs),
                                jnp.asarray(init), max_iter=2000))
    assert (x >= 0).all()
    for b in range(B):
        expect, _ = scipy.optimize.nnls(lhs[b], rhs[b])
        np.testing.assert_allclose(x[b], expect, rtol=1e-3, atol=1e-3)


def test_blocked_spd_solve_matches_numpy():
    """MXU-friendly blocked Cholesky (used for large batches on TPU where
    lax.linalg lowers to scalar code) vs the numpy oracle."""
    from rsparse_tpu.ops.solvers import batched_spd_solve_blocked
    rng = np.random.default_rng(0)
    for B, d in [(4, 12), (16, 32), (9, 100), (8, 128), (3, 129)]:
        A = rng.standard_normal((B, d, d))
        lhs = A @ A.transpose(0, 2, 1) + d * np.eye(d)
        rhs = rng.standard_normal((B, d))
        x = np.asarray(batched_spd_solve_blocked(jnp.asarray(lhs),
                                                 jnp.asarray(rhs)))
        expect = np.linalg.solve(lhs, rhs[..., None])[..., 0]
        np.testing.assert_allclose(x, expect, rtol=1e-10, atol=1e-12)


def test_spd_solve_dispatch_consistency():
    """Both dispatch regimes of batched_spd_solve agree."""
    from rsparse_tpu.ops.solvers import (batched_spd_solve,
                                         batched_spd_solve_blocked)
    rng = np.random.default_rng(1)
    B, d = 70, 32   # large enough to hit the blocked path
    A = rng.standard_normal((B, d, d))
    lhs = A @ A.transpose(0, 2, 1) + d * np.eye(d)
    rhs = rng.standard_normal((B, d))
    a = np.asarray(batched_spd_solve(jnp.asarray(lhs), jnp.asarray(rhs)))
    b = np.asarray(batched_spd_solve_blocked(jnp.asarray(lhs),
                                             jnp.asarray(rhs)))
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_exact_solvers_pin_matmul_precision():
    """The exact solve path must pin HIGHEST matmul precision: the TPU
    default lowers f32 dots to one bf16 MXU pass (~3e-3 relative solution
    error — measured on v5e), silently breaking the exact-solver contract.
    CPU runs are exact either way, so this asserts on the jaxpr."""
    from rsparse_tpu.ops.solvers import batched_spd_solve_blocked
    import jax
    lhs = jnp.eye(64)[None].repeat(32, 0)
    rhs = jnp.ones((32, 64))
    jaxpr = str(jax.make_jaxpr(batched_spd_solve_blocked)(lhs, rhs))
    assert "HIGHEST" in jaxpr

    from rsparse_tpu.ops.als import ALSConfig, wrmf_sweep, solver_code
    from rsparse_tpu.sparse.device import bucket_rows
    import scipy.sparse as sp
    rng = np.random.default_rng(0)
    x = sp.random(64, 32, 0.2, random_state=0, format="csr")
    br = bucket_rows(x, jnp.float32)
    U = jnp.asarray(rng.standard_normal((64, 8)), jnp.float32)
    V = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    cfg = ALSConfig(feedback="implicit", solver=solver_code("cholesky"))
    jaxpr = str(jax.make_jaxpr(
        lambda u, v: wrmf_sweep(u, v, br.buckets, None, 0.1, 0.0, cfg))(U, V))
    assert "HIGHEST" in jaxpr


def test_blocked_solve_chunked_batch_matches():
    """Batches beyond the HBM sweet spot are split into independent chunk
    chains inside one program; results must equal the unchunked math."""
    from rsparse_tpu.ops import solvers
    rng = np.random.default_rng(2)
    B, d = 2 * solvers._SOLVE_CHUNK, 8
    A = rng.standard_normal((B, d, 4)).astype(np.float32)
    lhs = np.einsum("bik,bjk->bij", A, A) + np.eye(d, dtype=np.float32)
    rhs = rng.standard_normal((B, d)).astype(np.float32)
    x = np.asarray(solvers.batched_spd_solve_blocked(jnp.asarray(lhs),
                                                     jnp.asarray(rhs)))
    expect = np.linalg.solve(lhs, rhs[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=2e-4, atol=2e-5)
