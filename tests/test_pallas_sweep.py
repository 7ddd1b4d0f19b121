"""Fused whole-solve Pallas kernel (ops/pallas_sweep.py) vs the XLA CG path,
in interpret mode on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl
import rsparse_tpu.ops.pallas_sweep as ps
from rsparse_tpu.ops.als import (ALSConfig, CONJUGATE_GRADIENT,
                                 _solve_bucket_implicit)
from rsparse_tpu.sparse.device import RowBucket


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr(ps.pl, "pallas_call", interp)


def _mk(B, L, d, H, seed=0):
    rng = np.random.default_rng(seed)
    n_src = 200
    src = (rng.standard_normal((n_src, d)) * 0.1).astype(np.float32)
    bucket = RowBucket(
        row_ids=jnp.arange(B, dtype=jnp.int32),
        col_idx=jnp.asarray(rng.integers(0, n_src, (B, L)).astype(np.int32)),
        values=jnp.asarray((1.0 + 4 * rng.random((B, L))).astype(np.float32)),
        nnz=jnp.asarray(np.r_[0, rng.integers(0, L + 1, B - 1)]
                        .astype(np.int32)))
    x0 = (rng.standard_normal((B, d)) * 0.1).astype(np.float32)
    hot_W = V_hot = None
    if H:
        hw = rng.random((B, H)).astype(np.float32)
        hw[hw < 0.6] = 0.0
        hw[hw > 0] += 1.0
        hot_W = jnp.asarray(hw)
        V_hot = jnp.asarray(rng.standard_normal((H, d)) * 0.1, jnp.float32)
    return src, bucket, x0, hot_W, V_hot


@pytest.mark.parametrize("B,L,d,H,g,mxu_bf16", [
    (64, 32, 16, 0, 0.0, False),
    (32, 8, 128, 0, 0.0, False),
    (64, 16, 16, 128, 0.0, False),
    (64, 16, 16, 128, 0.15, False),
    (64, 64, 32, 256, 0.15, True),
    (56, 40, 24, 0, 0.0, True),      # TB with a sub-32 sub-group size
])
def test_fused_matches_xla(B, L, d, H, g, mxu_bf16):
    src, bucket, x0, hot_W, V_hot = _mk(B, L, d, H)
    XtX = jnp.asarray(src.T @ src + 0.5 * np.eye(d), jnp.float32)
    rhs0 = jnp.asarray(np.random.default_rng(1).standard_normal(d) * 0.1,
                       jnp.float32)
    lam, gj = jnp.float32(0.5), jnp.float32(g)
    cdt = "bfloat16" if mxu_bf16 else "float32"
    cfg = ALSConfig(feedback="implicit", solver=CONJUGATE_GRADIENT,
                    use_global_bias=True, compute_dtype=cdt)
    y_ref, l_ref = _solve_bucket_implicit(
        jnp.asarray(src), None, XtX, rhs0, bucket, jnp.asarray(x0),
        lam, gj, cfg, jnp.float32, hot_W=hot_W, V_hot=V_hot)

    gdt = jnp.bfloat16 if mxu_bf16 else jnp.float32
    Xg = jnp.asarray(src)[bucket.col_idx].astype(gdt)
    y, l = ps.fused_implicit_solve(
        XtX, rhs0, Xg, bucket.values, bucket.nnz, jnp.asarray(x0), lam, gj,
        W=None if not H else hot_W.astype(gdt),
        Vh=None if not H else V_hot.astype(gdt))

    tol = 2e-2 if mxu_bf16 else 2e-5
    scale = float(jnp.max(jnp.abs(y_ref))) + 1e-9
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=tol * scale)
    np.testing.assert_allclose(np.asarray(l), np.asarray(l_ref),
                               rtol=tol, atol=tol)


def test_supported_and_tiling():
    assert ps.fused_implicit_supported(64, 32, 128, 2, 0)
    assert ps.fused_implicit_supported(32768, 8, 128, 2, 4096)
    assert not ps.fused_implicit_supported(60, 32, 128, 2, 0)   # B % 8
    assert not ps.fused_implicit_supported(64, 12, 128, 2, 0)   # L % 8
    for tb in (8, 24, 56, 64, 512):
        s = ps._pick_s(tb)
        assert tb % s == 0 and s <= ps._S
