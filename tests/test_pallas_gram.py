"""Pallas Gram-form CG sweep kernel vs the XLA CG path (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import jax.experimental.pallas as pl
import rsparse_tpu.ops.pallas_gram as pg
from rsparse_tpu.ops.solvers import batched_cg


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pg.pl, "pallas_call", interp)


def _problem(B=32, L=64, r=16, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.standard_normal((100, r)).astype(np.float32) * 0.1
    col_idx = rng.integers(0, 100, (B, L))
    Xg = src[col_idx]
    nnz = rng.integers(1, L, (B,)).astype(np.int32)
    nnz[0] = 0          # padded/empty entity
    c = (1.0 + 4 * rng.random((B, L))).astype(np.float32)
    x0 = (rng.standard_normal((B, r)) * 0.1).astype(np.float32)
    return src, Xg, nnz, c, x0


def _xla_reference(Xg, c, nnz, x0, XtX, steps, g=0.0, rhs0=None):
    B, L, r = Xg.shape
    mask = np.arange(L)[None, :] < nnz[:, None]
    cm = np.where(mask, c, 0)
    cm1 = np.where(mask, c - 1, 0)
    rhs = np.einsum("blr,bl->br", Xg, cm - cm1 * g)
    if rhs0 is not None:
        rhs = rhs + rhs0[None, :]

    def matvec(p):
        t = jnp.einsum("blr,br->bl", Xg, p) * cm1
        return p @ XtX + jnp.einsum("bl,blr->br", t, Xg)

    return np.asarray(batched_cg(matvec, jnp.asarray(rhs), jnp.asarray(x0),
                                 steps))


@pytest.mark.parametrize("B,L,r", [(32, 64, 16), (16, 24, 128), (8, 384, 32)])
def test_gram_cg_matches_xla(B, L, r):
    src, Xg, nnz, c, x0 = _problem(B, L, r)
    lam = 0.3
    XtX = (src.T @ src + lam * np.eye(r)).astype(np.float32)
    x, loss = pg.gram_cg_implicit(
        jnp.asarray(XtX), None, jnp.asarray(Xg), jnp.asarray(c),
        jnp.asarray(nnz), jnp.asarray(x0), lam, 0.0, cg_steps=3)
    x_ref = _xla_reference(Xg, c, nnz, x0, XtX, 3)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=1e-4)
    # loss formula (wrmf_implicit.hpp:257-264), via the Gram identity
    mask = np.arange(L)[None, :] < nnz[:, None]
    cm = np.where(mask, c, 0)
    pred = np.einsum("blr,br->bl", Xg, np.asarray(x))
    le = (cm * (1 - pred) ** 2).sum(1) + lam * (np.asarray(x) ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(loss), le, rtol=2e-3, atol=1e-4)


def test_gram_cg_with_global_bias_rhs0():
    src, Xg, nnz, c, x0 = _problem(seed=2)
    lam, g = 0.2, 0.15
    r = src.shape[1]
    XtX = (src.T @ src + lam * np.eye(r)).astype(np.float32)
    rhs0 = (-g * src.sum(0)).astype(np.float32)
    x, loss = pg.gram_cg_implicit(
        jnp.asarray(XtX), jnp.asarray(rhs0), jnp.asarray(Xg),
        jnp.asarray(c), jnp.asarray(nnz), jnp.asarray(x0), lam, g,
        cg_steps=3)
    x_ref = _xla_reference(Xg, c, nnz, x0, XtX, 3, g=g, rhs0=rhs0)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=1e-4)
    # loss with global bias: sum c ((1-g) - y.x)^2 + lam ||y||^2
    L = Xg.shape[1]
    mask = np.arange(L)[None, :] < nnz[:, None]
    cm = np.where(mask, c, 0)
    pred = np.einsum("blr,br->bl", Xg, np.asarray(x))
    le = (cm * ((1 - g) - pred) ** 2).sum(1) + lam * (np.asarray(x) ** 2).sum(1)
    np.testing.assert_allclose(np.asarray(loss), le, rtol=2e-3, atol=1e-4)


def test_supported_predicate():
    assert pg.gram_cg_supported(128, 128, 128)
    assert pg.gram_cg_supported(8, 4096, 128)
    assert pg.gram_cg_supported(16, 24, 128)
    assert pg.gram_cg_supported(16, 300, 128)      # L == full block dim
    assert not pg.gram_cg_supported(12, 64, 128)   # batch not mult of 8
    assert not pg.gram_cg_supported(16, 4097, 128)  # no 8-aligned L-tile
    assert not pg.gram_cg_supported(16, 64, 512)   # rank too large


def _xla_explicit_reference(Xg, c, nnz, x0, lam, steps, dynamic):
    B, L, r = Xg.shape
    mask = np.arange(L)[None, :] < nnz[:, None]
    Xm = Xg * mask[..., None]
    conf = np.where(mask, c, 0.0)
    lam_use = lam * nnz.astype(np.float32) if dynamic else np.full(B, lam,
                                                                   np.float32)
    rhs = np.einsum("blr,bl->br", Xm, conf)

    def matvec(p):
        t = jnp.einsum("blr,br->bl", Xm, p)
        return jnp.einsum("bl,blr->br", t, Xm) + lam_use[:, None] * p

    y = np.asarray(batched_cg(matvec, jnp.asarray(rhs), jnp.asarray(x0),
                              steps))
    pred = np.einsum("blr,br->bl", Xm, y)
    loss = ((conf - pred) ** 2 * mask).sum(1) + lam_use * (y ** 2).sum(1)
    return y, loss


@pytest.mark.parametrize("dynamic", [False, True])
def test_gram_cg_explicit_matches_xla(dynamic):
    rng = np.random.default_rng(3)
    B, L, r = 16, 40, 24
    src = rng.standard_normal((80, r)).astype(np.float32) * 0.2
    Xg = src[rng.integers(0, 80, (B, L))]
    c = (1.0 + 4 * rng.random((B, L))).astype(np.float32)
    nnz = rng.integers(1, L, (B,)).astype(np.int32)
    nnz[0] = 0
    x0 = (rng.standard_normal((B, r)) * 0.1).astype(np.float32)
    lam = 0.4
    x, loss = pg.gram_cg_explicit(
        jnp.asarray(Xg), jnp.asarray(c), jnp.asarray(nnz), jnp.asarray(x0),
        lam, cg_steps=3, dynamic_lambda=dynamic)
    x_ref, l_ref = _xla_explicit_reference(Xg, c, nnz, x0, lam, 3, dynamic)
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=2e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(loss), l_ref, rtol=2e-3, atol=1e-4)
