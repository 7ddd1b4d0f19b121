"""Edge cases & combined options across the model zoo."""

import numpy as np
import pytest
import scipy.sparse as sp

from rsparse_tpu import WRMF, GloVe, ap_k, ndcg_k, top_product


def test_wrmf_explicit_all_biases(ml100k_split):
    """Explicit + user/item + global bias together (the full bias stack,
    reference R/model_WRMF.R:260-289)."""
    train, cv = ml100k_split
    m = WRMF(rank=5, lambda_=0.5, feedback="explicit", solver="cholesky",
             with_user_item_bias=True, with_global_bias=True,
             precision="double", seed=0)
    emb = m.fit_transform(train, n_iter=3, convergence_tol=-1)
    assert m.global_bias == pytest.approx(train.data.mean())
    emb2 = m.transform(train)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2),
                               rtol=1e-6, atol=1e-9)
    # predictions should roughly center around the global mean
    preds = m.predict(cv, k=5, not_recommend=None)
    assert 2.0 < preds.scores.mean() < 5.5


def test_wrmf_preprocess_hook(ml100k_split):
    """Confidence transform hook applied at fit AND transform time
    (reference R/model_WRMF.R:47-53,379)."""
    train, _ = ml100k_split
    calls = []

    def conf(m):
        calls.append(m.nnz)
        m = m.copy()
        m.data = np.log1p(m.data) * 10
        return m

    m = WRMF(rank=4, lambda_=0.1, feedback="implicit", solver="cholesky",
             preprocess=conf, precision="double", seed=0)
    emb = m.fit_transform(train, n_iter=2, convergence_tol=-1)
    assert len(calls) == 1
    emb2 = m.transform(train)
    assert len(calls) == 2
    np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2),
                               rtol=1e-6, atol=1e-9)


def test_wrmf_implicit_global_bias_value(ml100k_split):
    """Implicit global bias = s/(s + n*m - nnz) (R/model_WRMF.R:286-288)."""
    train, _ = ml100k_split
    m = WRMF(rank=4, lambda_=0.1, feedback="implicit", solver="cholesky",
             with_global_bias=True, precision="double", seed=0)
    m.fit_transform(train, n_iter=1, convergence_tol=-1)
    s = train.data.sum()
    expect = s / (s + train.shape[0] * train.shape[1] - train.nnz)
    assert m.global_bias == pytest.approx(expect)


def test_wrmf_single_iteration_and_convergence(ml100k_split):
    train, _ = ml100k_split
    m = WRMF(rank=4, lambda_=10.0, feedback="implicit", solver="cholesky",
             precision="double", seed=0)
    m.fit_transform(train, n_iter=20, convergence_tol=0.1)
    # loose tolerance must trigger early convergence
    assert len(m.loss_history) < 20


def test_glove_shuffle_reproducible():
    rng = np.random.RandomState(0)
    m = sp.random(50, 50, density=0.3, random_state=rng).tocoo()
    m.data = np.abs(m.data) + 1
    a = GloVe(rank=4, x_max=5, shuffle=True, seed=7)
    ea = a.fit_transform(m, n_iter=3)
    b = GloVe(rank=4, x_max=5, shuffle=True, seed=7)
    eb = b.fit_transform(m, n_iter=3)
    np.testing.assert_allclose(np.asarray(ea), np.asarray(eb))
    c = GloVe(rank=4, x_max=5, shuffle=True, seed=8)
    ec = c.fit_transform(m, n_iter=3)
    assert not np.allclose(np.asarray(ea), np.asarray(ec))


def test_metrics_nan_semantics():
    # ap_k of a user with no relevant items is NaN (mean of empty in R)
    actual = sp.csr_matrix((2, 5))
    actual[0, 1] = 1.0
    actual = sp.csr_matrix(actual)
    res = ap_k(np.array([[1, 2], [0, 1]]), actual)
    assert res[0] == 1.0
    assert np.isnan(res[1])
    res2 = ndcg_k(np.array([[1, 2], [0, 1]]), actual)
    assert res2[1] == 0.0


def test_top_product_k_equals_n_items():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((5, 3)).astype(np.float32)
    y = rng.standard_normal((3, 8)).astype(np.float32)
    idx, scores = top_product(x, y, 8)
    expect = np.argsort(-(x @ y), axis=1)
    np.testing.assert_array_equal(idx, expect)


def test_wrmf_fully_empty_matrix():
    x = sp.csr_matrix((20, 15))
    m = WRMF(rank=3, lambda_=0.1, solver="cholesky", precision="double",
             seed=0)
    emb = m.fit_transform(x, n_iter=1, convergence_tol=-1)
    np.testing.assert_allclose(np.asarray(emb), 0.0)
