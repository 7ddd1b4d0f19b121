"""SGD family: GloVe (reference test-glove.R), FTRL (test-ftrl.R)."""

import numpy as np
import pytest
import scipy.sparse as sp

from rsparse_tpu.models.ftrl import FTRL
from rsparse_tpu.models.glove import GloVe


def test_glove_ml100k(ml100k):
    """GloVe on crossprod(sign(ml100k)) (reference test-glove.R)."""
    m = sp.csr_matrix(ml100k)
    s = m.sign()
    tcm = (s.T @ s).tocoo()
    model = GloVe(rank=4, x_max=10, learning_rate=0.1, seed=0)
    emb = model.fit_transform(tcm, n_iter=3)
    assert emb.shape == (1682, 4)
    assert model.components.shape == (4, 1682)
    assert len(model.cost_history) == 3
    # cost must decrease
    assert model.cost_history[-1] < model.cost_history[0]
    assert np.isfinite(np.asarray(emb)).all()


def test_glove_triangular_equivalence():
    """A triangular co-occurrence runs a second pass on the transposed
    triplets (reference R/model_GloVe.R:133-136) — the final cost should
    resemble fitting the symmetric matrix."""
    rng = np.random.RandomState(0)
    n = 60
    full = sp.random(n, n, density=0.2, random_state=rng)
    sym = full + full.T
    sym.data[:] = np.abs(sym.data) + 0.5
    upper = sp.triu(sym).tocoo()
    m1 = GloVe(rank=4, x_max=5, seed=1)
    m1.fit_transform(upper, n_iter=4)
    # triangular input processes both orientations per epoch
    assert len(m1.cost_history) == 4
    assert m1.cost_history[-1] < m1.cost_history[0]


def test_glove_learning_rate_guard():
    rng = np.random.RandomState(1)
    m = sp.random(40, 40, density=0.3, random_state=rng).tocoo()
    m.data = np.abs(m.data) + 1
    model = GloVe(rank=4, x_max=10, learning_rate=500.0, seed=0)
    with pytest.raises(FloatingPointError):
        model.fit_transform(m, n_iter=5)


def _planted_problem(n=2000, p=500, seed=0):
    """Synthetic planted-sign problem like reference test-ftrl.R:3-14."""
    rs = np.random.RandomState(seed)
    x = sp.random(n, p, density=0.1, random_state=rs, format="csr")
    x.data = np.sign(rs.randn(x.nnz))
    beta = np.zeros(p)
    beta[:50] = 3.0
    beta[50:100] = -3.0
    logits = x @ beta
    y = (rs.rand(n) < 1 / (1 + np.exp(-logits))).astype(float)
    return x, y, beta


def test_ftrl_recovers_signs():
    x, y, beta = _planted_problem()
    model = FTRL(learning_rate=0.05, lambda_=1e-4, l1_ratio=1.0, seed=0)
    model.fit(x, y, n_iter=10)
    w = model.coef()
    assert w.shape == (500,)
    # strong positive features get positive weights, negatives negative
    assert np.mean(w[:50] > 0) > 0.9
    assert np.mean(w[50:100] < 0) > 0.9
    p = model.predict(x)
    assert p.shape == (2000,)
    assert ((p >= 0) & (p <= 1)).all()
    # predictions correlate with labels
    assert np.corrcoef(p, y)[0, 1] > 0.3


def test_ftrl_more_epochs_better():
    """2 epochs should fit train data better than 1
    (reference test-ftrl.R:46-54)."""
    x, y, _ = _planted_problem(seed=3)

    def logloss(m):
        p = np.clip(m.predict(x), 1e-9, 1 - 1e-9)
        return -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))

    m1 = FTRL(learning_rate=0.05, seed=0)
    m1.fit(x, y, n_iter=1)
    m2 = FTRL(learning_rate=0.05, seed=0)
    m2.fit(x, y, n_iter=3)
    assert logloss(m2) < logloss(m1)


def test_ftrl_dump_load_roundtrip():
    """dump/load round-trip & state isolation (reference test-ftrl.R:26-42)."""
    x, y, _ = _planted_problem(seed=4)
    m = FTRL(learning_rate=0.05, lambda_=1e-3, seed=0)
    m.partial_fit(x, y)
    dump = m.dump()
    w_before = m.coef()
    m2 = FTRL.load(dump)
    np.testing.assert_allclose(m2.coef(), w_before)
    # training the restored model must not mutate the dump
    m2.partial_fit(x, y)
    m3 = FTRL.load(dump)
    np.testing.assert_allclose(m3.coef(), w_before)
    assert not np.allclose(m2.coef(), w_before)


def test_ftrl_dimension_errors():
    x, y, _ = _planted_problem(seed=5)
    m = FTRL(seed=0)
    m.partial_fit(x, y)
    bad = sp.random(10, 123, density=0.1, format="csr")
    with pytest.raises(ValueError):
        m.partial_fit(bad, np.zeros(10))
    with pytest.raises(ValueError):
        m.partial_fit(x, y[:-5])
    xnan = x.copy()
    xnan.data[0] = np.nan
    with pytest.raises(ValueError):
        m.partial_fit(xnan, y)


def test_ftrl_dropout_runs():
    x, y, _ = _planted_problem(seed=6)
    m = FTRL(learning_rate=0.05, dropout=0.3, seed=0)
    m.fit(x, y, n_iter=2)
    assert np.isfinite(m.coef()).all()
