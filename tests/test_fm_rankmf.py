"""FactorizationMachine (reference test-fm.R) and RankMF."""

import numpy as np
import pytest
import scipy.sparse as sp

from rsparse_tpu.models.fm import FactorizationMachine
from rsparse_tpu.models.rankmf import RankMF


def test_fm_learns_xor():
    """FM must fit XOR — the nonlinearity canary (reference test-fm.R:2-17)."""
    x = sp.csr_matrix(np.array([[0, 0], [0, 1], [1, 0], [1, 1]], float))
    y = np.array([0.0, 1.0, 1.0, 0.0])
    x_big = sp.vstack([x] * 200).tocsr()
    y_big = np.tile(y, 200)
    fm = FactorizationMachine(learning_rate_w=0.2, rank=2, lambda_w=0,
                              lambda_v=0, family="binomial", seed=42)
    fm.fit(x_big, y_big, n_iter=80)
    p = fm.predict(x)
    assert p[0] < 0.05 and p[3] < 0.05, f"negatives {p}"
    assert p[1] > 0.95 and p[2] > 0.95, f"positives {p}"


def test_fm_gaussian_regression():
    rng = np.random.default_rng(0)
    n, p = 1500, 40
    x = sp.random(n, p, density=0.3, random_state=np.random.RandomState(1),
                  format="csr")
    beta = rng.standard_normal(p)
    y = x @ beta + 0.01 * rng.standard_normal(n)
    fm = FactorizationMachine(learning_rate_w=0.1, rank=2, family="gaussian",
                              seed=0)
    fm.fit(x, y, n_iter=50)
    pred = fm.predict(x)
    ss_res = np.sum((pred - y) ** 2)
    ss_tot = np.sum((y - y.mean()) ** 2)
    assert 1 - ss_res / ss_tot > 0.8


def test_fm_errors():
    x = sp.random(10, 5, density=0.5, format="csr")
    fm = FactorizationMachine(seed=0)
    with pytest.raises(ValueError):
        fm.partial_fit(x, np.zeros(7))
    fm.partial_fit(x, np.ones(10))
    with pytest.raises(ValueError):
        fm.partial_fit(sp.random(10, 6, density=0.5, format="csr"),
                       np.ones(10))


@pytest.mark.parametrize("loss", ["bpr", "warp"])
def test_rankmf_separates(ml100k, loss):
    """Ranking quality: positives should score above random negatives."""
    train = sp.csr_matrix(ml100k)[:300]
    model = RankMF(rank=8, learning_rate=0.1, loss=loss, seed=0,
                   max_negative_samples=20)
    model.partial_fit_transform(train, n_iter=100)
    emb = model.partial_fit_transform(train, n_iter=100)
    assert emb.shape == (300, 8)
    assert model.components.shape == (8, train.shape[1])
    # AUC proxy from training should beat random
    assert model.auc_history[-1] > 0.65, model.auc_history

    # direct check: mean score of held positives > mean score of negatives
    scores = np.asarray(emb) @ model.components
    pos_mask = (train.toarray() > 0)
    pos_mean = scores[pos_mask].mean()
    neg_mean = scores[~pos_mask].mean()
    assert pos_mean > neg_mean


def test_rankmf_side_features():
    """Item side features: identical-feature items get identical embeddings."""
    rng = np.random.RandomState(0)
    x = sp.random(50, 30, density=0.2, random_state=rng, format="csr")
    x.data[:] = 1.0
    # 10 item features shared across 30 items
    item_feats = sp.csr_matrix(
        (np.ones(30), (np.arange(30), np.arange(30) % 10)), shape=(30, 10))
    model = RankMF(rank=4, learning_rate=0.05, seed=0)
    emb = model.partial_fit_transform(x, item_features=item_feats, n_iter=10)
    assert emb.shape == (50, 4)
    comps = model.components  # (4, 30)
    np.testing.assert_allclose(comps[:, 0], comps[:, 10], rtol=1e-6)
    np.testing.assert_allclose(comps[:, 3], comps[:, 23], rtol=1e-6)


def test_fm_intercept_ignores_padding_rows():
    """Batch-padding rows must not contribute to the intercept update.

    One real row padded to a 32-row block: gaussian FM on a single feature
    has no interaction term (s1^2 == s2), so the exact post-update w0 is
    computable by hand: dL = 2*(0 - y); acc = 1 + dL^2; w0 = -lr*dL/sqrt(acc).
    Pre-fix, ~31 phantom copies of dL inflated both sums."""
    from rsparse_tpu.models.fm import FactorizationMachine
    x = sp.csr_matrix(np.array([[1.0]]))
    m = FactorizationMachine(learning_rate_w=0.2, rank=1, family="gaussian",
                             seed=0)
    m.partial_fit(x, np.array([1.0]))
    expect = 0.2 * 2.0 / np.sqrt(1.0 + 4.0)
    np.testing.assert_allclose(float(m.w0), expect, rtol=1e-6)


def test_rankmf_rmsprop_duplicate_ids_stay_finite():
    """RMSProp accumulators under heavy in-batch duplication (4 users,
    batch 512) must stay non-negative: the EMA delta is divided by the
    duplicate count, else the accumulator goes negative -> NaN under sqrt."""
    rng = np.random.RandomState(3)
    x = sp.random(4, 30, density=0.6, random_state=rng, format="csr")
    x.data[:] = 1.0
    model = RankMF(rank=4, learning_rate=0.1, optimizer="rmsprop",
                   gamma=0.0, loss="bpr", seed=0, batch_size=512)
    emb = model.partial_fit_transform(x, n_iter=30)
    assert np.isfinite(np.asarray(emb)).all()
    assert np.isfinite(np.asarray(model._accW)).all()
    assert (np.asarray(model._accW) >= 0).all()
    assert np.isfinite(model.components).all()


def test_rankmf_returned_embeddings_survive_refit():
    """partial_fit_transform/transform return buffers that must stay valid
    after the next fit call (the live tables are donated into the epoch)."""
    rng = np.random.RandomState(4)
    x = sp.random(12, 20, density=0.4, random_state=rng, format="csr")
    x.data[:] = 1.0
    model = RankMF(rank=4, seed=0, batch_size=64)
    emb1 = model.partial_fit_transform(x, n_iter=2)
    t1 = model.transform(x)
    model.partial_fit_transform(x, n_iter=2)      # donates the live tables
    assert np.isfinite(np.asarray(emb1)).all()    # still readable
    assert np.isfinite(np.asarray(t1)).all()


def test_rankmf_rmsprop_sigmoid():
    rng = np.random.RandomState(1)
    x = sp.random(40, 25, density=0.25, random_state=rng, format="csr")
    x.data[:] = 1.0
    model = RankMF(rank=4, learning_rate=0.05, optimizer="rmsprop",
                   gamma=0.9, kernel="sigmoid", loss="warp", seed=0)
    emb = model.partial_fit_transform(x, n_iter=20)
    assert np.isfinite(np.asarray(emb)).all()
    assert np.isfinite(model.components).all()


def test_rankmf_heldout_ranking_quality(ml100k):
    """End-to-end quality gate on a real split: BPR-MF at a working
    learning-rate scale must rank held-out positives well (AUC ~0.87,
    NDCG@10 ~0.22 measured).  Guards against silent convergence
    regressions — tiny-init + unit AdaGrad accumulators make the model
    extremely learning-rate sensitive (reference semantics), so a scale
    bug shows up here as near-random ranking."""
    import rsparse_tpu as rt
    rng = np.random.default_rng(0)
    train, test = rt.train_test_split(ml100k, 0.2, rng)
    tr = sp.csr_matrix(train)
    m = RankMF(rank=16, learning_rate=0.5, loss="bpr", seed=0,
               batch_size=2048)
    emb = m.partial_fit_transform(tr, n_iter=200)
    assert m.auc_history[-1] > 0.8
    scores = np.asarray(emb, np.float64) @ np.asarray(m.components)
    scores[tr.nonzero()] = -np.inf
    idx = np.argsort(-scores, axis=1)[:, :10]
    ndcg = float(np.nanmean(rt.ndcg_k(idx, test)))
    assert ndcg > 0.15, ndcg


def test_user_hash_membership_matches_binary_search():
    """The staged hash sets (build_user_hash) must answer exactly the same
    membership queries as the reference-style sorted-segment binary search
    (src/rankmf.cpp:36-56) — including degenerate empty rows."""
    import jax.numpy as jnp
    from rsparse_tpu.models.rankmf import (
        _MAX_PROBE, _in_hash_set, _in_sorted_segment, build_user_hash)

    rng = np.random.default_rng(0)
    n_user, n_item = 300, 500
    x = sp.random(n_user, n_item, density=0.05, random_state=3,
                  format="csr")
    x[7] = 0          # force an empty row
    x = sp.csr_matrix(x)
    x.eliminate_zeros()
    x.sort_indices()
    uhash = build_user_hash(x, _MAX_PROBE)

    u = jnp.asarray(rng.integers(0, n_user, (64,)).astype(np.int32))
    q = jnp.asarray(rng.integers(0, n_item, (64, 40)).astype(np.int32))
    got = np.asarray(_in_hash_set(*uhash, u, q, _MAX_PROBE))

    flat_idx = jnp.asarray(x.indices, jnp.int32)
    p1 = jnp.asarray(x.indptr[:-1], jnp.int32)[u]
    nnz = jnp.asarray(np.diff(x.indptr), jnp.int32)[u]
    steps = int(np.ceil(np.log2(int(np.diff(x.indptr).max()) + 1))) + 1
    want = np.asarray(_in_sorted_segment(flat_idx, p1, nnz, q, steps))
    np.testing.assert_array_equal(got, want)


def test_user_hash_probe_overflow_growth():
    """Adversarial hash collisions (many items hashing into one window)
    must trigger per-user capacity growth, not a silent wrong table."""
    from rsparse_tpu.models.rankmf import (_MAX_PROBE, _in_hash_set,
                                           build_user_hash)
    import jax.numpy as jnp

    # one user with many items — guaranteed clustered probes at tiny caps
    items = np.arange(0, 4096, 4, dtype=np.int32)
    x = sp.csr_matrix((np.ones(len(items)), items,
                       np.asarray([0, len(items)])), shape=(1, 4096))
    uhash = build_user_hash(x, max_probe=2)
    u = jnp.zeros((1,), jnp.int32)
    q = jnp.asarray(np.arange(4096, dtype=np.int32)[None, :])
    got = np.asarray(_in_hash_set(*uhash, u, q, 2))[0]
    want = np.zeros(4096, bool)
    want[items] = True
    np.testing.assert_array_equal(got, want)
