"""SoftALS family vs. dense SVD ground truth (reference test-soft-als.R),
PureSVD (test-puresvd.R), LinearFlow (test-linear-flow.R), ScaleNormalize."""

import numpy as np
import pytest
import scipy.sparse as sp

from rsparse_tpu.models.linear_flow import LinearFlow
from rsparse_tpu.models.pure_svd import PureSVD
from rsparse_tpu.models.scale_normalize import ScaleNormalize
from rsparse_tpu.models.soft_als import (SVDResult, pad_svd, soft_impute,
                                         soft_svd, svd_tall_skinny)


def test_soft_svd_matches_truncated_svd(ml100k):
    k = 10
    m = sp.csr_matrix(ml100k)[:100, :200]
    res = soft_svd(m, rank=k, n_iter=500, convergence_tol=1e-8,
                   precision="double", seed=42)
    md = m.toarray()
    u, s, vt = np.linalg.svd(md, full_matrices=False)
    restored_truth = u[:, :k] @ np.diag(s[:k]) @ vt[:k]
    restored = (np.asarray(res.u) * np.asarray(res.d)) @ np.asarray(res.v).T
    # same tolerance as the reference (test-soft-als.R:8-14)
    np.testing.assert_allclose(restored, restored_truth, atol=1e-1)
    # orthonormality (test-soft-als.R:17-31)
    uu = np.asarray(res.u).T @ np.asarray(res.u)
    vv = np.asarray(res.v).T @ np.asarray(res.v)
    np.testing.assert_allclose(uu, np.eye(res.d.shape[0]), atol=1e-6)
    np.testing.assert_allclose(vv, np.eye(res.d.shape[0]), atol=1e-6)
    # singular values match
    np.testing.assert_allclose(np.asarray(res.d), s[:k], rtol=1e-2)


def test_soft_svd_lambda_shrinks():
    rng = np.random.RandomState(0)
    m = sp.random(80, 60, density=0.3, random_state=rng, format="csr")
    lam = 0.5
    plain = soft_svd(m, rank=5, lambda_=0.0, n_iter=50, precision="double",
                     seed=1)
    reg = soft_svd(m, rank=5, lambda_=lam, n_iter=50, precision="double",
                   seed=1)
    # soft-thresholding: d_reg ~= max(d - lambda, 0) (R/SoftALS.R:226)
    np.testing.assert_allclose(np.asarray(reg.d),
                               np.maximum(np.asarray(plain.d) - lam, 0)[
                                   : reg.d.shape[0]], rtol=5e-2, atol=5e-3)


def test_soft_impute_completes_low_rank():
    # plant a rank-3 matrix, observe 50% of entries, check recovery there
    rng = np.random.default_rng(0)
    B = rng.standard_normal((3, 40))
    full = (rng.standard_normal((60, 3)) * np.array([5.0, 3.0, 2.0])) @ B
    mask = rng.random((60, 40)) < 0.5
    obs = sp.csr_matrix(np.where(mask, full, 0.0))
    res = soft_impute(obs, rank=3, lambda_=0.0, n_iter=200,
                      convergence_tol=1e-7, precision="double", seed=2)
    approx = (np.asarray(res.u) * np.asarray(res.d)) @ np.asarray(res.v).T
    err = np.abs(approx - full)[mask].mean() / np.abs(full[mask]).mean()
    assert err < 0.05, f"observed-entry relative error {err}"


def test_pad_svd_orthonormal():
    rng = np.random.default_rng(3)
    m = rng.standard_normal((30, 20))
    u, s, vt = np.linalg.svd(m, full_matrices=False)
    init = SVDResult(u[:, :4], s[:4], vt[:4].T)
    padded = pad_svd(init, 8, rng)
    assert padded.u.shape == (30, 8) and padded.v.shape == (20, 8)
    np.testing.assert_allclose(np.asarray(padded.u).T @ np.asarray(padded.u),
                               np.eye(8), atol=1e-6)
    np.testing.assert_allclose(np.asarray(padded.v).T @ np.asarray(padded.v),
                               np.eye(8), atol=1e-6)


def test_soft_svd_warm_start(ml100k):
    m = sp.csr_matrix(ml100k)[:100, :200]
    first = soft_svd(m, rank=6, n_iter=3, convergence_tol=-1,
                     precision="double", seed=4)
    warm = soft_svd(m, rank=10, n_iter=50, init=first, precision="double",
                    seed=4)
    assert warm.d.shape[0] <= 10 and warm.u.shape == (100, warm.d.shape[0])


def test_puresvd(ml100k):
    rank = 8
    model = PureSVD(rank=rank, lambda_=0, precision="double", seed=0)
    train = sp.csr_matrix(ml100k)[:300]
    train.row_names = ml100k.row_names[:300]
    train.col_names = ml100k.col_names
    emb = model.fit_transform(train, n_iter=50, convergence_tol=1e-5)
    assert emb.shape == (300, rank)
    assert model.components.shape == (rank, 1682)
    preds = model.predict(train, k=10)
    assert preds.shape == (300, 10)
    t = model.transform(train)
    np.testing.assert_allclose(np.asarray(t), np.asarray(emb), rtol=1e-6)
    sim = model.get_similar_items(model.item_ids[0], k=5)
    assert sim.indices.shape == (1, 5)


def test_linear_flow(ml100k_split):
    train, cv = ml100k_split
    model = LinearFlow(rank=8, lambda_=0, precision="double", seed=0,
                       solve_right_singular_vectors="svd")
    emb = model.fit_transform(train)
    assert emb.shape == (900, 8)
    assert model.components.shape == (8, 1682)
    preds = model.predict(cv, k=10)
    assert preds.shape == (cv.shape[0], 10)


def test_linear_flow_cv_lambda(ml100k_split):
    train, cv = ml100k_split
    from rsparse_tpu.utils.split import train_test_split
    rng = np.random.default_rng(5)
    cv_train, cv_test = train_test_split(cv, 0.5, rng)
    model = LinearFlow(rank=8, precision="double", seed=0,
                       solve_right_singular_vectors="svd")
    res = model.cross_validate_lambda(train, cv_train, cv_test,
                                      lambda_="auto@10", metric="map@10")
    assert len(res) == 10
    lambdas = [r["lambda"] for r in res]
    assert all(b > a for a, b in zip(lambdas, lambdas[1:]))
    assert model.components is not None
    assert all(np.isfinite(r["score"]) for r in res)


def test_scale_normalize(ml100k):
    m = sp.csr_matrix(ml100k)[:100]
    sn = ScaleNormalize(scale=0.5, norm=2, target="columns")
    out = sn.fit_transform(m)
    assert out.shape == m.shape
    # columns scaled by norm^(scale-1): new norm = old_norm^scale
    old = np.sqrt(np.asarray(m.power(2).sum(axis=0)).ravel())
    new = np.sqrt(np.asarray(out.power(2).sum(axis=0)).ravel())
    nz = old > 0
    np.testing.assert_allclose(new[nz], old[nz] ** 0.5, rtol=1e-10)

    sn_rows = ScaleNormalize(scale=0.4, norm=1, target="rows")
    out2 = sn_rows.fit_transform(m)
    old = np.asarray(np.abs(m).sum(axis=1)).ravel()
    new = np.asarray(np.abs(out2).sum(axis=1)).ravel()
    nz = old > 0
    np.testing.assert_allclose(new[nz], old[nz] ** 0.4, rtol=1e-10)


def test_soft_impute_bf16_gather_close_to_f32():
    """bfloat16 factor gathers (f32 accumulation) must reconstruct nearly
    as well as the f32 path and keep orthonormal singular vectors."""
    import numpy as np
    import scipy.sparse as sp
    from rsparse_tpu import soft_impute

    rng = np.random.default_rng(3)
    truth = rng.standard_normal((80, 50)) @ rng.standard_normal((50, 60))
    mask = rng.random((80, 60)) < 0.5
    x = sp.csr_matrix(np.where(mask, truth, 0.0))
    f32 = soft_impute(x, rank=12, lambda_=0.5, n_iter=30, seed=0)
    b16 = soft_impute(x, rank=12, lambda_=0.5, n_iter=30, seed=0,
                      compute_dtype="bfloat16")

    def recon(svd):
        return np.asarray(svd.u) * np.asarray(svd.d) @ np.asarray(svd.v).T

    r32, r16 = recon(f32), recon(b16)
    err = np.linalg.norm(r16 - r32) / np.linalg.norm(r32)
    assert err < 0.05, err
    vtv = np.asarray(b16.v).T @ np.asarray(b16.v)
    np.testing.assert_allclose(vtv, np.eye(vtv.shape[0]), atol=1e-4)


def test_linear_flow_cv_all_nan_scores_keep_first_solve():
    """ADVICE r4 regression: a NaN score must never poison the best-score
    bar.  With an EMPTY test matrix every lambda scores NaN (nanmean of
    no relevant users); the model must still record a usable solve (the
    first lambda's components) instead of crashing or keeping None."""
    import warnings

    rng = np.random.default_rng(0)
    x = sp.random(60, 40, density=0.2, random_state=1, format="csr")
    x.data[:] = 1.0
    empty_test = sp.csr_matrix((30, 40))
    cv_train = sp.csr_matrix(x[:30])
    model = LinearFlow(rank=4, precision="double", seed=0)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # nanmean of empty slices
        res = model.cross_validate_lambda(x, cv_train, empty_test,
                                          lambda_=[0.1, 1.0, 10.0],
                                          metric="map@10")
    assert all(np.isnan(r["score"]) for r in res)
    assert model.components is not None
    # fallback records the FIRST lambda, not the last
    assert model.lambda_ == 0.1
