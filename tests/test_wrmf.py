"""WRMF: hyperparameter grid, invariants, dense-oracle parity, quality.

Mirrors the reference suite's property style (tests/testthat/test-wrmf.R):
shape/ID preservation, the fit_transform == transform invariant, NNLS
non-negativity — plus what the reference lacks: numeric parity of a sweep
against a dense numpy oracle and a ranking-quality gate on ML-100k.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.sparse as sp

from rsparse_tpu import WRMF, ap_k, ndcg_k, train_test_split
from rsparse_tpu.ops.als import ALSConfig, CHOLESKY, wrmf_sweep
from rsparse_tpu.sparse.device import bucket_rows

GRID = [
    # (solver, feedback, lambda, bias, precision)
    ("cholesky", "implicit", 0.0, False, "double"),
    ("cholesky", "implicit", 0.1, True, "double"),
    ("cholesky", "implicit", 1000.0, False, "float"),
    ("nnls", "implicit", 0.1, False, "double"),
    ("nnls", "implicit", 0.1, True, "double"),
    ("conjugate_gradient", "implicit", 0.0, False, "double"),
    ("conjugate_gradient", "implicit", 0.1, False, "float"),
    ("conjugate_gradient", "implicit", 0.1, True, "double"),
    ("conjugate_gradient", "implicit", 1000.0, False, "double"),
    ("cholesky", "explicit", 0.1, False, "double"),
    ("cholesky", "explicit", 0.1, True, "double"),
    ("cholesky", "explicit", 1000.0, True, "float"),
    ("conjugate_gradient", "explicit", 0.1, False, "double"),
    ("conjugate_gradient", "explicit", 0.1, True, "double"),
    ("nnls", "explicit", 0.1, False, "double"),
]


@pytest.mark.parametrize("solver,feedback,lam,bias,precision", GRID)
def test_wrmf_grid(ml100k_split, solver, feedback, lam, bias, precision):
    train, cv = ml100k_split
    rank, K = 6, 5
    model = WRMF(rank=rank, lambda_=lam, feedback=feedback, solver=solver,
                 with_user_item_bias=bias, precision=precision, seed=0)
    emb = model.fit_transform(train, n_iter=2, convergence_tol=-1)
    rank_b = rank + (2 if bias else 0)

    assert emb.shape == (train.shape[0], rank_b)
    assert model.components.shape == (rank_b, train.shape[1])
    assert model.item_ids == train.col_names

    # fit_transform == transform (reference test-wrmf.R:56-57)
    emb2 = model.transform(train)
    np.testing.assert_allclose(np.asarray(emb, np.float64),
                               np.asarray(emb2, np.float64),
                               rtol=5e-5, atol=1e-7)

    preds = model.predict(cv, k=K)
    assert preds.shape == (cv.shape[0], K)
    assert preds.ids is not None and preds.ids.shape == (cv.shape[0], K)
    assert preds.user_ids == cv.row_names

    cv_emb = model.transform(cv)
    assert cv_emb.shape == (cv.shape[0], rank_b)
    if solver == "nnls":
        assert np.asarray(cv_emb).min() >= 0
        assert model.components.min() >= 0

    # finite everything
    assert np.isfinite(np.asarray(emb, np.float64)).all()
    assert np.isfinite(model.components).all()


def test_wrmf_float_dtype(ml100k_split):
    train, _ = ml100k_split
    for precision, expected in [("float", jnp.float32),
                                ("bfloat16", jnp.bfloat16)]:
        model = WRMF(rank=4, lambda_=1.0, feedback="implicit",
                     solver="conjugate_gradient", precision=precision, seed=0)
        emb = model.fit_transform(train, n_iter=2, convergence_tol=-1)
        assert emb.dtype == expected


def test_wrmf_global_bias(ml100k_split):
    train, cv = ml100k_split
    for feedback in ("implicit", "explicit"):
        model = WRMF(rank=4, lambda_=0.1, feedback=feedback,
                     solver="cholesky", with_global_bias=True,
                     precision="double", seed=0)
        emb = model.fit_transform(train, n_iter=2, convergence_tol=-1)
        assert model.global_bias != 0.0
        emb2 = model.transform(train)
        np.testing.assert_allclose(np.asarray(emb), np.asarray(emb2),
                                   rtol=1e-6, atol=1e-9)


def test_wrmf_sweep_matches_dense_oracle():
    """One implicit Cholesky item-sweep vs. a dense numpy solve of the same
    normal equations (the math of inst/include/wrmf_implicit.hpp:206-237)."""
    rng = np.random.default_rng(0)
    n_u, n_i, r = 50, 30, 6
    lam = 0.3
    conf = sp.random(n_u, n_i, density=0.3,
                     random_state=np.random.RandomState(1), format="csr")
    conf.data = 1.0 + 4.0 * conf.data  # confidences >= 1
    U = rng.standard_normal((n_u, r)) * 0.1

    cfg = ALSConfig(feedback="implicit", solver=CHOLESKY)
    iu = bucket_rows(conf.T.tocsr(), jnp.float64)
    V_new, _ = wrmf_sweep(jnp.asarray(U), jnp.zeros((n_i, r)), iu.buckets,
                          None, lam, 0.0, cfg)
    V_new = np.asarray(V_new)

    XtX = U.T @ U + lam * np.eye(r)
    csc = conf.tocsc()
    for i in range(n_i):
        p1, p2 = csc.indptr[i], csc.indptr[i + 1]
        idx, c = csc.indices[p1:p2], csc.data[p1:p2]
        if len(idx) == 0:
            np.testing.assert_allclose(V_new[i], 0.0)
            continue
        Un = U[idx]
        lhs = XtX + Un.T @ ((c - 1.0)[:, None] * Un)
        rhs = Un.T @ c
        np.testing.assert_allclose(V_new[i], np.linalg.solve(lhs, rhs),
                                   rtol=1e-6, atol=1e-9)


def test_wrmf_explicit_sweep_matches_dense_oracle():
    """Explicit dynamic-lambda sweep vs dense oracle
    (inst/include/wrmf_explicit.hpp:78,103-108)."""
    rng = np.random.default_rng(2)
    n_u, n_i, r = 40, 25, 5
    lam = 0.2
    x = sp.random(n_u, n_i, density=0.25,
                  random_state=np.random.RandomState(3), format="csr")
    x.data = 1.0 + 4.0 * rng.random(x.nnz)
    U = rng.standard_normal((n_u, r)) * 0.1

    cfg = ALSConfig(feedback="explicit", solver=CHOLESKY, dynamic_lambda=True)
    iu = bucket_rows(x.T.tocsr(), jnp.float64)
    cnt_u = jnp.asarray(np.diff(x.indptr), jnp.float64)
    V_new, _ = wrmf_sweep(jnp.asarray(U), jnp.zeros((n_i, r)), iu.buckets,
                          cnt_u, lam, 0.0, cfg)
    V_new = np.asarray(V_new)

    csc = x.tocsc()
    for i in range(n_i):
        p1, p2 = csc.indptr[i], csc.indptr[i + 1]
        idx, vals = csc.indices[p1:p2], csc.data[p1:p2]
        if len(idx) == 0:
            np.testing.assert_allclose(V_new[i], 0.0)
            continue
        Un = U[idx]
        lam_use = lam * len(idx)
        lhs = Un.T @ Un + lam_use * np.eye(r)
        rhs = Un.T @ vals
        np.testing.assert_allclose(V_new[i], np.linalg.solve(lhs, rhs),
                                   rtol=1e-6, atol=1e-9)


def test_wrmf_quality_ml100k(ml100k):
    """Ranking-quality gate: implicit CG rank-10 must beat random by a wide
    margin on held-out interactions (driver benchmark config #1)."""
    rng = np.random.default_rng(7)
    full = sp.csr_matrix(ml100k)
    train_users = full[:800]
    cv_users = full[800:]
    cv_train, cv_test = train_test_split(cv_users, 0.5, rng)

    model = WRMF(rank=10, lambda_=1.0, feedback="implicit",
                 solver="conjugate_gradient", seed=0)
    model.fit_transform(train_users, n_iter=10)
    preds = model.predict(cv_train, k=10, not_recommend=cv_train)
    ndcg = np.nanmean(ndcg_k(preds.indices, cv_test))
    apk = np.nanmean(ap_k(preds.indices, cv_test))
    # gates pinned at ~90% of measured quality (NDCG 0.514 / MAP 0.621 on
    # this split, 2026-08) so a real regression trips CI, not just a
    # catastrophic one
    assert ndcg > 0.46, f"NDCG@10 regressed: {ndcg} (measured 0.514)"
    assert apk > 0.55, f"MAP@10 regressed: {apk} (measured 0.621)"


def test_wrmf_explicit_quality_ml100k(ml100k):
    """Rating-prediction gate: explicit WRMF (global-mean-centered, biases)
    must beat the global-mean predictor on held-out ratings.  Gate pinned
    at ~107% of measured RMSE (0.980 on this split, 2026-08); the
    global-mean baseline is 1.124."""
    rng = np.random.default_rng(7)
    full = sp.csr_matrix(ml100k)
    tr, te = train_test_split(full, 0.8, rng)
    te = te.tocoo()
    mean = tr.data.mean()
    trc = tr.copy()
    trc.data = trc.data - mean

    model = WRMF(rank=10, lambda_=0.3, feedback="explicit",
                 solver="cholesky", with_user_item_bias=True, seed=0)
    emb = np.asarray(model.fit_transform(trc, n_iter=30), np.float64)
    scores = emb @ model.components + mean
    rmse = np.sqrt(np.mean((scores[te.row, te.col] - te.data) ** 2))
    baseline = np.sqrt(np.mean((te.data - mean) ** 2))
    assert rmse < 1.05, f"explicit RMSE regressed: {rmse} (measured 0.980)"
    assert rmse < baseline, f"explicit RMSE {rmse} worse than global mean"


def test_implicit_cg_bias_matches_cholesky(ml100k_split):
    """The implicit CG-with-bias path (the reference's is broken,
    inst/include/wrmf_implicit.hpp:199 double-drop; ours implements the
    consistent rhs) must converge to the Cholesky solution."""
    train, _ = ml100k_split
    kw = dict(rank=6, lambda_=0.5, feedback="implicit",
              with_user_item_bias=True, seed=5, precision="double")
    m_ch = WRMF(solver="cholesky", **kw)
    u_ch = np.asarray(m_ch.fit_transform(train, n_iter=4), np.float64)
    m_cg = WRMF(solver="conjugate_gradient", cg_steps=25, **kw)
    u_cg = np.asarray(m_cg.fit_transform(train, n_iter=4), np.float64)
    from rsparse_tpu.ops.als import CONJUGATE_GRADIENT
    assert m_cg.solver == CONJUGATE_GRADIENT     # no silent fallback
    scale = np.abs(u_ch).max()
    assert np.abs(u_ch - u_cg).max() / scale < 1e-4
    np.testing.assert_allclose(m_ch.loss_history[-1], m_cg.loss_history[-1],
                               rtol=1e-5)


def test_wrmf_empty_rows(ml100k_split):
    """All-zero and duplicate rows must not break fitting/transform
    (the reference appends such rows in its suite, tests/testthat.R)."""
    train, _ = ml100k_split
    train2 = sp.vstack([train, sp.csr_matrix((2, train.shape[1])),
                        train[:1]]).tocsr()
    model = WRMF(rank=4, lambda_=0.1, feedback="implicit", solver="cholesky",
                 precision="double", seed=0)
    emb = model.fit_transform(train2, n_iter=2, convergence_tol=-1)
    emb = np.asarray(emb)
    assert np.isfinite(emb).all()
    # empty users get zero embeddings
    np.testing.assert_allclose(emb[train.shape[0]:train.shape[0] + 2], 0.0)
    # duplicate user row solves to the same embedding as the original
    np.testing.assert_allclose(emb[-1], emb[0], rtol=1e-6, atol=1e-9)


def test_wrmf_warm_start_init(ml100k_split):
    train, _ = ml100k_split
    m1 = WRMF(rank=4, lambda_=0.1, feedback="implicit", solver="cholesky",
              precision="double", seed=0)
    m1.fit_transform(train, n_iter=2, convergence_tol=-1)
    m2 = WRMF(rank=4, lambda_=0.1, feedback="implicit", solver="cholesky",
              precision="double", init=m1.components, seed=0)
    m2.fit_transform(train, n_iter=1, convergence_tol=-1)
    assert m2.loss_history[-1] <= m1.loss_history[0]


def test_wrmf_hot_cold_split_parity():
    """The dense zipf-head split (n_hot) must reproduce the plain bucketed
    sweep exactly: same normal equations, partitioned by column set."""
    rng = np.random.default_rng(3)
    m = sp.random(300, 200, 0.08, random_state=3, format="csr")
    m.data = 1.0 + rng.exponential(2.0, m.nnz)
    kw = dict(rank=8, lambda_=0.5, feedback="implicit",
              solver="conjugate_gradient", seed=0, precision="double")
    for gb in (False, True):
        e0 = np.asarray(WRMF(n_hot=0, with_global_bias=gb, **kw)
                        .fit_transform(m, n_iter=3, convergence_tol=-1))
        e1 = np.asarray(WRMF(n_hot=64, with_global_bias=gb, **kw)
                        .fit_transform(m, n_iter=3, convergence_tol=-1))
        np.testing.assert_allclose(e1, e0, rtol=1e-10, atol=1e-12)


def test_wrmf_hot_cold_empty_and_fully_hot_rows():
    """Rows whose nnz land entirely in the hot block must still be solved;
    truly empty rows stay zero (reference excluded-row semantics)."""
    rng = np.random.default_rng(4)
    m = sp.random(120, 80, 0.1, random_state=4, format="csr").tolil()
    m[5, :] = 0                       # empty row
    m[7, :] = 0
    m[7, 0] = 2.0                     # row only touching the hottest column
    m = sp.csr_matrix(m)
    m.data = np.abs(m.data) + 1.0
    kw = dict(rank=4, lambda_=0.5, feedback="implicit",
              solver="conjugate_gradient", seed=0, precision="double")
    e0 = np.asarray(WRMF(n_hot=0, **kw)
                    .fit_transform(m, n_iter=2, convergence_tol=-1))
    e1 = np.asarray(WRMF(n_hot=16, **kw)
                    .fit_transform(m, n_iter=2, convergence_tol=-1))
    np.testing.assert_allclose(e1, e0, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(e1[5], 0.0)
    assert np.abs(e1[7]).max() > 0


def test_wrmf_explicit_hot_cold_split_parity():
    """Explicit-feedback dense zipf-head split: same normal equations
    partitioned by column set -> results match the pure-bucketed path to
    machine epsilon, including dynamic lambda and explicitly-stored zero
    ratings (which must keep their lhs/loss contributions via the
    presence bitmask)."""
    rng = np.random.default_rng(6)
    m = sp.random(100, 64, 0.25, random_state=6, format="csr")
    m.data = np.round(1.0 + 4.0 * m.data, 2)
    # plant explicit zero ratings on the hottest column and on a tail column
    counts = np.bincount(m.indices, minlength=64)
    hot_col = int(np.argmax(counts))
    m = m.tolil()
    m[3, hot_col] = 1e-300            # survives .tolil round-trip
    m[4, 63] = 1e-300
    m = sp.csr_matrix(m)
    m.data[np.abs(m.data) < 1e-200] = 0.0   # true stored zeros
    assert (m.data == 0.0).sum() == 2
    for dyn in (False, True):
        kw = dict(rank=6, lambda_=0.3, feedback="explicit",
                  dynamic_lambda=dyn, solver="conjugate_gradient",
                  seed=0, precision="double")
        m0 = WRMF(n_hot=0, **kw)
        e0 = np.asarray(m0.fit_transform(m, n_iter=3, convergence_tol=-1))
        m1 = WRMF(n_hot=16, **kw)
        e1 = np.asarray(m1.fit_transform(m, n_iter=3, convergence_tol=-1))
        np.testing.assert_allclose(e1, e0, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(m1.loss_history, m0.loss_history,
                                   rtol=1e-9)


def test_wrmf_hot_uint8_exact_when_representable():
    """hot_dtype='uint8' stores quantized confidence codes; when every
    row's hot values are exactly representable (all equal -> code 255) the
    quantized fit must equal the unquantized one to machine epsilon."""
    m = sp.random(200, 150, 0.08, random_state=5, format="csr")
    m.data[:] = 2.0
    kw = dict(rank=6, lambda_=0.5, feedback="implicit",
              solver="conjugate_gradient", seed=0, precision="double")
    e0 = np.asarray(WRMF(n_hot=32, **kw)
                    .fit_transform(m, n_iter=3, convergence_tol=-1))
    e1 = np.asarray(WRMF(n_hot=32, hot_dtype="uint8", **kw)
                    .fit_transform(m, n_iter=3, convergence_tol=-1))
    np.testing.assert_allclose(e1, e0, rtol=1e-10, atol=1e-12)


def test_wrmf_hot_uint8_quantized_close():
    """General confidences: the uint8 hot block perturbs each confidence by
    at most rowmax/510, so the fit stays close to the exact one."""
    rng = np.random.default_rng(9)
    m = sp.random(300, 200, 0.08, random_state=9, format="csr")
    m.data = 1.0 + rng.exponential(2.0, m.nnz)
    kw = dict(rank=8, lambda_=0.5, feedback="implicit",
              solver="conjugate_gradient", seed=0, precision="double")
    e0 = np.asarray(WRMF(n_hot=64, **kw)
                    .fit_transform(m, n_iter=3, convergence_tol=-1))
    e1 = np.asarray(WRMF(n_hot=64, hot_dtype="uint8", **kw)
                    .fit_transform(m, n_iter=3, convergence_tol=-1))
    denom = np.linalg.norm(e0) + 1e-30
    assert np.linalg.norm(e1 - e0) / denom < 0.02


def test_wrmf_hot_uint8_rejects_explicit():
    with pytest.raises(ValueError, match="implicit"):
        WRMF(feedback="explicit", hot_dtype="uint8")


def test_wrmf_resolve_n_hot_respects_memory_budget():
    """The 1 GB W-block cap must account for the TRUE storage width of the
    hot dtype (uint8 / bf16 / f32 / f64), not a fixed 2 bytes."""
    rng = np.random.default_rng(0)
    n_r, n_c, nnz = 1 << 20, 4096, 100_000
    csr = sp.csr_matrix(
        (np.ones(nnz, np.float32),
         (rng.integers(0, n_r, nnz), rng.integers(0, n_c, nnz))),
        shape=(n_r, n_c))
    n_rows = csr.shape[0]
    for hot_dtype, compute, precision, w_bytes in [
        ("uint8", "float32", "float32", 1),
        ("auto", "bfloat16", "float32", 2),
        ("auto", "float32", "float32", 4),
        ("float32", "bfloat16", "float32", 4),
        ("auto", "float32", "double", 8),
    ]:
        m = WRMF(n_hot=1 << 14, hot_dtype=hot_dtype, compute_dtype=compute,
                 precision=precision)
        n = m._resolve_n_hot(csr)
        assert w_bytes * n_rows * n <= (1 << 30), (hot_dtype, compute, n)


def test_wrmf_explicit_hot_cold_bf16_close():
    """bfloat16 compute on the explicit hot path stays close to f32."""
    rng = np.random.default_rng(8)
    m = sp.random(128, 96, 0.2, random_state=8, format="csr")
    m.data = 1.0 + 4.0 * m.data
    kw = dict(rank=8, lambda_=0.5, feedback="explicit", seed=0,
              solver="conjugate_gradient", n_hot=16)
    e0 = np.asarray(WRMF(compute_dtype="float32", **kw)
                    .fit_transform(m, n_iter=2, convergence_tol=-1))
    e1 = np.asarray(WRMF(compute_dtype="bfloat16", **kw)
                    .fit_transform(m, n_iter=2, convergence_tol=-1))
    # same algorithm at reduced precision: correlation, not equality
    denom = np.linalg.norm(e0) + 1e-30
    assert np.linalg.norm(e1 - e0) / denom < 0.05


def test_wrmf_exact_solver_hot_cold_split_parity():
    """Cholesky and NNLS with a dense zipf-head: the head's normal-matrix
    term (ops/als.py _hot_lhs) must reproduce the pure-bucketed exact
    solve (reference lhs build inst/include/wrmf_implicit.hpp:206-237)."""
    rng = np.random.default_rng(7)
    m = sp.random(250, 160, 0.08, random_state=7, format="csr")
    m.data = 1.0 + rng.exponential(2.0, m.nnz)
    for solver in ("cholesky", "nnls"):
        kw = dict(rank=8, lambda_=0.5, feedback="implicit", solver=solver,
                  seed=0, precision="double")
        e0 = np.asarray(WRMF(n_hot=0, **kw)
                        .fit_transform(m, n_iter=2, convergence_tol=-1))
        e1 = np.asarray(WRMF(n_hot=48, **kw)
                        .fit_transform(m, n_iter=2, convergence_tol=-1))
        if solver == "nnls":
            # SCD stops at rel-tol 1e-4 (reference nnls.hpp SCD_TOL), so
            # summation-order differences legitimately move the stopping
            # point; assert to that tolerance scale + non-negativity
            assert (e1 >= 0).all()
            np.testing.assert_allclose(e1, e0, rtol=0.05, atol=0.02)
        else:
            np.testing.assert_allclose(e1, e0, rtol=1e-8, atol=1e-10)
    # explicit feedback + cholesky + dynamic lambda through the same term
    me = sp.random(120, 80, 0.2, random_state=8, format="csr")
    me.data = np.round(1.0 + 4.0 * me.data, 2)
    kw = dict(rank=6, lambda_=0.3, feedback="explicit", solver="cholesky",
              dynamic_lambda=True, seed=0, precision="double")
    e0 = np.asarray(WRMF(n_hot=0, **kw)
                    .fit_transform(me, n_iter=2, convergence_tol=-1))
    e1 = np.asarray(WRMF(n_hot=16, **kw)
                    .fit_transform(me, n_iter=2, convergence_tol=-1))
    np.testing.assert_allclose(e1, e0, rtol=1e-8, atol=1e-10)
