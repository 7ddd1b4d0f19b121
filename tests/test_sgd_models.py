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


def test_ftrl_validates_dropout_and_n_iter():
    with pytest.raises(ValueError, match="dropout"):
        FTRL(dropout=-0.5)
    rng = np.random.RandomState(0)
    x = sp.random(20, 10, density=0.3, random_state=rng, format="csr")
    y = rng.randint(0, 2, 20).astype(float)
    with pytest.raises(ValueError, match="n_iter"):
        FTRL().fit(x, y, n_iter=0)
    from rsparse_tpu.models.fm import FactorizationMachine
    with pytest.raises(ValueError, match="n_iter"):
        FactorizationMachine().fit(x, y, n_iter=0)


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


def test_glove_dense_head_step_matches_sparse_shard():
    """_glove_dense_step is exactly one _glove_epoch shard containing every
    head-head triplet (same minibatch semantics, dense aggregation)."""
    import jax.numpy as jnp
    from rsparse_tpu.models.glove import (GloveState, _glove_dense_step,
                                          _glove_epoch)

    rng = np.random.default_rng(5)
    H, r = 12, 6
    X = np.zeros((H, H))
    mask = rng.random((H, H)) < 0.4
    X[mask] = 1.0 + rng.exponential(3.0, mask.sum())

    def mkstate():
        return GloveState(
            w_i=jnp.asarray(rng2.uniform(-0.5, 0.5, (H, r))),
            w_j=jnp.asarray(rng2.uniform(-0.5, 0.5, (H, r))),
            b_i=jnp.asarray(rng2.uniform(-0.5, 0.5, (H,))),
            b_j=jnp.asarray(rng2.uniform(-0.5, 0.5, (H,))),
            acc_w_i=jnp.ones((H, r)), acc_w_j=jnp.ones((H, r)),
            acc_b_i=jnp.ones((H,)), acc_b_j=jnp.ones((H,)))

    rng2 = np.random.default_rng(6)
    s1 = mkstate()
    rng2 = np.random.default_rng(6)
    s2 = mkstate()

    # dense head step (single chunk at this size -> exactly one shard)
    from rsparse_tpu.models.glove import _head_grids
    hot_np = np.arange(H, dtype=np.int32)
    rows, cols, xgrid = _head_grids(X, hot_np, jnp.float64, batch_size=8192)
    assert rows.shape[0] == 1
    out_d, loss_d = _glove_dense_step(s1, rows, cols, xgrid,
                                      x_max=10.0, alpha=0.75, lr=0.05)

    # one sparse shard with the same triplets
    coo = sp.coo_matrix(X)
    n = coo.nnz
    rows = jnp.asarray(coo.row, jnp.int32)[None, :]
    cols = jnp.asarray(coo.col, jnp.int32)[None, :]
    vals = jnp.asarray(coo.data)[None, :]
    valid = jnp.ones((1, n), bool)
    out_s, loss_s = _glove_epoch(s2, rows, cols, vals, valid,
                                 x_max=10.0, alpha=0.75, lr=0.05)

    np.testing.assert_allclose(float(loss_d), float(loss_s), rtol=1e-10)
    for a, b in zip(out_d, out_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-12)


def test_glove_head_split_convergence():
    """Fit with and without the dense head block: both converge to similar
    cost on the reference-style crossprod co-occurrence."""
    from rsparse_tpu.models.glove import GloVe
    rng = np.random.default_rng(7)
    m = sp.random(200, 80, 0.2, random_state=7, format="csr")
    tcm = sp.coo_matrix((m.T @ m))
    tcm.setdiag(0)
    tcm.eliminate_zeros()
    tcm = sp.coo_matrix(np.abs(tcm.toarray()) + 0.0)
    c = []
    for n_hot in (0, 32):
        g = GloVe(rank=8, x_max=10, learning_rate=0.1, seed=0, n_hot=n_hot)
        g.fit_transform(tcm, n_iter=6)
        c.append(g.cost_history[-1])
    assert c[0] == c[0] and c[1] == c[1]          # no NaNs
    assert abs(c[0] - c[1]) / max(c[0], 1e-9) < 0.25


def test_glove_device_shuffle_reproducible():
    """Same seed -> identical device-side epoch shuffles -> identical fit."""
    import scipy.sparse as sp
    from rsparse_tpu.models.glove import GloVe
    rng = np.random.default_rng(0)
    m = sp.random(60, 60, density=0.2, random_state=1, format="coo")
    m.data = 1.0 + 5.0 * m.data
    tcm = sp.csr_matrix(np.triu(m.toarray()))  # triangular input
    outs = []
    for _ in range(2):
        g = GloVe(rank=6, x_max=10.0, learning_rate=0.05, seed=3,
                  shuffle=True)
        outs.append(np.asarray(
            g.fit_transform(tcm, n_iter=3, convergence_tol=-1)))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_col_schedule_sparse_mode_matches_scatter():
    """Sparse-mode schedules (table_rows >> scheduled rows, the hashed-
    feature GLM regime) must produce the exact scatter-add table — same
    contract as dense mode, different lowering (active-rows-only scatter;
    PERF.md round-4 table-op ADR)."""
    import jax.numpy as jnp

    from rsparse_tpu.ops.segsum import build_col_schedule, \
        scheduled_table_add
    from rsparse_tpu.parallel.sgd_sharded import DirectOps

    rng = np.random.default_rng(3)
    ops = DirectOps()
    n_flat, F_sparse, F_dense = 4096, 1_000_000, 512
    cols = rng.integers(0, F_dense, n_flat).astype(np.int32)
    u1 = rng.standard_normal(n_flat).astype(np.float32)
    u2 = rng.standard_normal((n_flat, 5)).astype(np.float32)
    for F in (F_dense, F_sparse):
        c = cols if F == F_dense else cols * (F // F_dense)
        sched = build_col_schedule(c, F)
        assert (sched.inv is None) == (F == F_sparse)
        want1 = np.zeros(F, np.float32)
        np.add.at(want1, c, u1)
        got1 = scheduled_table_add(ops, jnp.zeros((F,), jnp.float32),
                                   jnp.asarray(u1), sched)
        np.testing.assert_allclose(np.asarray(got1), want1, atol=1e-5)
        want2 = np.zeros((F, 5), np.float32)
        np.add.at(want2, c, u2)
        got2 = scheduled_table_add(ops, jnp.zeros((F, 5), jnp.float32),
                                   jnp.asarray(u2), sched)
        np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-5)


def test_ftrl_sparse_schedule_mode_end_to_end():
    """FTRL at hashed-feature scale (F >> nnz) trains through the
    sparse-scatter schedule and matches a small-F model's math: the same
    planted problem embedded in a huge feature space recovers signs."""
    rng = np.random.default_rng(7)
    n, d, F = 512, 64, 2_000_000
    stride = F // d
    x_small = sp.random(n, d, density=0.3, random_state=5,
                        data_rvs=lambda k: rng.choice([1.0, -1.0], k))
    x_small = sp.csr_matrix(x_small)
    beta = np.where(np.arange(d) < d // 2, 1.0, -1.0)
    y = (np.asarray(x_small @ beta).ravel() > 0).astype(np.float64)
    small = FTRL(learning_rate=0.5, seed=0)
    small.fit(x_small, y, n_iter=4)
    coo = x_small.tocoo()
    x_big = sp.csr_matrix((coo.data, (coo.row, coo.col * stride)),
                          shape=(n, F))
    big = FTRL(learning_rate=0.5, seed=0)
    big.fit(x_big, y, n_iter=4)
    w_small = small.coef()[:d]
    w_big = big.coef()[::stride][:d]
    np.testing.assert_allclose(w_big, w_small, atol=1e-4)


def test_glove_bf16_head_converges_like_f32():
    """compute_dtype='bfloat16' changes only the dense-head matmul/grid
    width (f32 accumulation) — cost trajectories must track the f32 run
    closely (models/glove.py compute_dtype)."""
    rng = np.random.RandomState(0)
    m = sp.random(300, 300, density=0.1, random_state=rng)
    m.data = np.abs(m.data) + 1
    hist = {}
    for cd in (None, "bfloat16"):
        g = GloVe(rank=8, x_max=10, learning_rate=0.1, seed=0, n_hot=128,
                  compute_dtype=cd)
        g.fit_transform(sp.coo_matrix(m), n_iter=4)
        hist[cd] = np.asarray(g.cost_history)
    assert hist["bfloat16"][-1] < hist["bfloat16"][0]
    np.testing.assert_allclose(hist["bfloat16"], hist[None], rtol=0.02)


def test_sched_layout_matches_row_major_oracle():
    """SchedLayout (ops/segsum.py): the feature-grouped layout must
    reproduce (a) the row layout exactly through sched_to_rows and
    (b) scatter-add table sums through sched_apply_sums, in both dense
    and sparse apply modes."""
    import jax.numpy as jnp

    from rsparse_tpu.ops.segsum import (build_sched_layout,
                                        sched_apply_sums,
                                        sched_reduce_chunks, sched_to_rows)
    from rsparse_tpu.parallel.sgd_sharded import DirectOps

    rng = np.random.default_rng(5)
    ops = DirectOps()
    B, L, F_dense, F_sparse = 64, 24, 300, 1_000_000
    nnz_rows = rng.integers(0, L + 1, B).astype(np.int32)
    cols = rng.integers(0, F_dense, (B, L)).astype(np.int32)
    # skew: make one feature very hot so the chunking level is exercised
    cols[rng.random((B, L)) < 0.3] = 7
    vals = rng.standard_normal((B, L)).astype(np.float32)
    valid = np.arange(L)[None, :] < nnz_rows[:, None]
    vals[~valid] = 0.0

    for F in (F_dense, F_sparse):
        c = cols if F == F_dense else cols * (F // F_dense)
        lay = build_sched_layout(c, vals, nnz_rows, F, chunk_len=16)
        assert (lay.inv is None) == (F == F_sparse)
        # (a) round-trip: scheduled vals permuted back == row-layout vals
        back = sched_to_rows(list(lay.vals), lay, B, L)
        np.testing.assert_array_equal(np.asarray(back), vals)
        # (b) per-feature sums (chunk partials -> level-2 reduce) ==
        # scatter-add over valid positions
        chunk_sums = jnp.concatenate(
            [jnp.sum(v, axis=1) for v in lay.vals])
        got = sched_apply_sums(ops, jnp.zeros((F,), jnp.float32),
                               sched_reduce_chunks(chunk_sums, lay), lay)
        want = np.zeros(F, np.float32)
        np.add.at(want, c[valid], vals[valid])
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)
        # (c) rows/pos agree: vals == row-layout values at pos
        vflat = np.concatenate([vals.reshape(-1), [0.0]]).astype(np.float32)
        for pk, vk in zip(lay.pos, lay.vals):
            np.testing.assert_array_equal(vflat[np.asarray(pk)],
                                          np.asarray(vk))


def test_glove_sched_epoch_matches_scatter_epoch():
    """The scheduled GloVe tail epoch must equal the scatter-path epoch
    on every state table and the loss (same accumulator-first AdaGrad
    math, different summation order)."""
    import jax.numpy as jnp

    from rsparse_tpu.models.glove import (GloveState, _glove_epoch,
                                          _glove_epoch_sched,
                                          _stack_coo_host)
    from rsparse_tpu.ops.segsum import build_stacked_col_schedule

    rng = np.random.RandomState(0)
    n, r = 200, 8
    m = sp.random(n, n, density=0.08, random_state=rng)
    m.data = np.abs(m.data) * 10 + 1
    coo = sp.coo_matrix(m)
    r_np, c_np, v_np, m_np = _stack_coo_host(coo, 512)
    shards = (jnp.asarray(r_np), jnp.asarray(c_np),
              jnp.asarray(v_np, jnp.float64), jnp.asarray(m_np))
    sched_r = build_stacked_col_schedule(r_np, m_np, n)
    sched_c = build_stacked_col_schedule(c_np, m_np, n)

    def init():
        rr = np.random.default_rng(1)
        return GloveState(
            w_i=jnp.asarray(rr.uniform(-0.5, 0.5, (n, r))),
            w_j=jnp.asarray(rr.uniform(-0.5, 0.5, (n, r))),
            b_i=jnp.asarray(rr.uniform(-0.5, 0.5, (n,))),
            b_j=jnp.asarray(rr.uniform(-0.5, 0.5, (n,))),
            acc_w_i=jnp.ones((n, r)), acc_w_j=jnp.ones((n, r)),
            acc_b_i=jnp.ones((n,)), acc_b_j=jnp.ones((n,)))

    st1, l1 = _glove_epoch(init(), *shards,
                           x_max=10.0, alpha=0.75, lr=0.05)
    st2, l2 = _glove_epoch_sched(init(), *shards, sched_r, sched_c,
                                 x_max=10.0, alpha=0.75, lr=0.05)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-10)
    for a, b, name in zip(st1, st2, GloveState._fields):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-10, err_msg=name)


def test_ftrl_fm_prediction_layout_parity():
    """rowmajor_pred=True/False are the same math in different layouts
    (models/ftrl.py, models/fm.py): one pass must agree to summation
    order, including FTRL's dropout path (the dropped values must be
    consistent between the prediction and update layouts)."""
    import jax
    import jax.numpy as jnp

    from rsparse_tpu.models.fm import _fm_block
    from rsparse_tpu.models.ftrl import _ftrl_block
    from rsparse_tpu.ops.segsum import staged_blocks_with_layouts

    rng = np.random.default_rng(0)
    F, n_rows = 300, 200
    X = sp.random(n_rows, F, density=0.1, random_state=3, format="csr")
    y = rng.integers(0, 2, n_rows).astype(float)
    br, layouts = staged_blocks_with_layouts(X, jnp.float64, F, None,
                                             "layout_parity")
    b, lay = br.buckets[0], layouts[0]
    y_b = jnp.asarray(y[np.minimum(np.asarray(b.row_ids), n_rows - 1)],
                      jnp.float64)
    w_b = jnp.ones_like(y_b)
    key = jax.random.PRNGKey(7)

    for dropout in (0.0, 0.4):
        outs = []
        for rm in (True, False):
            z = jnp.zeros((F + 1,), jnp.float64)
            n = jnp.zeros((F + 1,), jnp.float64)
            z, n, yh = _ftrl_block(
                z, n, b.col_idx, b.values.astype(jnp.float64), y_b, w_b,
                key, 0.1, 0.5, 0.02, 0.01, dropout, lay, family=1,
                do_update=True, use_dropout=dropout > 0, rowmajor_pred=rm)
            outs.append((np.asarray(z), np.asarray(n), np.asarray(yh)))
        for a, bb in zip(outs[0], outs[1]):
            np.testing.assert_allclose(a, bb, atol=1e-12)

    outs = []
    for rm in (True, False):
        r = 3
        w0 = jnp.zeros((), jnp.float64)
        aw0 = jnp.ones((), jnp.float64)
        w = jnp.zeros((F + 1,), jnp.float64)
        v = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((F + 1, r)) * 0.01)
        acw = jnp.ones((F + 1,), jnp.float64)
        acv = jnp.ones((F + 1, r), jnp.float64)
        w0, aw0, w, v, acw, acv, yh = _fm_block(
            w0, aw0, w, v, acw, acv, b.col_idx,
            b.values.astype(jnp.float64),
            jnp.where(y_b == 1, 1.0, -1.0), w_b, 0.2, 0.1, 0.01, 0.005,
            lay, family=1, intercept=True, do_update=True,
            rowmajor_pred=rm)
        outs.append((float(w0), np.asarray(w), np.asarray(v),
                     np.asarray(yh)))
    for a, bb in zip(outs[0], outs[1]):
        np.testing.assert_allclose(a, bb, atol=1e-12)
