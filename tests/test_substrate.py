"""Data substrate: RData parsing, bucketing round-trip, splits."""

import numpy as np
import pytest
import scipy.sparse as sp

from rsparse_tpu.sparse.device import bucket_rows, coo_batches
from rsparse_tpu.utils.split import train_test_split


def test_ml100k_loads(ml100k):
    assert ml100k.shape == (943, 1682)
    assert ml100k.nnz == 100_000
    assert ml100k.data.min() == 1.0 and ml100k.data.max() == 5.0
    assert ml100k.row_names[0] == "1"
    assert len(ml100k.col_names) == 1682


def _reconstruct(br, shape):
    out = sp.dok_matrix(shape)
    for b in br.buckets:
        rid = np.asarray(b.row_ids)
        cid = np.asarray(b.col_idx)
        val = np.asarray(b.values)
        nnz = np.asarray(b.nnz)
        for i in range(len(rid)):
            if rid[i] >= shape[0]:
                continue
            for l in range(nnz[i]):
                out[rid[i], cid[i, l]] = val[i, l]
    return sp.csr_matrix(out)


@pytest.mark.parametrize("include_empty", [False, True])
def test_bucket_roundtrip(include_empty):
    rng = np.random.default_rng(0)
    m = sp.random(64, 40, density=0.1, random_state=np.random.RandomState(1),
                  format="csr")
    # plant an empty row and a heavy row
    m = sp.vstack([m, sp.csr_matrix((1, 40)),
                   sp.csr_matrix(rng.random((1, 40)))]).tocsr()
    br = bucket_rows(m, include_empty=include_empty)
    rec = _reconstruct(br, m.shape)
    np.testing.assert_allclose(rec.toarray(), m.toarray(), rtol=1e-6)
    assert br.nnz == m.nnz
    row_nnz = np.diff(m.indptr)
    covered = sum(int((np.asarray(b.row_ids) < m.shape[0]).sum())
                  for b in br.buckets)
    expected = m.shape[0] if include_empty else int((row_nnz > 0).sum())
    assert covered == expected
    assert (np.asarray(br.empty_rows) == np.flatnonzero(row_nnz == 0)).all()


def test_bucket_shapes_capped():
    m = sp.random(500, 100, density=0.05,
                  random_state=np.random.RandomState(2), format="csr")
    br = bucket_rows(m, max_buckets=3)
    assert len(br.buckets) <= 3
    for b in br.buckets:
        assert b.pad_len >= int(np.asarray(b.nnz).max())


def test_train_test_split(ml100k):
    rng = np.random.default_rng(42)
    train, test = train_test_split(ml100k, 0.3, rng)
    assert train.shape == test.shape == ml100k.shape
    assert train.nnz + test.nnz == ml100k.nnz
    # disjoint entries that sum back to the original
    np.testing.assert_allclose(
        (train + test).toarray(), ml100k.toarray())
    frac = test.nnz / ml100k.nnz
    assert 0.25 < frac < 0.35


def test_coo_batches():
    m = sp.random(50, 30, density=0.2, random_state=np.random.RandomState(3))
    batches = coo_batches(m, batch_size=128)
    total = sum(int(np.asarray(b.valid).sum()) for b in batches)
    assert total == m.nnz
    s = sum(float((np.asarray(b.vals) * np.asarray(b.valid)).sum())
            for b in batches)
    np.testing.assert_allclose(s, m.sum(), rtol=1e-5)


def test_hot_cold_split_roundtrip():
    from rsparse_tpu.sparse.device import split_hot_cold
    m = sp.random(60, 40, density=0.15,
                  random_state=np.random.RandomState(5), format="csr")
    m.data[:] = 1.0 + m.data  # implicit confidences >= 1
    hot, cold = split_hot_cold(m, 8)
    assert hot is not None and hot.W.shape == (60, 8)
    # dense block + cold remainder reassemble the original matrix
    dense = np.zeros((60, 40))
    dense[:, np.asarray(hot.hot_ids)] = np.asarray(hot.W)
    np.testing.assert_allclose(dense + cold.toarray(), m.toarray(),
                               rtol=1e-6)
    assert (np.asarray(hot.row_nnz) == np.diff(m.indptr)).all()
    # hot ids are the most popular columns
    counts = np.bincount(m.indices, minlength=40)
    assert set(np.asarray(hot.hot_ids)) == set(
        np.argsort(-counts, kind="stable")[:8])


def test_hot_cold_split_uint8_quantization():
    """uint8 hot blocks: codes in 1..255, 0 = absent, dequantization error
    bounded by w_scale/2; non-positive values are rejected."""
    import jax.numpy as jnp
    from rsparse_tpu.sparse.device import split_hot_cold
    rng = np.random.RandomState(11)
    m = sp.random(50, 30, density=0.2, random_state=rng, format="csr")
    m.data = 1.0 + 5.0 * m.data
    hot, cold = split_hot_cold(m, 8, w_dtype=jnp.uint8)
    W = np.asarray(hot.W)
    s = np.asarray(hot.w_scale)
    assert W.dtype == np.uint8 and s.shape == (50,)
    # reconstruct and compare against the exact block
    hot_f, _ = split_hot_cold(m, 8)
    exact = np.asarray(hot_f.W)
    approx = W.astype(np.float32) * s[:, None]
    present = exact > 0
    assert ((W > 0) == present).all()          # presence preserved
    err = np.abs(approx - exact)[present]
    bound = np.repeat(s, 8).reshape(50, 8)[present] * 0.5 + 1e-6
    assert (err <= bound).all()
    # rows without hot entries get the neutral scale 1.0
    empty_rows = ~present.any(axis=1)
    if empty_rows.any():
        np.testing.assert_allclose(s[empty_rows], 1.0)
    # negative / zero values are not quantizable
    m2 = m.copy()
    m2.data[0] = -1.0
    with pytest.raises(ValueError, match="positive"):
        split_hot_cold(m2, 8, w_dtype=jnp.uint8)
    # sub-code-unit values round UP to code 1 (presence preserved; error
    # < scale, not scale/2 — the documented wide-dynamic-range caveat)
    wide = sp.csr_matrix(np.array([[0.001, 2550.0, 0.0, 1.0]] * 4))
    hw, _ = split_hot_cold(wide, 4, w_dtype=jnp.uint8)
    Ww, sw = np.asarray(hw.W), np.asarray(hw.w_scale)
    order = np.argsort(np.asarray(hw.hot_ids))
    np.testing.assert_allclose(sw, 10.0)
    row = Ww[0][order]                       # back to original column order
    assert row[0] == 1 and row[2] == 0       # tiny value kept; absent stays 0
    assert abs(row[0] * sw[0] - 0.001) < sw[0]


def test_hot_cold_sweep_parity():
    """Implicit CG sweep with the dense-head split == plain sweep."""
    import jax.numpy as jnp
    from rsparse_tpu.ops.als import ALSConfig, solver_code, wrmf_sweep
    from rsparse_tpu.sparse.device import split_hot_cold
    rng = np.random.default_rng(7)
    m = sp.random(64, 48, density=0.2,
                  random_state=np.random.RandomState(6), format="csr")
    m.data[:] = 1.0 + 4 * m.data
    dt = jnp.float64
    src = jnp.asarray(rng.standard_normal((48, 12)) * 0.1, dt)
    tgt = jnp.asarray(rng.standard_normal((64, 12)) * 0.1, dt)
    cfg = ALSConfig(feedback="implicit",
                    solver=solver_code("conjugate_gradient"))

    full = bucket_rows(m, dt)
    y_ref, loss_ref = wrmf_sweep(src, tgt, full.buckets, None, 0.3, 0.0, cfg)

    hot, cold = split_hot_cold(m, 12, dt)
    cb = bucket_rows(cold, dt, include_empty=True)
    y_hot, loss_hot = wrmf_sweep(src, tgt, cb.buckets, None, 0.3, 0.0, cfg,
                                 hot=hot)
    np.testing.assert_allclose(np.asarray(y_hot), np.asarray(y_ref),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(float(loss_hot), float(loss_ref), rtol=1e-6)
