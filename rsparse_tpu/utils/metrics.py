"""Ranking metrics: average precision@k and NDCG@k.

Same contract as the reference ``ap_k``/``ndcg_k`` (R/metrics.R:31-127):
predictions are an (n_users, k) integer matrix of item indices (0-based
here), ``actual`` is a sparse matrix whose non-zero entries are the relevant
items and whose values are the relevances (for NDCG).  Per-user results are
returned; users with no relevant items yield NaN for ap@k (mean of an empty
sequence, matching R) and 0/1 semantics for ndcg@k.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def ap_k(predictions: np.ndarray, actual: sp.spmatrix) -> np.ndarray:
    """Average Precision at K per user (reference R/metrics.R:31-57,93-98)."""
    predictions = np.asarray(predictions)
    if predictions.ndim != 2:
        raise ValueError("predictions must be (n_users, k)")
    y = sp.csr_matrix(actual)
    n_u, k = predictions.shape
    if n_u != y.shape[0]:
        raise ValueError("predictions/actual row mismatch")
    res = np.empty(n_u)
    for u in range(n_u):
        p1, p2 = y.indptr[u], y.indptr[u + 1]
        actual_idx = y.indices[p1:p2]
        kk = min(k, len(actual_idx))
        if kk == 0:
            res[u] = np.nan
            continue
        hits = np.isin(predictions[u, :kk], actual_idx)
        res[u] = np.mean(np.cumsum(hits) / np.arange(1, kk + 1))
    return res


def ndcg_k(predictions: np.ndarray, actual: sp.spmatrix) -> np.ndarray:
    """Normalized DCG at K per user (reference R/metrics.R:63-127).

    Relevance of each hit is the stored value in ``actual``; the ideal DCG
    uses the top-k relevances sorted descending.
    """
    predictions = np.asarray(predictions)
    y = sp.csr_matrix(actual)
    n_u, k = predictions.shape
    if n_u != y.shape[0]:
        raise ValueError("predictions/actual row mismatch")
    res = np.empty(n_u)
    for u in range(n_u):
        p1, p2 = y.indptr[u], y.indptr[u + 1]
        actual_idx = y.indices[p1:p2]
        rel = y.data[p1:p2]
        kk = min(k, len(actual_idx))
        if len(actual_idx) == 0:
            res[u] = 0.0  # dcg=0, idcg=1 (R/metrics.R:118)
            continue
        pos = {j: i for i, j in enumerate(actual_idx)}
        dcg = 0.0
        for i in range(kk):
            j = pos.get(int(predictions[u, i]))
            if j is not None:
                dcg += rel[j] / np.log2(i + 2)
        top = np.sort(rel)[::-1][:kk]
        idcg = np.sum(top / np.log2(np.arange(2, len(top) + 2)))
        res[u] = dcg / idcg if idcg > 0 else 0.0
    return res
