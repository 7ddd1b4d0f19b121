"""Masked top-K retrieval: the TPU replacement for ``top_product``.

The reference computes one BLAS row-vector product per user and streams it
through a size-k min-heap with per-user ``not_recommend`` masking and a
global exclude set (reference src/matrix_top_product.cpp:20-102, R wrapper
``find_top_product`` R/utils.R:31-59).  On TPU the same result comes from a
chunked dense matmul on the MXU — ``scores = U_chunk @ V`` — with masks
applied as ``-inf`` scatters and ``lax.top_k`` per chunk.  The item axis
stays resident in device memory; the user axis is streamed in chunks.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

NEG_INF = float(np.finfo(np.float32).min)


@partial(jax.jit, static_argnames=("k",))
def _topk_chunk(
    x_chunk: jax.Array,       # (C, R)
    y: jax.Array,             # (R, n_items)
    mask_rows: jax.Array,     # (M,) int32 local row of masked entry (C => pad)
    mask_cols: jax.Array,     # (M,) int32 item of masked entry
    exclude_mask: jax.Array,  # (n_items,) bool
    glob_mean: jax.Array,     # scalar
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    scores = jnp.dot(x_chunk, y, preferred_element_type=jnp.float32)
    scores = scores + glob_mean
    scores = jnp.where(exclude_mask[None, :], NEG_INF, scores)
    # scatter the per-user not_recommend entries; padding rows point at an
    # extra dummy row C which is dropped by the slice below
    padded = jnp.concatenate(
        [scores, jnp.zeros((1, scores.shape[1]), scores.dtype)], axis=0)
    padded = padded.at[mask_rows, mask_cols].set(NEG_INF)
    scores = padded[:-1]
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx.astype(jnp.int32)


def top_product(
    x,
    y,
    k: int,
    not_recommend: Optional[sp.spmatrix] = None,
    exclude: Optional[np.ndarray] = None,
    glob_mean: float = 0.0,
    user_chunk: int = 1024,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k items by score ``x @ y + glob_mean`` with masking.

    x: (n_users, R) user embeddings; y: (R, n_items) item embeddings.
    Returns (indices (n_users, k) int32 0-based, scores (n_users, k)).
    Same contract as the reference ``top_product``
    (src/matrix_top_product.cpp:20-102) minus R's 1-based indexing.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n_users, n_items = x.shape[0], y.shape[1]
    if k > n_items:
        raise ValueError(f"k={k} > n_items={n_items}")

    exclude_mask = np.zeros((n_items,), bool)
    if exclude is not None and len(exclude) > 0:
        exclude = np.asarray(exclude)
        if exclude.max() >= n_items:
            raise ValueError("some items_exclude indices are >= number of items")
        exclude_mask[exclude] = True
    exclude_mask = jnp.asarray(exclude_mask)

    nr = None
    if not_recommend is not None:
        nr = sp.csr_matrix(not_recommend)
        if nr.shape != (n_users, n_items):
            raise ValueError("not_recommend shape mismatch")

    # fixed mask-pad length across chunks => single XLA compilation
    if nr is not None and nr.nnz > 0:
        row_nnz = np.diff(nr.indptr)
        max_mask = 0
        for s in range(0, n_users, user_chunk):
            max_mask = max(max_mask, int(row_nnz[s:s + user_chunk].sum()))
        max_mask = max(max_mask, 1)
    else:
        max_mask = 1

    C = min(user_chunk, max(n_users, 1))
    out_idx = np.empty((n_users, k), np.int32)
    out_scores = np.empty((n_users, k), np.float32)
    gm = jnp.asarray(glob_mean, jnp.float32)

    for s in range(0, n_users, C):
        e = min(s + C, n_users)
        xc = x[s:e]
        if e - s < C:  # pad the tail chunk to the static shape
            xc = jnp.concatenate(
                [xc, jnp.zeros((C - (e - s), x.shape[1]), x.dtype)], axis=0)
        mrows = np.full((max_mask,), C, np.int32)
        mcols = np.zeros((max_mask,), np.int32)
        if nr is not None and nr.nnz > 0:
            p1, p2 = nr.indptr[s], nr.indptr[e]
            m = p2 - p1
            if m > 0:
                rows = np.repeat(
                    np.arange(s, e, dtype=np.int32) - s,
                    np.diff(nr.indptr[s:e + 1]))
                mrows[:m] = rows
                mcols[:m] = nr.indices[p1:p2]
        ts, ti = _topk_chunk(xc, y, jnp.asarray(mrows), jnp.asarray(mcols),
                             exclude_mask, gm, k)
        out_scores[s:e] = np.asarray(ts)[: e - s]
        out_idx[s:e] = np.asarray(ti)[: e - s]
    return out_idx, out_scores
