"""Masked top-K retrieval: the TPU replacement for ``top_product``.

The reference computes one BLAS row-vector product per user and streams it
through a size-k min-heap with per-user ``not_recommend`` masking and a
global exclude set (reference src/matrix_top_product.cpp:20-102, R wrapper
``find_top_product`` R/utils.R:31-59).  On TPU the same result comes from a
single jitted ``lax.scan`` over user chunks: a dense MXU matmul per chunk
(``scores = U_chunk @ V``), masks applied as ``-inf`` scatters from
device-resident padded COO, and ``lax.top_k``.  Everything is staged to the
device once — per-chunk host round-trips would dominate otherwise.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

NEG_INF = float(np.finfo(np.float32).min)


def exact_top_k_tournament(scores: jax.Array, k: int, group: int = 256):
    """Exact top-k as a tournament with replacement: one full pass builds
    per-group (max, argmax) tables, then k cheap iterations each pick the
    globally best group, re-scan only that group's ``group`` values with
    already-taken entries masked, and update the tables.

    ``lax.top_k`` lowers to full bitonic sorts on TPU (~40 passes over the
    score matrix); this formulation reads the matrix once plus k tiny
    gathers — measured 3.6x faster end-to-end at (4096, 32768), exact
    index agreement (scripts/exp_topk2.py).  Ties resolve to the lowest
    index, matching stable ``lax.top_k``.
    """
    n = scores.shape[-1]
    if n <= max(2 * group, 2 * k) or scores.ndim != 2:
        s, i = jax.lax.top_k(scores, k)
        return s, i.astype(jnp.int32)
    B = scores.shape[0]
    Gn = -(-n // group)
    pad = Gn * group - n
    # live values are clamped to >= NEG_INF (finfo.min) so that the true
    # -inf used for taken/padding entries is STRICTLY below every live
    # value — otherwise a taken entry could be re-selected when a group's
    # remaining values tie with the dead sentinel (duplicate indices)
    scores = jnp.maximum(scores, NEG_INF)
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((B, pad), -jnp.inf, scores.dtype)], axis=-1)
    sg = scores.reshape(B, Gn, group)
    gm = jnp.max(sg, axis=-1)                         # (B, Gn)
    gi = jnp.argmax(sg, axis=-1).astype(jnp.int32)
    col_ids = jnp.arange(group, dtype=jnp.int32)[None, :]
    grp_ids = jnp.arange(Gn, dtype=jnp.int32)[None, :]

    def step(carry, _):
        gm, gi, taken = carry                         # taken: (B, k) global
        bg = jnp.argmax(gm, axis=-1).astype(jnp.int32)  # (B,) best group
        bs = jnp.take_along_axis(gm, bg[:, None], 1)[:, 0]
        bi = bg * group + jnp.take_along_axis(gi, bg[:, None], 1)[:, 0]
        taken = jnp.concatenate([taken[:, 1:], bi[:, None]], axis=1)
        row = jnp.take_along_axis(sg, bg[:, None, None], 1)[:, 0]  # (B, grp)
        glob = bg[:, None] * group + col_ids
        dead = (glob[:, :, None] == taken[:, None, :]).any(-1)
        row = jnp.where(dead, -jnp.inf, row)
        onehot = grp_ids == bg[:, None]
        gm = jnp.where(onehot, jnp.max(row, axis=-1)[:, None], gm)
        gi = jnp.where(onehot,
                       jnp.argmax(row, axis=-1).astype(jnp.int32)[:, None],
                       gi)
        return (gm, gi, taken), (bs, bi)

    taken0 = jnp.full((B, k), -1, jnp.int32)
    _, (ss, ii) = jax.lax.scan(step, (gm, gi, taken0), None, length=k)
    return ss.T, ii.T.astype(jnp.int32)


def exact_top_k(scores: jax.Array, k: int, group: int = 512):
    """Exact top-k via two stages: per-group top-k then a merge top-k.

    ``lax.top_k`` over a long item axis lowers to a full sort on TPU; the
    global top-k is contained in the union of per-group top-k's, so sorting
    ``n/group`` short groups + one (n/group * k)-wide merge is exact and an
    order of magnitude cheaper.  scores: (..., n) -> ((..., k), (..., k)).
    """
    n = scores.shape[-1]
    if n <= max(2 * group, 2 * k):
        s, i = jax.lax.top_k(scores, k)
        return s, i.astype(jnp.int32)
    G = -(-n // group)
    pad = G * group - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full(scores.shape[:-1] + (pad,), NEG_INF,
                              scores.dtype)], axis=-1)
    kk = min(k, group)
    gs, gi = jax.lax.top_k(
        scores.reshape(scores.shape[:-1] + (G, group)), kk)
    base = (jnp.arange(G, dtype=jnp.int32) * group)[:, None]
    gi = gi.astype(jnp.int32) + base                    # globalize
    flat_s = gs.reshape(scores.shape[:-1] + (G * kk,))
    flat_i = gi.reshape(scores.shape[:-1] + (G * kk,))
    ms, mi = jax.lax.top_k(flat_s, k)
    return ms, jnp.take_along_axis(flat_i, mi, axis=-1)


@partial(jax.jit, static_argnames=("k",))
def _topk_scan(x, y, mask_rows, mask_cols, mask_vals, exclude_mask,
               glob_mean, k: int):
    """x: (n_chunks, C, R); mask_rows/cols: (n_chunks, M) chunk-local rows
    and item cols (padding entries carry +inf in ``mask_vals`` so the
    scatter-min leaves scores untouched — no padding row / concat pass).
    Returns ((n_chunks, C, k) scores, idx)."""

    def chunk(_, args):
        xc, mrows, mcols, mvals = args
        scores = jnp.dot(xc, y, preferred_element_type=jnp.float32)
        scores = scores + glob_mean
        scores = jnp.where(exclude_mask[None, :], NEG_INF, scores)
        # .min (not .set): padding entries carry +inf and may repeat
        # coordinates — min is duplicate-safe, so no hints are claimed
        scores = scores.at[mrows, mcols].min(mvals)
        ts, ti = exact_top_k_tournament(scores, k)
        return None, (ts, ti)

    _, (ts, ti) = jax.lax.scan(chunk, None,
                               (x, mask_rows, mask_cols, mask_vals))
    return ts, ti


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
    x = np.asarray(x, np.float32)
    y = jnp.asarray(y, jnp.float32)
    n_users, n_items = x.shape[0], y.shape[1]
    if k > n_items:
        raise ValueError(f"k={k} > n_items={n_items}")
    if n_users == 0:
        return (np.empty((0, k), np.int32), np.empty((0, k), np.float32))

    exclude_mask = np.zeros((n_items,), bool)
    if exclude is not None and len(exclude) > 0:
        exclude = np.asarray(exclude)
        if exclude.max() >= n_items:
            raise ValueError("some items_exclude indices are >= number of items")
        exclude_mask[exclude] = True

    nr = None
    if not_recommend is not None:
        nr = sp.csr_matrix(not_recommend)
        if nr.shape != (n_users, n_items):
            raise ValueError("not_recommend shape mismatch")

    C = min(user_chunk, max(n_users, 8))
    n_chunks = -(-n_users // C)

    # fixed per-chunk mask padding (one compile per (shapes, k))
    if nr is not None and nr.nnz > 0:
        row_nnz = np.diff(nr.indptr)
        max_mask = max(int(np.add.reduceat(
            row_nnz, np.arange(0, n_users, C)).max()), 1)
    else:
        max_mask = 1

    xs = np.zeros((n_chunks, C, x.shape[1]), np.float32)
    mrows = np.zeros((n_chunks, max_mask), np.int32)
    mcols = np.zeros((n_chunks, max_mask), np.int32)
    mvals = np.full((n_chunks, max_mask), np.inf, np.float32)  # pad = no-op
    for ci, s in enumerate(range(0, n_users, C)):
        e = min(s + C, n_users)
        xs[ci, : e - s] = x[s:e]
        if nr is not None and nr.nnz > 0:
            p1, p2 = nr.indptr[s], nr.indptr[e]
            m = p2 - p1
            if m > 0:
                mrows[ci, :m] = np.repeat(
                    np.arange(s, e, dtype=np.int32) - s,
                    np.diff(nr.indptr[s:e + 1]))
                mcols[ci, :m] = nr.indices[p1:p2]
                mvals[ci, :m] = NEG_INF

    ts, ti = _topk_scan(jnp.asarray(xs), y, jnp.asarray(mrows),
                        jnp.asarray(mcols), jnp.asarray(mvals),
                        jnp.asarray(exclude_mask),
                        jnp.float32(glob_mean), k)
    ts = np.asarray(ts).reshape(n_chunks * C, k)[:n_users]
    ti = np.asarray(ti).reshape(n_chunks * C, k)[:n_users]
    return ti, ts
