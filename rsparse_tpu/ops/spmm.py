"""Sparse-dense products and sparse-approximation over bucketed rows.

Replaces (a) the reference's CSR*dense products used by SoftALS
(R/SoftALS.R:86,101 via the Matrix package) and (b) the
``cpp_make_sparse_approximation`` kernel that evaluates a low-rank product
only at the nnz pattern of a template matrix
(reference src/utils.cpp:5-56, R/utils_SoftALS.R:3-22).

Both are expressed over the padded-bucket substrate: gathers + masked
einsums that XLA maps onto the MXU, instead of per-row OpenMP loops.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..config import accum_dtype


def spmm_buckets(br_buckets, n_rows: int, dense: jax.Array,
                 values_list=None) -> jax.Array:
    """Sparse @ dense: (n_rows, n_cols) x (n_cols, k) -> (n_rows, k).

    ``values_list`` optionally overrides each bucket's values (e.g. residual
    values from :func:`sparse_approx_buckets`).
    """
    k = dense.shape[1]
    dtype = dense.dtype
    sdt = accum_dtype(dtype)
    out = jnp.zeros((n_rows + 1, k), dtype=dtype)
    for bi, b in enumerate(br_buckets):
        vals = b.values if values_list is None else values_list[bi]
        mask = b.mask()
        vm = jnp.where(mask, vals.astype(sdt), 0.0)
        G = dense[b.col_idx].astype(sdt)              # (B, L, k)
        rows = jnp.einsum("bl,blk->bk", vm, G,
                          preferred_element_type=sdt)  # (B, k)
        out = out.at[b.row_ids].add(rows.astype(dtype))
    return out[:n_rows]


def sparse_approx_buckets(br_buckets, left: jax.Array, right: jax.Array,
                          scale: jax.Array | None = None):
    """Evaluate ``(left @ diag(scale) @ right.T)`` at each bucket's nnz
    pattern: returns a list of (B, L) value arrays (aligned with buckets).

    left: (n_rows, r) row factors, right: (n_cols, r) column factors.
    This is the projection step of soft-impute — the reference computes it
    with a per-row OpenMP loop of dot products (src/utils.cpp:5-56).
    """
    sdt = accum_dtype(left.dtype)
    if scale is not None:
        left = left * scale[None, :].astype(left.dtype)
    out = []
    for b in br_buckets:
        lf = left[jnp.minimum(b.row_ids, left.shape[0] - 1)].astype(sdt)
        rf = right[b.col_idx].astype(sdt)             # (B, L, r)
        vals = jnp.einsum("br,blr->bl", lf, rf,
                          preferred_element_type=sdt)
        out.append(vals.astype(left.dtype))
    return out


def residual_values(br_buckets, left, right, scale=None):
    """Bucket values minus the low-rank approximation at the nnz pattern
    (the ``x_delta`` of soft-impute, reference R/SoftALS.R:79-82)."""
    approx = sparse_approx_buckets(br_buckets, left, right, scale)
    return [b.values - a for b, a in zip(br_buckets, approx)]


def sq_norm_values(br_buckets, values_list=None) -> jax.Array:
    """Sum of squared (masked) values across buckets."""
    tot = jnp.zeros((), jnp.float32)
    for bi, b in enumerate(br_buckets):
        vals = b.values if values_list is None else values_list[bi]
        vm = jnp.where(b.mask(), vals.astype(jnp.float32), 0.0)
        tot = tot + jnp.sum(vm * vm)
    return tot
