"""Item-axis-sharded top-k retrieval.

The reference streams a per-user min-heap over the full item axis
(src/matrix_top_product.cpp:61-97).  At pod scale the item axis is the long
axis (SURVEY §5): here items are sharded across the mesh, every device
computes a fused dot+mask+top-k over its item shard, and only the O(k)
candidates per user cross the wire — an all-gather of (k, score) pairs
followed by a final top-k merge.  This is the MF counterpart of
ring/Ulysses-style sequence sharding: partition the long axis, exchange
only per-shard summaries.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsparse_tpu.ops.topk import (exact_top_k_tournament, masked_top_k_bits,
                                  _expand_bits)

NEG_INF = float(np.finfo(np.float32).min)


def sharded_top_k(
    mesh: Mesh,
    x: jax.Array,          # (n_users, R) replicated
    y: jax.Array,          # (R, n_items) — will be sharded on axis 1
    k: int,
    mask: Optional[jax.Array] = None,   # (n_users, n_items) bool, True=mask
    glob_mean: float = 0.0,
    axis: str = "data",
    mask_bits: Optional[jax.Array] = None,  # (n_users, n_items // 8) uint8
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k of ``x @ y + glob_mean`` with the item axis sharded.

    Returns (scores (n_users, k), indices (n_users, k) int32).  ``n_items``
    must divide the mesh axis size.  The mask travels either as a dense
    bool matrix (``mask``) or — 8x smaller on the wire and in HBM — as a
    packed little-endian bitmask (``mask_bits``, see
    ``ops.topk.pack_mask_bits``); bit expansion fuses into the local
    tournament pass.
    """
    n_dev = mesh.shape[axis]
    n_users, n_items = x.shape[0], y.shape[1]
    if n_items % n_dev:
        raise ValueError(f"n_items={n_items} not divisible by mesh axis "
                         f"{n_dev}")
    shard = n_items // n_dev
    if k > shard:
        raise ValueError(f"k={k} must be <= items-per-shard={shard}")
    if mask is not None and mask_bits is not None:
        raise ValueError("pass at most one of mask / mask_bits")
    if mask_bits is not None and shard % 8:
        raise ValueError("mask_bits needs items-per-shard divisible by 8")

    y_sh = jax.device_put(y, NamedSharding(mesh, P(None, axis)))
    x_rep = jax.device_put(x, NamedSharding(mesh, P()))
    gm = jnp.float32(glob_mean)
    is_bits = mask_bits is not None

    def local_topk(x_l, y_l, m_l=None):
        # per-shard fused dot + mask + top-k (tournament formulation: one
        # pass over the shard's scores + k tiny group re-scans, vs ~40
        # bitonic passes for lax.top_k — see ops/topk.py)
        scores = jnp.dot(x_l, y_l, preferred_element_type=jnp.float32)
        if is_bits and shard % 256 == 0 and shard > max(512, 2 * k):
            s, i = masked_top_k_bits(scores, m_l, k, glob_mean=gm)
        else:
            scores = scores + gm
            if m_l is not None:
                dead = _expand_bits(m_l)[:, :shard] if is_bits else m_l
                scores = jnp.where(dead, NEG_INF, scores)
            s, i = exact_top_k_tournament(scores, k)
        # globalize indices: offset by this shard's item base
        base = jax.lax.axis_index(axis) * shard
        i = i.astype(jnp.int32) + base
        # all-gather the O(k) candidates and merge
        s_all = jax.lax.all_gather(s, axis, axis=1)      # (n_u, n_dev, k)
        i_all = jax.lax.all_gather(i, axis, axis=1)
        s_flat = s_all.reshape(n_users, n_dev * k)
        i_flat = i_all.reshape(n_users, n_dev * k)
        sm, im = jax.lax.top_k(s_flat, k)
        return sm, jnp.take_along_axis(i_flat, im, axis=1)

    m_arg = mask_bits if is_bits else mask
    if m_arg is not None:
        mask_sh = jax.device_put(m_arg, NamedSharding(mesh, P(None, axis)))
        fn = jax.shard_map(local_topk, mesh=mesh,
                           in_specs=(P(), P(None, axis), P(None, axis)),
                           out_specs=(P(), P()), check_vma=False)
        return fn(x_rep, y_sh, mask_sh)
    fn = jax.shard_map(local_topk, mesh=mesh,
                       in_specs=(P(), P(None, axis)),
                       out_specs=(P(), P()), check_vma=False)
    return fn(x_rep, y_sh)
