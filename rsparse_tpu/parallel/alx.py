"""ALX-style routed ALS sweep: all-to-all factor exchange + local solves.

Integrates the routing primitive (parallel/routing.py) into a real WRMF
half-sweep.  The plain mesh path lets XLA all-gather the whole source
factor table to every device before the per-nnz gathers; at DCN scale that
is wasteful — each device's bucket shard references only a subset of rows.
Here (the ALX recipe, PAPERS.md "ALX: Large Scale Matrix Factorization on
TPUs"):

- the source factor table is ROW-SHARDED over the mesh's data axis;
- a static routing plan (built once at staging — sparsity is fixed across
  ALS iterations) tells every owner which of its rows each peer needs;
- one ``all_to_all`` delivers per-device factor caches; bucket column
  indices were remapped to cache-local slots at staging;
- the rank x rank Gram ``X'X`` is a per-shard partial + ``psum`` (tiny
  wire cost), the batched normal-equation solves run device-local inside
  ``shard_map`` (reusing the exact single-device bucket kernels of
  ops/als.py), and only the solved target rows leave the region.

Enabled with ``WRMF(mesh=..., routing="alx")``.  Supports all three
solvers; per-entity biases and the dense zipf-head split stay on the
default path (reference solver contract: inst/include/wrmf_implicit.hpp
:91-305, wrmf_explicit.hpp:34-174).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.als import (ALSConfig, _solve_one_bucket, _src_reg_loss,
                       _assemble_target, _active_slices, _exact_prec)
from ..config import accum_dtype
from ..sparse.device import BucketedRows, RowBucket
from .routing import RoutingPlan, build_routing_plan


class ALXStage(NamedTuple):
    """Staged ALX state for one sweep orientation (items or users)."""

    plan: RoutingPlan               # static all-to-all routing plan
    buckets: Tuple[RowBucket, ...]  # col_idx remapped to cache-local slots
    n_src_padded: int               # source rows incl. divisibility padding


def stage_alx(
    br: BucketedRows,
    n_src: int,
    mesh: Mesh,
    axis: str = "data",
) -> ALXStage:
    """Build the routing plan + cache-remapped sharded buckets.

    ``br`` must be UNsharded (host-built) buckets whose batches divide the
    data-axis size; the returned buckets are device arrays with their batch
    axis sharded over ``axis`` and ``col_idx`` rewritten to cache-local
    slots (valid only on the owning device — they are meaningless outside
    the shard_map region).
    """
    n_dev = mesh.shape[axis]
    n_src_p = -(-n_src // n_dev) * n_dev

    # per-device column-id sets: each bucket's batch is split contiguously
    per_dev = [[] for _ in range(n_dev)]
    for b in br.buckets:
        B = b.batch
        if B % n_dev:
            raise ValueError(f"bucket batch {B} not divisible by {n_dev}")
        step = B // n_dev
        ci = np.asarray(b.col_idx)
        for d in range(n_dev):
            per_dev[d].append(ci[d * step:(d + 1) * step])
    col_idx_per_device = [np.concatenate([a.ravel() for a in blocks])
                          if blocks else np.zeros((0,), np.int64)
                          for blocks in per_dev]

    plan, remapped = build_routing_plan(col_idx_per_device, n_src_p, n_dev)

    sh = NamedSharding(mesh, P(axis))
    out = []
    for bi, b in enumerate(br.buckets):
        B = b.batch
        step = B // n_dev
        L = b.pad_len
        new_ci = np.empty((B, L), np.int32)
        for d in range(n_dev):
            # this bucket's flat slice within device d's concatenated ids
            off = sum(blk.size for blk in per_dev[d][:bi])
            flat = remapped[d][off:off + step * L]
            new_ci[d * step:(d + 1) * step] = flat.reshape(step, L)
        out.append(RowBucket(
            row_ids=jax.device_put(b.row_ids, sh),
            col_idx=jax.device_put(jnp.asarray(new_ci), sh),
            values=jax.device_put(b.values, sh),
            nnz=jax.device_put(b.nnz, sh),
        ))
    return ALXStage(plan, tuple(out), n_src_p)


def _exchange_local(src_l, req_l, axis: str, n_dev: int, m: int):
    """Inside-shard_map body of routed_factor_exchange
    (parallel/routing.py:107-117)."""
    want = jax.lax.all_to_all(req_l[None], axis, split_axis=1,
                              concat_axis=0)[:, 0, :]      # (n_dev, m)
    sliced = src_l[want]                                   # (n_dev, m, r)
    cache = jax.lax.all_to_all(sliced, axis, split_axis=0, concat_axis=0)
    return cache.reshape(n_dev * m, src_l.shape[1])


def alx_sweep(
    mesh: Mesh,
    src: jax.Array,                # (n_src, R) host/replicated factors
    tgt_old: jax.Array,            # (n_tgt, R)
    stage: ALXStage,
    src_cnt: Optional[jax.Array],
    lam,
    g,
    cfg: ALSConfig,
    axis: str = "data",
) -> Tuple[jax.Array, jax.Array]:
    """One routed ALS half-sweep; numerically identical to
    :func:`ops.als.wrmf_sweep` on the same buckets.

    The whole compute path — factor exchange, psum Gram, batched solves —
    runs inside a single ``shard_map`` region per bucket; the solved rows
    are scattered into the replicated target table outside.
    """
    if cfg.with_biases:
        raise NotImplementedError("routing='alx' supports the no-per-entity"
                                  "-bias configurations")
    n_tgt = tgt_old.shape[0]
    R = src.shape[1]
    dtype = src.dtype
    sdt = accum_dtype(dtype)
    lam = jnp.asarray(lam, sdt)
    g = jnp.asarray(g, sdt)
    n_dev = mesh.shape[axis]
    m = stage.plan.cache_size // n_dev

    src_sl, tgt_sl = _active_slices(cfg, R)
    src_act = src[:, src_sl]
    d = src_act.shape[1]
    if stage.n_src_padded != src_act.shape[0]:
        src_act = jnp.concatenate([
            src_act, jnp.zeros((stage.n_src_padded - src_act.shape[0], d),
                               src_act.dtype)], axis=0)
    old_act = tgt_old[:, tgt_sl]

    src_sh = jax.device_put(src_act, NamedSharding(mesh, P(axis)))
    req_sh = jax.device_put(
        stage.plan.request_ids.reshape(n_dev * n_dev, m),
        NamedSharding(mesh, P(axis)))

    @partial(jax.jit, static_argnames=("n_tgt_", "cfg_"))
    def one_bucket(src_l_in, req_l_in, old_act_in, rid, ci, val, nz,
                   lam_, g_, n_tgt_: int, cfg_: ALSConfig):
        def body(src_l, req_l, old_l, rid_l, ci_l, val_l, nz_l):
            # (a) routed exchange: only referenced rows cross the wire
            cache = _exchange_local(src_l.astype(sdt), req_l, axis, n_dev, m)
            # (b) distributed Gram: per-shard partial + rank x rank psum
            if cfg_.feedback == "implicit":
                XtX = jnp.einsum("nd,ne->de", src_l.astype(sdt),
                                 src_l.astype(sdt),
                                 preferred_element_type=sdt,
                                 precision=_exact_prec(sdt))
                XtX = jax.lax.psum(XtX, axis) + lam_ * jnp.eye(d, dtype=sdt)
                rhs_init = None
                if cfg_.use_global_bias:
                    s = jnp.sum(src_l.astype(sdt), axis=0)
                    rhs_init = -g_ * jax.lax.psum(s, axis)
            else:
                XtX = jnp.zeros((1, 1), sdt)
                rhs_init = None
            # (c) device-local batched solve (exact single-device kernel)
            bucket = RowBucket(rid_l, ci_l, val_l, nz_l)
            ids = jnp.minimum(rid_l, n_tgt_ - 1)
            valid = rid_l < n_tgt_
            x_init = old_l[ids]
            y, le = _solve_one_bucket(cache, None, XtX, rhs_init, bucket,
                                      x_init, lam_, g_, cfg_, sdt)
            y = jnp.where(valid[:, None], y, 0.0)
            return y.astype(dtype), jax.lax.psum(
                jnp.sum(jnp.where(valid, le, 0.0)), axis)

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(axis), P(axis), P(axis),
                      P(axis)),
            out_specs=(P(axis), P()), check_vma=False)
        return fn(src_l_in, req_l_in, old_act_in, rid, ci, val, nz)

    result_act = jnp.zeros((n_tgt + 1, d), dtype=dtype)
    loss = jnp.zeros((), sdt)
    for b in stage.buckets:
        y, le = one_bucket(src_sh, req_sh, old_act, b.row_ids, b.col_idx,
                           b.values, b.nnz, lam, g, n_tgt_=n_tgt, cfg_=cfg)
        result_act = result_act.at[b.row_ids].set(y)
        loss = loss + le
    tgt_new = _assemble_target(result_act[:n_tgt], n_tgt, cfg, dtype)
    loss = loss + _src_reg_loss(src, src_cnt, lam, cfg, sdt)
    return tgt_new, loss
