"""ALX-style all-to-all factor routing.

At ICI scale, gathering source factors from a row-sharded table via
all-gather is fine (the whole table rides the interconnect).  Across hosts
(DCN) that is wasteful: each host's CSR shard references only a subset of
the factor rows.  The ALX recipe ("ALX: Large Scale Matrix Factorization on
TPUs", PAPERS.md) routes *only the referenced rows*: every device asks each
owner for the rows its buckets touch, owners slice their shard, and a
single ``all_to_all`` delivers per-device factor caches; bucket column
indices are remapped to cache-local positions ahead of time (the sparsity
pattern is static across ALS iterations, so the routing plan is built once
on the host).

This module provides the routing plan + exchange primitive and a test-level
guarantee that a routed gather equals a direct global gather.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class RoutingPlan(NamedTuple):
    """Static all-to-all routing plan for one bucket set.

    request_ids: (n_dev, n_dev, m) int32 — request_ids[d, o] are the rows
      device ``d`` wants from owner ``o``, as *owner-local* row indices
      (padded with 0; padding slots are never referenced after remap).
    cache_size: rows per device cache (= n_dev * m).
    remap:      per input shard, col_idx rewritten to cache-local ids.
    """

    request_ids: jax.Array
    cache_size: int
    shard_rows: int


def build_routing_plan(
    col_idx_per_device: Sequence[np.ndarray],
    n_src: int,
    n_dev: int,
) -> Tuple[RoutingPlan, list]:
    """Build the static plan and the remapped col_idx arrays.

    ``col_idx_per_device[d]`` holds the (arbitrary-shape) global column ids
    device ``d`` references.  The source table is row-sharded contiguously:
    owner(i) = i // shard_rows.
    """
    if n_src % n_dev:
        raise ValueError(
            "n_dev must divide n_src for contiguous sharding "
            f"(got n_src={n_src}, n_dev={n_dev}); pad the source table")
    shard_rows = n_src // n_dev

    needed = []   # per device: per owner unique local ids
    m = 1
    for d in range(n_dev):
        ids = np.unique(np.asarray(col_idx_per_device[d]).ravel())
        per_owner = []
        for o in range(n_dev):
            lo, hi = o * shard_rows, (o + 1) * shard_rows
            local = ids[(ids >= lo) & (ids < hi)] - lo
            per_owner.append(local)
            m = max(m, len(local))
        needed.append(per_owner)

    request_ids = np.zeros((n_dev, n_dev, m), np.int32)
    # lookup: global id -> cache slot, per device
    remapped = []
    for d in range(n_dev):
        lut = np.zeros(n_src, np.int32)
        for o in range(n_dev):
            local = needed[d][o]
            request_ids[d, o, :len(local)] = local
            slots = o * m + np.arange(len(local), dtype=np.int32)
            lut[o * shard_rows + local] = slots
        remapped.append(lut[np.asarray(col_idx_per_device[d])])

    plan = RoutingPlan(jnp.asarray(request_ids), n_dev * m, shard_rows)
    return plan, remapped


def routed_factor_exchange(
    mesh: Mesh,
    src: jax.Array,          # (n_src, r) row-sharded over `axis`
    plan: RoutingPlan,
    axis: str = "data",
) -> jax.Array:
    """Deliver each device's factor cache (n_dev, cache_size per device).

    Returns a (n_dev * cache_size, r) array sharded over ``axis`` whose
    device-local block is that device's cache; index it with the remapped
    col_idx from :func:`build_routing_plan`.
    """
    n_dev = mesh.shape[axis]
    m = plan.cache_size // n_dev
    req_sh = jax.device_put(
        plan.request_ids.reshape(n_dev * n_dev, m),
        NamedSharding(mesh, P(axis)))
    src_sh = jax.device_put(src, NamedSharding(mesh, P(axis)))

    def exchange(src_local, req_local):
        return exchange_body(src_local, req_local, axis, n_dev, m)

    fn = jax.shard_map(exchange, mesh=mesh,
                       in_specs=(P(axis), P(axis)),
                       out_specs=P(axis), check_vma=False)
    return fn(src_sh, req_sh)


def exchange_body(src_local, req_local, axis, n_dev: int, m: int):
    """Inside-shard_map body of the routed exchange (shared with
    parallel/alx.py).  req_local: (n_dev, m) — what *this* device wants
    from each owner; first an all_to_all of requests tells every owner
    what to slice, then one all_to_all delivers the caches."""
    want = jax.lax.all_to_all(req_local[None], axis, split_axis=1,
                              concat_axis=0)[:, 0, :]       # (n_dev, m)
    sliced = src_local[want]                                # (n_dev, m, r)
    cache = jax.lax.all_to_all(sliced, axis, split_axis=0,
                               concat_axis=0)               # (n_dev, m, r)
    return cache.reshape(n_dev * m, src_local.shape[1])


def wire_cost_report(plan: RoutingPlan, n_dev: int, rank: int,
                     itemsize: int = 4) -> dict:
    """Analytic per-sweep collective wire bytes of one routed factor
    exchange vs the plain data-parallel path's all-gather.

    This is the point of the ALX design (PAPERS.md "ALX: Large Scale
    Matrix Factorization on TPUs"): the plain mesh path all-gathers the
    ENTIRE row-sharded source factor table to every device before the
    per-nnz gathers — wire bytes grow with the table; the routed exchange
    moves only (max-padded) referenced rows — wire bytes grow with the
    bucket shards' unique references and are INDEPENDENT of table size.

    Counts only off-device traffic (each device's own diagonal block of
    an all_to_all / its own shard in an all-gather stays local):

    - ``request_bytes``: int32 request-id all_to_all,
      ``n_dev * (n_dev-1) * m * 4``.
    - ``cache_bytes``: factor-row all_to_all,
      ``n_dev * (n_dev-1) * m * rank * itemsize``.
    - ``allgather_bytes``: the plain path,
      ``n_dev * (n_dev-1) * shard_rows * rank * itemsize``.

    ``m = cache_size / n_dev`` is the max unique referenced rows per
    (device, owner) pair — the all_to_all's static padding.  Totals are
    summed over all devices per exchange (one exchange per sweep
    orientation per ALS iteration; the request all_to_all is
    iteration-invariant and could be hoisted, it is counted here).
    """
    m = plan.cache_size // n_dev
    off = n_dev * (n_dev - 1)
    request_bytes = off * m * 4
    cache_bytes = off * m * rank * itemsize
    allgather_bytes = off * plan.shard_rows * rank * itemsize
    return {
        "n_dev": n_dev,
        "m": m,
        "shard_rows": plan.shard_rows,
        "request_bytes": request_bytes,
        "cache_bytes": cache_bytes,
        "routed_total_bytes": request_bytes + cache_bytes,
        "allgather_bytes": allgather_bytes,
        "routed_over_allgather": (request_bytes + cache_bytes)
        / max(allgather_bytes, 1),
    }
