"""Wire-byte accounting for the distributed layer (VERDICT r4 weak #4).

Real 2-host wall-clock scaling is unmeasurable in this environment, but
the collective traffic is assertable without hardware: analytically from
the routing plan, and from the compiled HLO's collective operand shapes.
The claims pinned here:

1. ALX routed exchange moves bytes proportional to the bucket shards'
   unique factor references — NOT the table size (the plain path's
   all-gather grows linearly with the table).
2. The compiled program's all-to-all shapes equal the plan's analytic
   shapes (no hidden re-materialization of the full table).
3. The sharded top-k merge exchanges O(k) candidates per user per device,
   independent of the item-axis length.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsparse_tpu.parallel.routing import (build_routing_plan,
                                          routed_factor_exchange,
                                          wire_cost_report)


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8])
    return Mesh(devs, ("data",))


def _make_refs(n_dev, n_src, refs_per_dev, seed=0):
    rng = np.random.default_rng(seed)
    return [rng.choice(n_src, size=refs_per_dev, replace=False)
            for _ in range(n_dev)]


def test_routed_bytes_track_references_not_table_size():
    n_dev, rank = 8, 128
    refs = _make_refs(n_dev, 4096, 256)

    # same per-owner reference profile, 16x larger table (each ref scaled
    # to the same relative position): routed bytes must NOT grow with the
    # table; the all-gather baseline must grow exactly 16x
    plan_small, _ = build_routing_plan(refs, 4096, n_dev)
    plan_big, _ = build_routing_plan([r * 16 for r in refs], 65536, n_dev)
    r_small = wire_cost_report(plan_small, n_dev, rank)
    r_big = wire_cost_report(plan_big, n_dev, rank)
    assert r_big["m"] == r_small["m"]
    assert r_big["routed_total_bytes"] == r_small["routed_total_bytes"]
    assert r_big["allgather_bytes"] == 16 * r_small["allgather_bytes"]
    assert r_big["routed_over_allgather"] < 0.02

    # 2x the references: routed bytes grow ~linearly (between 1x and 3x —
    # max-padding over owners is sub-linear but monotone)
    refs2 = _make_refs(n_dev, 65536, 512)
    plan2, _ = build_routing_plan(refs2, 65536, n_dev)
    r2 = wire_cost_report(plan2, n_dev, rank)
    ratio = r2["routed_total_bytes"] / r_big["routed_total_bytes"]
    assert 1.0 < ratio < 3.0, ratio


def test_routed_exchange_hlo_shapes_match_plan(mesh):
    """The compiled exchange contains exactly two all-to-alls with the
    plan's analytic shapes — nothing the size of the table crosses the
    wire."""
    n_dev, rank = 8, 16
    n_src = 4096
    refs = _make_refs(n_dev, n_src, 64, seed=1)
    plan, _ = build_routing_plan(refs, n_src, n_dev)
    m = plan.cache_size // n_dev

    src = jnp.zeros((n_src, rank), jnp.float32)
    fn = jax.jit(lambda s: routed_factor_exchange(mesh, s, plan))
    txt = jax.jit(
        lambda s, r: _exchange_for_hlo(mesh, s, r, n_dev, m)
    ).lower(
        jax.ShapeDtypeStruct((n_src, rank), jnp.float32),
        jax.ShapeDtypeStruct((n_dev * n_dev, m), jnp.int32),
    ).compile().as_text()
    # per-device volume of each all-to-all OP: sum of its result-tuple
    # shapes (XLA CPU decomposes the collective into per-peer pieces)
    op_lines = [ln for ln in txt.splitlines()
                if re.search(r"=.*all-to-all(\.\d+)?\(", ln)]
    assert op_lines, "no all-to-all in compiled HLO"
    vols = []
    for ln in op_lines:
        # "%all-to-all.N = (f32[1,14,16], ...) all-to-all(...)" — take
        # the result-type tuple between "= " and the op name
        type_str = ln.split(" = ", 1)[1].split("all-to-all", 1)[0]
        elems = sum(int(np.prod([int(x) for x in s.split(",")]))
                    for s in re.findall(r"\[([\d,]+)\]", type_str))
        vols.append(elems)
    cache_elems = n_dev * m * rank
    req_elems = n_dev * m
    assert any(v == cache_elems for v in vols), (vols, cache_elems)
    assert all(v <= cache_elems for v in vols), vols
    assert any(v <= req_elems for v in vols), (vols, req_elems)
    # nothing table-sized (n_src * rank) crosses the collective
    assert all(v < n_src * rank for v in vols)

    # and the exchange is CORRECT: routed gather == direct gather
    rng = np.random.default_rng(0)
    srcv = jnp.asarray(rng.standard_normal((n_src, rank)), jnp.float32)
    cache = routed_factor_exchange(mesh, srcv, plan)
    _, remapped = build_routing_plan(refs, n_src, n_dev)
    cache_np = np.asarray(cache).reshape(n_dev, plan.cache_size, rank)
    for d in range(n_dev):
        want = np.asarray(srcv)[refs[d]]
        got = cache_np[d][remapped[d]]
        np.testing.assert_allclose(got, want, atol=0)


def _exchange_for_hlo(mesh, src, req, n_dev, m):
    from rsparse_tpu.parallel.routing import exchange_body

    return jax.shard_map(
        lambda s, r: exchange_body(s, r, "data", n_dev, m),
        mesh=mesh, in_specs=(P("data"), P("data")),
        out_specs=P("data"), check_vma=False)(src, req)


def test_sharded_topk_merge_is_k_bounded(mesh):
    """The sharded top-k merge all-gathers only (n_users, k) score/index
    candidates per shard — wire volume O(users * k * n_dev), independent
    of the item-axis length."""
    from rsparse_tpu.parallel.topk_sharded import _sharded_topk_fn

    n_u, n_i, r, k = 64, 4096, 16, 10
    n_dev = 8
    fn = _sharded_topk_fn(mesh, "data", k, n_i // n_dev, n_u, n_dev,
                          False, False)
    txt = fn.lower(
        jax.ShapeDtypeStruct((n_u, r), jnp.float32),
        jax.ShapeDtypeStruct((r, n_i), jnp.float32),   # (rank, items)
        jax.ShapeDtypeStruct((), jnp.float32),
    ).compile().as_text()
    gather_lines = [ln for ln in txt.splitlines()
                    if re.search(r"=.*all-gather(\.\d+)?\(", ln)]
    assert gather_lines, "no all-gather in compiled sharded top-k"
    for ln in gather_lines:
        type_str = ln.split(" = ", 1)[1].split("all-gather", 1)[0]
        elems = sum(int(np.prod([int(x) for x in s.split(",")]))
                    for s in re.findall(r"\[([\d,]+)\]", type_str))
        # every collective result is candidate-sized (n_u, n_dev, k),
        # never item-axis-sized
        assert elems <= n_u * k * n_dev * 2, ln
        assert elems < n_u * (n_i // n_dev), ln


def test_ragged_exchange_matches_direct_gather(mesh):
    """The ragged routed exchange (zero per-pair padding) must deliver
    exactly the rows each device's bucket shard references, and its wire
    bytes must sit at the information floor (sum of unique references)
    — the dense plan's padded bytes are an upper bound."""
    from rsparse_tpu.parallel.routing import (
        build_ragged_routing_plan, build_routing_plan,
        ragged_factor_exchange, wire_cost_report, wire_cost_report_ragged)

    n_dev, rank, n_src = 8, 16, 4096
    rng = np.random.default_rng(2)
    # skewed demand: device d references d*40+8 rows (zipf-ish spread)
    refs = [rng.choice(n_src, size=8 + 40 * d, replace=False)
            for d in range(n_dev)]
    plan, remapped = build_ragged_routing_plan(refs, n_src, n_dev)
    src = jnp.asarray(rng.standard_normal((n_src, rank)), jnp.float32)
    # XLA:CPU lacks ragged-all-to-all; the dense emulation runs the SAME
    # plan/offsets/remap math.  The real collective must still LOWER.
    cache = ragged_factor_exchange(mesh, src, plan)
    txt = jax.jit(
        lambda s: ragged_factor_exchange(mesh, s, plan, emulate=False)
    ).lower(jax.ShapeDtypeStruct((n_src, rank), jnp.float32)).as_text()
    assert "ragged_all_to_all" in txt or "ragged-all-to-all" in txt
    cache_np = np.asarray(cache).reshape(n_dev, plan.cache_size, rank)
    for d in range(n_dev):
        got = cache_np[d][remapped[d]]
        want = np.asarray(src)[refs[d]]
        np.testing.assert_allclose(got, want, atol=0)

    # wire bytes == off-device unique references exactly
    rep = wire_cost_report_ragged(plan, n_dev, rank)
    shard = n_src // n_dev
    expect = sum(
        int(np.sum((refs[d] < d * shard) | (refs[d] >= (d + 1) * shard)))
        for d in range(n_dev))
    assert rep["rows_on_wire"] == expect
    # and at most the dense plan's padded volume
    dense_plan, _ = build_routing_plan(refs, n_src, n_dev)
    dense = wire_cost_report(dense_plan, n_dev, rank)
    assert rep["routed_total_bytes"] <= dense["routed_total_bytes"]
