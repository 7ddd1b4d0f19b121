"""Scheduled segment-sum: scatter-free table updates for SGD models.

The reference's FTRL/FM hot loops are per-row scatter updates into shared
tables (reference src/FTRL.cpp:122-169, src/factorization_machine.cpp:
112-194) — cheap on CPUs, pathological on TPU where XLA lowers dynamic
scatter-add to a serialized update stream (measured 390k FTRL rows/s vs a
~10M rows/s 16-thread CPU proxy, PERF.md round 4).

The TPU-native replacement exploits that the minibatch *layout* is static:
bucketed (B, L) blocks are staged once per fit, so the flat position of
every (sample, feature) pair is known on the host.  Staging builds a
**column schedule** — for each feature, the padded list of flat positions
where it occurs — and the update becomes three TPU-friendly ops:

    per-nnz updates  u = f(gathered z/n, x, y)       (B, L)   elementwise
    per-feature sums s_f = sum u[positions_f]        gather + masked reduce
    table update     T += s[inv_perm]                (dense mode)
                     T  = T.at[feats].add(s)         (sparse mode)

Per-position scatters are gone either way; what remains is mode-chosen
at build time (see :class:`ColSchedule`): small tables take a full
dense add (``inv`` gather — zero dynamic scatters), hashed-feature
tables (rows >> nnz) take ONE scatter of the per-feature sums (the
dense delta would be O(table_rows) per block).  Sums match per-position
scatter-add up to f32 summation order.

Features are bucketed by occurrence count on the same geometric grid as
the row substrate (sparse/device.py), so wildly-popular features don't
force padding on rare ones.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sparse.device import _round_up


class ColSchedule(NamedTuple):
    """Device-resident column schedule of one (B, L) block.

    ``pos[k]``: (Bk, Lk) int32 flat positions (into the block's B*L flat
    axis) of each scheduled feature's occurrences; padding entries hold
    ``n_flat`` (masked by ``nnz``).

    Two table-update modes, chosen at build time by the ratio of table
    rows to scheduled rows:

    - **dense** (small tables): ``inv`` is the (table_rows,) int32 map
      from each table row to its row in the concatenated per-bucket sums
      (+ one trailing zero row for absent features); the update is a full
      dense gather + table add.  O(table_rows) per block — cheap when the
      table fits a few MB.
    - **sparse** (table_rows >> scheduled rows, e.g. hashed GLM features
      at 1e7+): ``inv`` is None and ``feats`` holds the (sum Bk,) global
      ids of the scheduled features (bucket-concatenated; padding rows
      point at row 0 and carry exactly-zero sums).  The update scatters
      only the active rows — O(nnz) per block.  The dense form measured
      4.7 s/pass at F=40M (8 full-table gathers+adds of 160 MB each per
      pass) vs ~0.08 s for the scatter of ~1M summed rows (PERF.md r4).

    ``row_of_pos`` maps every flat position to the scheduled row of its
    own feature (positions -> rows of the ``scheduled_sums`` output):
    the per-position image of a freshly-updated accumulator is then
    ``old_gathered + sums[row_of_pos]`` — no second cold table gather
    (FM's accumulator-first AdaGrad re-gather, models/fm.py).
    """

    pos: Tuple[jax.Array, ...]
    nnz: Tuple[jax.Array, ...]
    inv: Optional[jax.Array]
    feats: Optional[jax.Array]
    row_of_pos: Optional[jax.Array] = None


def build_col_schedule(
    col_flat: np.ndarray,
    table_rows: int,
    *,
    row_align: int = 8,
    max_buckets: int = 10,
    sparse_factor: int = 4,
) -> ColSchedule:
    """Build the column schedule of one block from its flat column ids.

    ``col_flat`` (n_flat,) int32; masked padding entries may point at any
    column (their update values are zero, so their sums are no-ops).
    ``table_rows`` is the (mesh-padded) table row count a dense delta
    must cover.  Sparse mode is chosen when ``table_rows >
    sparse_factor * scheduled_rows`` (dense costs a table-sized gather +
    add per update; sparse a scheduled-rows scatter at ~1/4 the gather
    rate, PERF.md round-4 table-op matrix).

    Occurrence counts bucket on a pure power-of-2 grid FROM 1: in the
    sparse-feature regime (features occurring once or twice, e.g. one-hot
    GLM columns at millions of features) any larger minimum length
    multiplies the scheduled gather volume by that minimum (a measured
    5.5x gather amplification at 4M features with min_len=8, PERF.md
    round 4).
    """
    n_flat = int(col_flat.size)
    if n_flat == 0:
        return ColSchedule((), (), None, None)
    order = np.argsort(col_flat, kind="stable").astype(np.int64)
    # per-active-feature occurrence counts from ONE sort: run boundaries
    # of the sorted copy (np.unique would re-sort; a
    # bincount(minlength=4e7) per block dominated staging before that)
    sc = col_flat[order]
    first = np.empty(n_flat, bool)
    first[0] = True
    np.not_equal(sc[1:], sc[:-1], out=first[1:])
    starts = np.flatnonzero(first)         # first sorted position per feat
    active = sc[starts].astype(np.int64)
    occ = np.diff(np.append(starts, n_flat))

    lengths = 2 ** np.ceil(np.log2(occ)).astype(np.int64)
    lengths = np.maximum(lengths, 1)
    uniq, ucounts = np.unique(lengths, return_counts=True)
    while len(uniq) > max_buckets:
        k = int(np.argmin(ucounts[:-1]))
        lengths[lengths == uniq[k]] = uniq[k + 1]
        uniq, ucounts = np.unique(lengths, return_counts=True)

    pos_np: List[np.ndarray] = []
    nnz_out: List[jax.Array] = []
    feats_np: List[np.ndarray] = []
    meta: List[Tuple[np.ndarray, int]] = []   # (feature ids, row offset)
    offset = 0
    for L in uniq:
        L = int(L)
        sel = lengths == L
        feats = active[sel]
        cnt = occ[sel]
        B = _round_up(len(feats), row_align)
        nnz = np.zeros((B,), np.int32)
        nnz[: len(feats)] = cnt
        flat = starts[sel][:, None] + np.arange(L)[None, :]
        valid = np.arange(L)[None, :] < cnt[:, None]
        pos = np.full((B, L), n_flat, np.int32)
        pos[: len(feats)] = np.where(
            valid, order[np.minimum(flat, n_flat - 1)], n_flat)
        fp = np.zeros((B,), np.int32)          # padding rows -> row 0,
        fp[: len(feats)] = feats               # their sums are exactly 0
        meta.append((feats, offset))
        offset += B
        pos_np.append(pos)
        nnz_out.append(jnp.asarray(nnz))
        feats_np.append(fp)

    # position -> scheduled-sums row of its own feature (every real flat
    # position appears in exactly one pos list; padding writes land in
    # the spare trailing slot)
    rop = np.zeros(n_flat + 1, np.int32)
    for (_, off), pos in zip(meta, pos_np):
        B, L = pos.shape
        rows = np.broadcast_to(
            (off + np.arange(B, dtype=np.int32))[:, None], (B, L))
        rop[np.minimum(pos, n_flat)] = rows
    row_of_pos = jnp.asarray(rop[:n_flat])
    pos_out = tuple(jnp.asarray(p) for p in pos_np)

    if table_rows > sparse_factor * offset:
        return ColSchedule(pos_out, tuple(nnz_out), None,
                           jnp.asarray(np.concatenate(feats_np)),
                           row_of_pos)

    # dense: absent features read the trailing zero row of the sums
    inv_final = np.full((table_rows,), offset, np.int32)
    for feats, off in meta:
        inv_final[feats] = off + np.arange(len(feats), dtype=np.int32)
    return ColSchedule(pos_out, tuple(nnz_out),
                       jnp.asarray(inv_final), None, row_of_pos)


def staged_blocks_with_schedules(csr, dtype, n_features: int, mesh,
                                 tag: str, max_elems: int = 1 << 20):
    """Content-cached staging of the GLM row blocks + column schedules.

    Returns ``(BucketedRows, (ColSchedule, ...), (mask, ...))`` aligned by
    bucket — masks are pre-computed here because ``bucket.mask()`` is an
    eager per-call device computation otherwise (one dispatch per block
    per pass).  Under a mesh everything is fully replicated (the delta
    covers the mesh-padded table rows, so ``ops.add_dense`` can slice per
    shard)."""
    from ..parallel.sgd_sharded import padded_rows, replicate_on
    from ..sparse.device import (BucketedRows, RowBucket, bucket_rows,
                                 staged_cached)

    table_rows = (padded_rows(n_features + 1, mesh)
                  if mesh is not None else n_features + 1)

    def build():
        host_out: list = []
        br = bucket_rows(csr, dtype, include_empty=True,
                         max_elems=max_elems, host_out=host_out)
        scheds = tuple(build_col_schedule(c.reshape(-1), table_rows)
                       for c, _ in host_out)
        masks = tuple(b.mask() for b in br.buckets)
        if mesh is not None:
            bks = tuple(RowBucket(*replicate_on(mesh, tuple(b)))
                        for b in br.buckets)
            br = BucketedRows(bks, br.n_rows, br.n_cols, br.nnz,
                              br.empty_rows)
            scheds = replicate_on(mesh, scheds)
            masks = replicate_on(mesh, masks)
        return br, scheds, masks

    return staged_cached(tag, csr, build,
                         extra=(str(jnp.dtype(dtype)), mesh, max_elems))


def staged_label_gathers(tag: str, csr, y: np.ndarray,
                         weights: np.ndarray, br, dtype, mesh,
                         zero_pad_weight: bool):
    """Per-bucket label/weight gathers, content-cached.

    ``y[bucket.row_ids]`` is pass-invariant for a fixed (x, y, weights)
    triple, but computing it per block per pass costs an eager dispatch
    plus a host->device staging of y/weights each call (~25 ms/pass at
    bench scale on the relay).  Returns a tuple of (y_b, w_b) per bucket;
    ``zero_pad_weight`` zeroes w on batch-padding rows (the FM intercept
    contract, src/factorization_machine.cpp:147-149)."""
    import zlib

    from ..parallel.sgd_sharded import replicate_on
    from ..sparse.device import _csr_fingerprint, staged_aux_cached

    fp = (_csr_fingerprint(csr), zlib.adler32(np.ascontiguousarray(y)),
          zlib.adler32(np.ascontiguousarray(weights)), len(y))

    def build():
        n_rows = len(y)
        yd = jnp.asarray(y, dtype)
        wd = jnp.asarray(weights, dtype)
        out = []
        for b in br.buckets:
            rid = jnp.minimum(b.row_ids, n_rows - 1)
            w_b = wd[rid]
            if zero_pad_weight:
                w_b = jnp.where(b.row_ids < n_rows, w_b, 0.0)
            out.append((yd[rid], w_b))
        out = tuple(out)
        return replicate_on(mesh, out) if mesh is not None else out

    return staged_aux_cached(tag, fp, build,
                             extra=(str(jnp.dtype(dtype)), mesh,
                                    zero_pad_weight))


def scheduled_sums(u_flat: jax.Array, sched: ColSchedule) -> jax.Array:
    """Per-scheduled-feature sums of flat per-nnz updates, concatenated
    across the schedule's occurrence buckets: (sum Bk[, r]).  Padding rows
    sum to exactly 0 (the nnz mask zeroes every term)."""
    n_flat = u_flat.shape[0]
    outs = []
    for pos, nnz in zip(sched.pos, sched.nnz):
        g = u_flat[jnp.minimum(pos, n_flat - 1)]        # (B, L[, r])
        m = jax.lax.broadcasted_iota(jnp.int32, pos.shape, 1) < nnz[:, None]
        if u_flat.ndim == 2:
            m = m[..., None]
        outs.append(jnp.sum(jnp.where(m, g, 0), axis=1))
    return jnp.concatenate(outs, axis=0)


def scheduled_table_add(ops, table: jax.Array, u_flat: jax.Array,
                        sched: ColSchedule) -> jax.Array:
    """``table += zeros.at[col_flat].add(u_flat)`` through the staged
    schedule — the single entry point model kernels use.

    Dense-mode schedules apply a full-table delta (``ops.add_dense``);
    sparse-mode schedules scatter only the active-feature sums
    (``ops.scatter_add`` on global ids — the sharded ops mask to the
    local row shard).  Both produce identical tables: each feature row
    receives its single bucket-sum either way.
    """
    if not sched.pos:
        return table
    return scheduled_table_add_sums(ops, table,
                                    scheduled_sums(u_flat, sched), sched)


def scheduled_table_add_sums(ops, table: jax.Array, sums: jax.Array,
                             sched: ColSchedule) -> jax.Array:
    """Apply precomputed ``scheduled_sums`` output to the table (callers
    that also need the sums — e.g. FM's accumulator-first re-gather via
    ``sums[sched.row_of_pos]`` — avoid summing twice)."""
    if sched.inv is not None:
        zero = jnp.zeros((1,) + sums.shape[1:], sums.dtype)
        delta = jnp.concatenate([sums, zero], axis=0)[sched.inv]
        return ops.add_dense(table, delta)
    return ops.scatter_add(table, sched.feats, sums)
