"""VMEM-resident batched Cholesky solve (Pallas/TPU).

The ALS exact solver factors one rank-dim SPD system per entity (reference
``arma::solve(...likely_sympd)``, inst/include/wrmf_implicit.hpp:236).  The
XLA blocked batch solve (ops/solvers.py) is bound by its ~300-op sequential
panel chain: every masked rank-1 sweep streams the whole (B, 32, 32) panel
batch through HBM, so each op costs its bandwidth, ~23.5 ms per 8192
systems at d=128 on v5e.

This kernel holds a chunk of systems in VMEM end-to-end: blocked
factorization (rank-1 panel sweeps on the VPU, trailing updates as batched
MXU matmuls), explicit panel inverses so the forward/back substitutions are
batched matmuls too, one HBM read of ``lhs`` and one write of ``x`` total.

Mosaic notes: no ``dynamic_slice``/``dynamic_update_slice`` lowering exists
for values, so traced-index row/column extraction uses one-hot contractions
and writes use iota masks; the blocked matrix is carried as per-block values
(static slices only).

Numerics match the XLA blocked solve (true f32 throughout; normwise
~2.4e-7 vs an f64 oracle on well-conditioned ALS-style systems).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# True-f32 MXU passes everywhere: the exact-solver contract (ops/solvers.py
# _HI) forbids the default single-bf16-pass lowering of f32 dots, and
# interpret-mode tests cannot see a demotion in the real Mosaic lowering.
_HI = lax.Precision.HIGHEST


def _bmm_nt(a, b):
    """Batched a @ b^T: (B,m,k),(B,n,k) -> (B,m,n) on the MXU."""
    return lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI)


def _bmv(a, v):
    """Batched a @ v: (B,m,k),(B,k) -> (B,m)."""
    return lax.dot_general(
        a, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI)


def _bmv_t(a, v):
    """Batched a^T @ v: (B,k,m),(B,k) -> (B,m).

    Elementwise reduce on the VPU: Mosaic's tpu.matmul requires the lhs
    contracting dim to be the last one, which a transposed contraction
    violates; these are the small substitution steps, so VPU cost is noise.
    """
    return jnp.sum(a * v[:, :, None], axis=1)


def _panel_factor_inverse(P, bs):
    """Cholesky L and its inverse M = L^{-1} of (B,bs,bs) SPD panels.

    Fully static-unrolled column sweep: loop indices are Python ints, so
    every extraction/update is a static slice (cheap lane ops in Mosaic)
    instead of a one-hot contraction over the whole panel — the fori_loop
    formulation cost ~1.4us per sequential step from full-panel one-hot
    reads/writes and dominated the kernel (94.5 ms at B=8192, d=128).

    Returns (L, M) as (B,bs,bs).  The inverse rows come from forward
    substitution interleaved with the factorization (row i of L is final
    after sweep step i), so both cost one bs-step sequential chain.
    """
    cols = [P[:, :, j] for j in range(bs)]               # (B, bs) each
    row_iota = lax.broadcasted_iota(jnp.int32, (1, bs), 1)
    Lcols = []
    for j in range(bs):
        dj = cols[j][:, j]
        piv = jnp.sqrt(jnp.maximum(dj, 0.0))
        safe = jnp.where(piv > 0, piv, 1.0)
        colj = jnp.where(row_iota >= j, cols[j] / safe[:, None], 0.0)
        Lcols.append(colj)
        for t in range(j + 1, bs):
            cols[t] = cols[t] - colj * colj[:, t][:, None]
    # forward substitution on I: M row i = (e_i - sum_{k<i} L[i,k] M_k) / L[i,i]
    Mrows = []
    for i in range(bs):
        acc = None
        for k in range(i):
            term = Lcols[k][:, i][:, None] * Mrows[k]
            acc = term if acc is None else acc + term
        e_i = (row_iota == i).astype(P.dtype)             # (1, bs)
        num = e_i - acc if acc is not None else jnp.broadcast_to(
            e_i, Lcols[i].shape)
        lii = Lcols[i][:, i]
        Mrows.append(num / jnp.where(lii > 0, lii, 1.0)[:, None])
    L = jnp.stack(Lcols, axis=2)
    M = jnp.stack(Mrows, axis=1)
    return L, M


def _chol_solve_kernel(lhs_ref, rhs_ref, out_ref, *, bs):
    D = lhs_ref.shape[1]
    nb = D // bs

    # carry the matrix as per-block values: blk[i][j] = A[si:si+bs, sj:sj+bs]
    # for i >= j (static slices of the input ref; no dynamic_update_slice)
    blk = [[lhs_ref[:, i * bs:(i + 1) * bs, j * bs:(j + 1) * bs]
            for j in range(i + 1)] for i in range(nb)]

    # blocked right-looking factorization; panel inverses kept so the
    # substitution phases are batched matmuls
    Minv = []
    for k in range(nb):
        L, M = _panel_factor_inverse(blk[k][k], bs)
        Minv.append(M)
        blk[k][k] = L
        for i in range(k + 1, nb):
            blk[i][k] = _bmm_nt(blk[i][k], M)            # L_ik = A_ik M^T
        for i in range(k + 1, nb):
            for j in range(k + 1, i + 1):
                blk[i][j] = blk[i][j] - _bmm_nt(blk[i][k], blk[j][k])

    # forward: L y = rhs (y_k = M_k (rhs_k - sum_{j<k} L_kj y_j))
    y = []
    for k in range(nb):
        acc = rhs_ref[:, k * bs:(k + 1) * bs]
        for j in range(k):
            acc = acc - _bmv(blk[k][j], y[j])
        y.append(_bmv(Minv[k], acc))

    # back: L^T x = y (x_k = M_k^T (y_k - sum_{i>k} L_ik^T x_i))
    x = [None] * nb
    for k in reversed(range(nb)):
        acc = y[k]
        for i in range(k + 1, nb):
            acc = acc - _bmv_t(blk[i][k], x[i])
        x[k] = _bmv_t(Minv[k], acc)
        out_ref[:, k * bs:(k + 1) * bs] = x[k]


# Scoped-VMEM footprint of one grid step, measured on v5e: the (bc, D, D)
# input block (double-buffered) plus the carried lower-triangle block values,
# panel inverses and temporaries come to ~6.2x the single-buffered input
# block (observed at D=128: bc=64 -> 21.82M, bc=40 -> 16.21M scoped vs the
# 16M limit).  Leave headroom below the limit.
_VMEM_BUDGET = 14 << 20
_VMEM_OVERHEAD = 6.6


def pick_chunk(d: int, bs: int = 32) -> int:
    """Largest per-grid-step batch chunk (multiple of 8, <= 64) whose scoped
    VMEM footprint fits; 0 when no chunk >= 8 fits (caller must fall back to
    the XLA blocked solve)."""
    D = -(-d // bs) * bs
    bc = int(_VMEM_BUDGET / (_VMEM_OVERHEAD * D * D * 4))
    bc = min(64, (bc // 8) * 8)
    return bc if bc >= 8 else 0


@partial(jax.jit, static_argnames=("bs", "bc", "interpret"))
def pallas_spd_solve(lhs: jax.Array, rhs: jax.Array, bs: int = 32,
                     bc: int = 0, interpret: bool = False) -> jax.Array:
    """Solve a batch of SPD systems ``lhs @ x = rhs`` in VMEM.

    lhs: (B, d, d) f32, rhs: (B, d) f32 -> (B, d) f32.  ``d`` is padded to a
    multiple of ``bs`` with an identity diagonal (solution unchanged); the
    batch is padded to a multiple of the per-grid-step chunk ``bc`` with
    identity systems.  ``bc=0`` (default) picks the chunk from the scoped
    VMEM model (:func:`pick_chunk`) — e.g. 64 at d<=64, 32 at d=128.
    """
    B, d = lhs.shape[0], lhs.shape[-1]
    if bc == 0:
        bc = pick_chunk(d, bs)
        if bc == 0:
            raise ValueError(
                f"no VMEM-feasible chunk for d={d}; use the blocked solve")
    lhs = lhs.astype(jnp.float32)
    rhs = rhs.astype(jnp.float32)
    D = -(-d // bs) * bs
    if D != d:
        pad = D - d
        eye = jnp.eye(D, dtype=jnp.float32)[None, d:, :]
        lhs = jnp.concatenate([
            jnp.concatenate([lhs, jnp.zeros((B, d, pad), jnp.float32)], 2),
            jnp.broadcast_to(eye, (B, pad, D))], 1)
        rhs = jnp.concatenate([rhs, jnp.zeros((B, pad), jnp.float32)], 1)
    Bp = -(-B // bc) * bc
    if Bp != B:
        lhs = jnp.concatenate([
            lhs, jnp.broadcast_to(jnp.eye(D, dtype=jnp.float32)[None],
                                  (Bp - B, D, D))], 0)
        rhs = jnp.concatenate([rhs, jnp.zeros((Bp - B, D), jnp.float32)], 0)

    x = pl.pallas_call(
        partial(_chol_solve_kernel, bs=bs),
        grid=(Bp // bc,),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        in_specs=[
            pl.BlockSpec((bc, D, D), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bc, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bc, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(lhs, rhs)
    return x[:B, :d]
