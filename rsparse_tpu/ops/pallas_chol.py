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
(static slices only).  A fully static-unrolled panel formulation
(python-int loop indices -> static slices) was tried in round 3: it should
cut the dominant per-step cost ~3-5x, but its Mosaic compile through the
remote toolchain exceeded 32 minutes (vs ~6.5 min for this fori_loop form)
and was abandoned — see git history of this file.

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


def _panel_factor(P, bs):
    """Rank-1 sweep Cholesky of (B,bs,bs) SPD panels -> lower L.

    Same masked-sweep math as ops/solvers._chol_panel; traced-index column
    extraction is a one-hot contraction (Mosaic has no value dynamic_slice).
    """
    rows = lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cols = lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    idx = lax.broadcasted_iota(jnp.int32, (bs, 1), 0)[:, 0]

    def body(j, A):
        onehot = (idx == j).astype(jnp.float32)            # (bs,)
        colraw = jnp.sum(A * onehot[None, None, :], axis=2)  # col j: (B,bs)
        dj = jnp.sum(colraw * onehot[None, :], axis=1)       # A[j,j]: (B,)
        piv = jnp.sqrt(jnp.maximum(dj, 0.0))
        safe = jnp.where(piv > 0, piv, 1.0)
        col = colraw / safe[:, None]
        colmask = (rows >= j) & (cols == j)
        A = jnp.where(colmask[None], col[:, :, None], A)
        trail = (rows > j) & (cols > j)
        A = A - jnp.where(trail[None], col[:, :, None] * col[:, None, :], 0.0)
        return A

    L = lax.fori_loop(0, bs, body, P)
    return jnp.where((rows >= cols)[None], L, 0.0)


def _panel_inverse(L, bs):
    """M = L^{-1} for (B,bs,bs) lower-triangular L (forward subst. on I)."""
    rows = lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    idx = lax.broadcasted_iota(jnp.int32, (bs, 1), 0)[:, 0]

    def body(i, M):
        onehot = (idx == i).astype(jnp.float32)
        Lrow = jnp.sum(L * onehot[None, :, None], axis=1)   # (B,bs)
        lii = jnp.sum(Lrow * onehot[None, :], axis=1)
        kmask = (idx < i).astype(jnp.float32)
        acc = jnp.sum((Lrow * kmask[None])[:, :, None] * M, axis=1)
        row = (onehot[None] - acc) / jnp.where(lii > 0, lii, 1.0)[:, None]
        return jnp.where((rows == i)[None], row[:, None, :], M)

    return lax.fori_loop(0, bs, body, jnp.zeros_like(L))


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
        L = _panel_factor(blk[k][k], bs)
        M = _panel_inverse(L, bs)
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
