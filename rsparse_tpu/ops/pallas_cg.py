"""Pallas TPU kernel: fused single-pass batched implicit-ALS CG solve.

The XLA path (ops/als.py CG) materializes the gathered factor block
``Xg (B, L, r)`` in HBM and re-reads it ~9 times per sweep (rhs, residual
init, 2 reads per CG step, loss) — the sweep is HBM-bound.  This kernel
loads each ``(TB, L, r)`` tile into VMEM **once** and runs the complete
conjugate-gradient solve (rhs build, residual, ``cg_steps`` iterations with
per-entity freeze, loss) against the resident tile, cutting the solve phase
to a single HBM pass over the gathered factors.

Math matches ``cg_solver_implicit`` (reference
inst/include/wrmf_implicit.hpp:9-32) batched over entities:

  lhs(p) = XtX p + Xg' diag(c-1) Xg p,   rhs = Xg' (c - (c-1)*g) + rhs0

The per-entity matvecs are VPU broadcast-multiply-reduce ops over the
resident (TB, L, r) tile; tiles are kept small (TB*L <= 2048) because each
live f32 temporary costs TB*L*r*4 bytes of scoped VMEM.  Buckets whose row
length L exceeds :func:`fused_cg_supported` fall back to the XLA path.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .solvers import CG_TOL

#: max rows-times-length per tile (bf16 tile = 2*r bytes per element)
_TILE_ELEMS = 2048
_MIN_TB = 8


def fused_cg_supported(L: int, r: int) -> bool:
    """True when the minimum (8-row) tile fits the VMEM budget."""
    return _MIN_TB * L <= _TILE_ELEMS and r <= 256


def _pick_tile(B: int, L: int) -> int:
    tb = max(_TILE_ELEMS // max(L, 1), _MIN_TB)
    tb = 1 << int(np.log2(tb))
    while B % tb and tb > _MIN_TB:
        tb //= 2
    return max(min(tb, B), _MIN_TB)


def _cg_kernel(xtx_ref, rhs0_ref, xg_ref, c_ref, nnz_ref, x0_ref, lam_ref,
               g_ref, out_ref, loss_ref, *, cg_steps: int, use_rhs0: bool):
    TB, L, r = xg_ref.shape
    acc = jnp.float32

    Xg = xg_ref[:].astype(acc)                      # (TB, L, r)
    c = c_ref[:].astype(acc)                        # (TB, L)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    mask = lidx < nnz_ref[:]                        # (TB, L)
    cm = jnp.where(mask, c, 0.0)
    cm1 = jnp.where(mask, c - 1.0, 0.0)
    g = g_ref[0, 0]
    lam = lam_ref[0, 0]
    XtX = xtx_ref[:].astype(acc)                    # (r, r)

    def xg_vec(v):
        # (TB, L)
        return jnp.sum(Xg * v[:, None, :], axis=2)

    def vec_xg(w):
        # (TB, r)
        return jnp.sum(Xg * w[:, :, None], axis=1)

    def a_dot(p):
        t = xg_vec(p) * cm1
        return p @ XtX + vec_xg(t)

    c_eff = cm - cm1 * g
    rhs = vec_xg(c_eff)                              # (TB, r)
    if use_rhs0:
        rhs = rhs + rhs0_ref[:].astype(acc)

    x = x0_ref[:].astype(acc)
    res = rhs - a_dot(x)
    p = res
    rsold = jnp.sum(res * res, axis=1)               # (TB,)

    for _ in range(cg_steps):
        live = rsold >= CG_TOL
        Ap = a_dot(p)
        pAp = jnp.sum(p * Ap, axis=1)
        alpha = jnp.where(live, rsold / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[:, None] * p
        res = res - alpha[:, None] * Ap
        rsnew = jnp.sum(res * res, axis=1)
        beta = jnp.where(live,
                         rsnew / jnp.where(rsold == 0, 1.0, rsold), 0.0)
        p = res + beta[:, None] * p
        rsold = jnp.where(live, rsnew, rsold)

    out_ref[:] = x.astype(out_ref.dtype)
    # loss with the new factors (wrmf_implicit.hpp:257-264)
    pred = xg_vec(x)
    base = (1.0 - g) - pred
    le = jnp.sum(cm * base * base, axis=1) + lam * jnp.sum(x * x, axis=1)
    loss_ref[:] = le[:, None]


@partial(jax.jit, static_argnames=("cg_steps",))
def fused_cg_implicit(
    XtX: jax.Array,            # (r, r) f32, incl. lambda ridge
    rhs_init: Optional[jax.Array],  # (r,) or None
    Xg: jax.Array,             # (B, L, r) gathered source factors (bf16/f32)
    c: jax.Array,              # (B, L) confidences
    nnz: jax.Array,            # (B,) int32
    x0: jax.Array,             # (B, r) warm start
    lam: jax.Array,
    g: jax.Array,
    cg_steps: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Single-pass batched CG solve + loss for one bucket.

    Returns (x (B, r) float32, per-entity loss (B,) float32).
    """
    B, L, r = Xg.shape
    TB = _pick_tile(B, L)
    if B % TB:
        raise ValueError(f"batch {B} not divisible by tile {TB}")
    use_rhs0 = rhs_init is not None
    rhs0 = (jnp.zeros((1, r), jnp.float32) if rhs_init is None
            else rhs_init.astype(jnp.float32)[None, :])

    grid = (B // TB,)
    kernel = partial(_cg_kernel, cg_steps=cg_steps, use_rhs0=use_rhs0)
    out, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # XtX
            pl.BlockSpec((1, r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),          # rhs0
            pl.BlockSpec((TB, L, r), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),          # Xg
            pl.BlockSpec((TB, L), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # c
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # nnz
            pl.BlockSpec((TB, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),          # x0
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # lam
            pl.BlockSpec((1, 1), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),          # g
        ],
        out_specs=[
            pl.BlockSpec((TB, r), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, r), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
    )(XtX.astype(jnp.float32), rhs0, Xg, c,
      nnz.astype(jnp.int32)[:, None], x0.astype(jnp.float32),
      jnp.asarray(lam, jnp.float32).reshape(1, 1),
      jnp.asarray(g, jnp.float32).reshape(1, 1))
    return out, loss[:, 0]
