"""Pallas TPU kernel: fused Gram-form batched ALS solve (implicit feedback).

The XLA CG path (ops/als.py) materializes the gathered factor block
``Xg (B, L, d)`` in HBM and re-reads it ~6-9 times per sweep (rhs build, two
reads per CG step, loss) — after the gather itself, the sweep is
HBM-streaming-bound.  This kernel streams each ``(TB, TL, d)`` tile of the
gathered block through VMEM exactly **once**, accumulating per-entity
normal-equation Grams on the MXU:

    G1_b = Xg_b' diag(c-1) Xg_b        (lhs Gram,  weight c-1)
    Gc_b = Xg_b' diag(c)   Xg_b        (loss Gram, weight c)
    v1_b = Xg_b' c,   v2_b = Xg_b' (c-1)

and, on the final L-tile, runs the conjugate-gradient solve and the exact
reference loss entirely against the VMEM-resident Grams:

    lhs(p) = XtX p + G1_b p
    rhs    = v1 - g*v2 + rhs0
    loss_b = (1-g)^2 sum(c) - 2 (1-g) y.v1 + y' Gc y + lam ||y||^2

which equals ``sum_nnz c ((1-g) - y.x)^2 + lam ||y||^2`` — the inline loss of
``als_implicit`` (reference inst/include/wrmf_implicit.hpp:257-270) — without
a second pass over the gathered block.  Total HBM traffic per bucket drops to
one read of ``Xg`` plus O(B*d) in/out; the Gram builds are large MXU
contractions instead of VPU broadcast-reduces.

Math matches ``cg_solver_implicit`` / ``cg_solver_implicit_global_bias``
(reference inst/include/wrmf_implicit.hpp:9-60) batched over entities.
Per-entity biases fall back to the XLA path (ops/als.py).
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

__all__ = ["gram_cg_supported", "gram_cg_implicit", "gram_cg_explicit"]


def gram_cg_supported(B: int, L: int, d: int) -> bool:
    """Shapes the kernel tiles cleanly: see ``_pick_tiles``."""
    try:
        _pick_tiles(B, L, d)
        return True
    except ValueError:
        return False


def _pick_tiles(B: int, L: int, d: int) -> Tuple[int, int]:
    if d > 256:
        raise ValueError("rank too large for VMEM-resident Grams")
    if L <= 256:
        TL = L
    elif L % 128 == 0:
        TL = 128
    else:
        raise ValueError("L > 256 must be a multiple of 128")
    TB = 16 if B % 16 == 0 else 8
    if B % TB:
        raise ValueError("batch not a multiple of 8")
    return TB, TL


def _gram_kernel(xtx_ref, rhs0_ref, xg_ref, c_ref, nnz_ref, x0_ref,
                 lam_ref, g_ref, out_ref, loss_ref,
                 g1_acc, gc_acc, vec_acc,
                 *, cg_steps: int, use_rhs0: bool, TL: int):
    TB, _, d = xg_ref.shape
    nL = pl.num_programs(1)
    j = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(j == 0)
    def _():
        g1_acc[:] = jnp.zeros_like(g1_acc)
        gc_acc[:] = jnp.zeros_like(gc_acc)
        vec_acc[:] = jnp.zeros_like(vec_acc)

    # --- accumulate phase: masked weights for this L-tile ----------------
    if TL == c_ref.shape[1]:
        c = c_ref[:].astype(f32)                            # (TB, TL)
    else:
        c = c_ref[:, pl.ds(pl.multiple_of(j * TL, 128), TL)].astype(f32)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, TL), 1) + j * TL
    mask = lidx < nnz_ref[:]
    cm = jnp.where(mask, c, 0.0)
    cm1 = jnp.where(mask, c - 1.0, 0.0)

    Xg = xg_ref[:]                                          # (TB, TL, d)
    Xf = Xg.astype(f32)
    W1 = (Xf * cm1[..., None]).astype(Xg.dtype)
    Wc = (Xf * cm[..., None]).astype(Xg.dtype)
    dn = (((1,), (1,)), ((0,), (0,)))                       # batch 0, contract TL
    g1_acc[:] += jax.lax.dot_general(W1, Xg, dn, preferred_element_type=f32)
    gc_acc[:] += jax.lax.dot_general(Wc, Xg, dn, preferred_element_type=f32)
    # vec_acc rows: [v1 | v2 | sum_c broadcast]   (3, TB, d)
    vec_acc[0] += jnp.sum(Xf * cm[..., None], axis=1)
    vec_acc[1] += jnp.sum(Xf * cm1[..., None], axis=1)
    vec_acc[2] += jnp.broadcast_to(
        jnp.sum(cm, axis=1, keepdims=True), (TB, d))

    # --- solve phase on the final L-tile ---------------------------------
    @pl.when(j == nL - 1)
    def _():
        g = g_ref[0, 0]
        lam = lam_ref[0, 0]
        XtX = xtx_ref[:].astype(f32)                        # (d, d)
        A = XtX[None] + g1_acc[:]                           # (TB, d, d)
        v1 = vec_acc[0]
        rhs = v1 - g * vec_acc[1]
        if use_rhs0:
            rhs = rhs + rhs0_ref[:].astype(f32)

        def a_dot(p):
            return jnp.sum(A * p[:, None, :], axis=2)

        x = x0_ref[:].astype(f32)
        res = rhs - a_dot(x)
        p = res
        rsold = jnp.sum(res * res, axis=1)
        for _ in range(cg_steps):
            live = rsold >= CG_TOL
            Ap = a_dot(p)
            pAp = jnp.sum(p * Ap, axis=1)
            alpha = jnp.where(live,
                              rsold / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha[:, None] * p
            res = res - alpha[:, None] * Ap
            rsnew = jnp.sum(res * res, axis=1)
            beta = jnp.where(live,
                             rsnew / jnp.where(rsold == 0, 1.0, rsold), 0.0)
            p = res + beta[:, None] * p
            rsold = jnp.where(live, rsnew, rsold)

        out_ref[:] = x.astype(out_ref.dtype)
        # loss identity: sum c*(base0 - y.x)^2 = base0^2 sum(c)
        #   - 2*base0*(y.v1) + y' Gc y,  base0 = 1 - g
        base0 = 1.0 - g
        sum_c = vec_acc[2][:, 0]
        yGy = jnp.sum(jnp.sum(gc_acc[:] * x[:, None, :], axis=2) * x, axis=1)
        le = (base0 * base0 * sum_c - 2.0 * base0 * jnp.sum(x * v1, axis=1)
              + yGy + lam * jnp.sum(x * x, axis=1))
        loss_ref[:] = le[:, None]


@partial(jax.jit, static_argnames=("cg_steps",))
def gram_cg_implicit(
    XtX: jax.Array,                  # (d, d) f32, incl. lambda ridge
    rhs_init: Optional[jax.Array],   # (d,) or None
    Xg: jax.Array,                   # (B, L, d) gathered source factors
    c: jax.Array,                    # (B, L) confidences
    nnz: jax.Array,                  # (B,) int32
    x0: jax.Array,                   # (B, d) warm start
    lam: jax.Array,
    g: jax.Array,
    cg_steps: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """Single-HBM-pass batched Gram-CG solve + loss for one bucket.

    Returns (x (B, d) float32, per-entity loss (B,) float32).
    """
    B, L, d = Xg.shape
    TB, TL = _pick_tiles(B, L, d)
    use_rhs0 = rhs_init is not None
    rhs0 = (jnp.zeros((1, d), jnp.float32) if rhs_init is None
            else rhs_init.astype(jnp.float32)[None, :])

    grid = (B // TB, L // TL)
    kernel = partial(_gram_kernel, cg_steps=cg_steps, use_rhs0=use_rhs0,
                     TL=TL)
    out, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # XtX
            pl.BlockSpec((1, d), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),           # rhs0
            pl.BlockSpec((TB, TL, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # Xg
            pl.BlockSpec((TB, L), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # c (full row)
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # nnz
            pl.BlockSpec((TB, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # x0
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),           # lam
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),           # g
        ],
        out_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, d, d), jnp.float32),             # G1
            pltpu.VMEM((TB, d, d), jnp.float32),             # Gc
            pltpu.VMEM((3, TB, d), jnp.float32),             # v1/v2/sum_c
        ],
    )(XtX.astype(jnp.float32), rhs0, Xg, c,
      nnz.astype(jnp.int32)[:, None], x0.astype(jnp.float32),
      jnp.asarray(lam, jnp.float32).reshape(1, 1),
      jnp.asarray(g, jnp.float32).reshape(1, 1))
    return out, loss[:, 0]


def _gram_explicit_kernel(xg_ref, c_ref, nnz_ref, x0_ref, lam_ref,
                          out_ref, loss_ref, g0_acc, vec_acc,
                          *, cg_steps: int, dynamic_lambda: bool, TL: int):
    """Explicit-feedback variant: lhs = Xg' Xg + lam_use I, rhs = Xg' r.

    Math of ``als_explicit`` / ``cg_solver_explicit`` (reference
    inst/include/wrmf_explicit.hpp:9-31,66-132); ``lam_use = lam * nnz``
    when dynamic (wrmf_explicit.hpp:78)."""
    TB, _, d = xg_ref.shape
    nL = pl.num_programs(1)
    j = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(j == 0)
    def _():
        g0_acc[:] = jnp.zeros_like(g0_acc)
        vec_acc[:] = jnp.zeros_like(vec_acc)

    if TL == c_ref.shape[1]:
        c = c_ref[:].astype(f32)
    else:
        c = c_ref[:, pl.ds(pl.multiple_of(j * TL, 128), TL)].astype(f32)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, TL), 1) + j * TL
    mask = (lidx < nnz_ref[:]).astype(f32)
    conf = c * mask

    Xg = xg_ref[:]
    Xf = Xg.astype(f32)
    Xm = (Xf * mask[..., None]).astype(Xg.dtype)
    dn = (((1,), (1,)), ((0,), (0,)))
    g0_acc[:] += jax.lax.dot_general(Xm, Xm, dn, preferred_element_type=f32)
    # vec rows: [rhs = Xg' conf | sum conf^2 broadcast]
    vec_acc[0] += jnp.sum(Xf * conf[..., None], axis=1)
    vec_acc[1] += jnp.broadcast_to(
        jnp.sum(conf * conf, axis=1, keepdims=True), (TB, d))

    @pl.when(j == nL - 1)
    def _():
        lam = lam_ref[0, 0]
        nnzf = nnz_ref[:].astype(f32)                      # (TB, 1)
        if dynamic_lambda:
            lam_use = lam * nnzf[:, 0]
        else:
            lam_use = jnp.full((TB,), lam, f32)
        eye = (jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
               == jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)).astype(f32)
        A = g0_acc[:] + lam_use[:, None, None] * eye[None]
        rhs = vec_acc[0]

        def a_dot(p):
            return jnp.sum(A * p[:, None, :], axis=2)

        x = x0_ref[:].astype(f32)
        res = rhs - a_dot(x)
        p = res
        rsold = jnp.sum(res * res, axis=1)
        for _ in range(cg_steps):
            live = rsold >= CG_TOL
            Ap = a_dot(p)
            pAp = jnp.sum(p * Ap, axis=1)
            alpha = jnp.where(live,
                              rsold / jnp.where(pAp == 0, 1.0, pAp), 0.0)
            x = x + alpha[:, None] * p
            res = res - alpha[:, None] * Ap
            rsnew = jnp.sum(res * res, axis=1)
            beta = jnp.where(live,
                             rsnew / jnp.where(rsold == 0, 1.0, rsold), 0.0)
            p = res + beta[:, None] * p
            rsold = jnp.where(live, rsnew, rsold)

        out_ref[:] = x.astype(out_ref.dtype)
        # loss identity: sum (conf - y.x)^2 = sum conf^2 - 2 y.rhs + y'G0 y
        yGy = jnp.sum(jnp.sum(g0_acc[:] * x[:, None, :], axis=2) * x, axis=1)
        le = (vec_acc[1][:, 0] - 2.0 * jnp.sum(x * rhs, axis=1) + yGy
              + lam_use * jnp.sum(x * x, axis=1))
        loss_ref[:] = le[:, None]


@partial(jax.jit, static_argnames=("cg_steps", "dynamic_lambda"))
def gram_cg_explicit(
    Xg: jax.Array,                   # (B, L, d) gathered source factors
    conf: jax.Array,                 # (B, L) ratings
    nnz: jax.Array,                  # (B,) int32
    x0: jax.Array,                   # (B, d) warm start
    lam: jax.Array,
    cg_steps: int = 3,
    dynamic_lambda: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single-HBM-pass batched explicit-feedback Gram-CG solve + loss."""
    B, L, d = Xg.shape
    TB, TL = _pick_tiles(B, L, d)
    grid = (B // TB, L // TL)
    kernel = partial(_gram_explicit_kernel, cg_steps=cg_steps,
                     dynamic_lambda=dynamic_lambda, TL=TL)
    out, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TL, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # Xg
            pl.BlockSpec((TB, L), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # conf (full row)
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # nnz
            pl.BlockSpec((TB, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),           # x0
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),           # lam
        ],
        out_specs=[
            pl.BlockSpec((TB, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, d, d), jnp.float32),             # G0
            pltpu.VMEM((2, TB, d), jnp.float32),             # rhs / sum c^2
        ],
    )(Xg, conf, nnz.astype(jnp.int32)[:, None], x0.astype(jnp.float32),
      jnp.asarray(lam, jnp.float32).reshape(1, 1))
    return out, loss[:, 0]
