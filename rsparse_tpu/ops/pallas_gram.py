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


def gram_cg_supported(B: int, L: int, d: int, itemsize: int = 4) -> bool:
    """Shapes the kernel tiles cleanly: see ``_pick_tiles``."""
    try:
        _pick_tiles(B, L, d, itemsize)
        return True
    except ValueError:
        return False


#: total VMEM budget for scratch + blocks + live vector temporaries
_VMEM_BUDGET = 13 << 20


def _vmem_cost(TB: int, TL: int, d: int, itemsize: int) -> int:
    """Estimated scoped-VMEM bytes: 2 f32 Gram scratch accumulators,
    double-buffered Xg input block, ~3 tile-sized f32/bf16 live temporaries
    in the accumulate phase (Xf, W1, Wc), and 2 (TB, d, d) f32 temporaries
    in the solve phase (A, the yGy broadcast)."""
    gram = 2 * TB * d * d * 4 + 2 * TB * d * d * 4   # scratch + A/yGy temps
    tile = TB * TL * d * itemsize * 2                # double-buffered input
    temps = TB * TL * d * (4 + 2 + 2)                # Xf f32 + 2 bf16 copies
    return gram + tile + temps


def _pick_tiles(B: int, L: int, d: int, itemsize: int = 4) -> Tuple[int, int]:
    if d > 256:
        raise ValueError("rank too large for VMEM-resident Grams")
    if B % 8:
        raise ValueError("batch not a multiple of 8")
    best = None
    for TB in (64, 32, 16, 8):
        if B % TB or _vmem_cost(TB, 8, d, itemsize) > _VMEM_BUDGET:
            continue
        max_tl = 8
        while (max_tl < 512 and max_tl < L
               and _vmem_cost(TB, max_tl + 8, d, itemsize) <= _VMEM_BUDGET):
            max_tl += 8
        if L <= max_tl:
            tl = L
        else:
            tl = 0
            for nl in range(-(-L // max_tl), L // 8 + 1):
                if L % nl == 0 and (L // nl) % 8 == 0:
                    tl = L // nl
                    break
            if not tl:
                continue
        if best is None or TB * tl > best[0] * best[1]:
            best = (TB, tl)
    if best is None:
        raise ValueError("no feasible (TB, TL) tiling")
    return best


def _gram_kernel(xtx_ref, rhs0_ref, xg_ref, c_ref, nnz_ref, x0_ref,
                 lam_ref, g_ref, out_ref, loss_ref,
                 g_acc, vec_acc,
                 *, cg_steps: int, use_rhs0: bool, TL: int, mxu_bf16: bool):
    TB, _, d = xg_ref.shape
    nL = pl.num_programs(1)
    j = pl.program_id(1)
    f32 = jnp.float32

    @pl.when(j == 0)
    def _():
        g_acc[:] = jnp.zeros_like(g_acc)
        vec_acc[:] = jnp.zeros_like(vec_acc)

    # --- accumulate phase: masked weights for this L-tile ----------------
    c = c_ref[0].astype(f32)                                # (TB, TL)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, TL), 1) + j * TL
    mask = lidx < nnz_ref[:]
    cm = jnp.where(mask, c, 0.0)
    cm1 = jnp.where(mask, c - 1.0, 0.0)

    Xf = xg_ref[:].astype(f32)                              # (TB, TL, d)
    # MXU operands in bf16 when requested: the f32 HBM gather is ~2x the
    # row rate of a bf16 one (gather is row-fetch-bound), so the cast
    # belongs HERE, after the gather, where XLA cannot commute it back
    # onto the source table.
    mdt = jnp.bfloat16 if mxu_bf16 else xg_ref.dtype
    Xm = Xf.astype(mdt)
    # both Grams in ONE dot per entity: [W1 | Wc]' X -> [G1; Gc] (2d, d)
    # (per-entity matmuls serialize on the MXU; dispatch count matters)
    Ws = jnp.concatenate([(Xf * cm1[..., None]).astype(mdt),
                          (Xf * cm[..., None]).astype(mdt)], axis=2)
    dn = (((1,), (1,)), ((0,), (0,)))                       # batch 0, contract TL
    g_acc[:] += jax.lax.dot_general(Ws, Xm, dn, preferred_element_type=f32)
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
        A = XtX[None] + g_acc[:, :d, :]                     # (TB, d, d)
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
        yGy = jnp.sum(jnp.sum(g_acc[:, d:, :] * x[:, None, :], axis=2) * x,
                      axis=1)
        le = (base0 * base0 * sum_c - 2.0 * base0 * jnp.sum(x * v1, axis=1)
              + yGy + lam * jnp.sum(x * x, axis=1))
        loss_ref[:] = le[:, None]


@partial(jax.jit, static_argnames=("cg_steps", "mxu_bf16"))
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
    mxu_bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single-HBM-pass batched Gram-CG solve + loss for one bucket.

    Returns (x (B, d) float32, per-entity loss (B,) float32).
    """
    B, L, d = Xg.shape
    TB, TL = _pick_tiles(B, L, d, Xg.dtype.itemsize)
    use_rhs0 = rhs_init is not None
    rhs0 = (jnp.zeros((1, d), jnp.float32) if rhs_init is None
            else rhs_init.astype(jnp.float32)[None, :])

    grid = (B // TB, L // TL)
    # c as (nL, B, TL) so each (1, TB, TL) block is lane-aligned for any TL
    c = jnp.moveaxis(c.reshape(B, L // TL, TL), 1, 0)
    kernel = partial(_gram_kernel, cg_steps=cg_steps, use_rhs0=use_rhs0,
                     TL=TL, mxu_bf16=mxu_bf16)
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
            pl.BlockSpec((1, TB, TL), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),           # c tile
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
            pltpu.VMEM((TB, 2 * d, d), jnp.float32),         # [G1; Gc]
            pltpu.VMEM((3, TB, d), jnp.float32),             # v1/v2/sum_c
        ],
    )(XtX.astype(jnp.float32), rhs0, Xg, c,
      nnz.astype(jnp.int32)[:, None], x0.astype(jnp.float32),
      jnp.asarray(lam, jnp.float32).reshape(1, 1),
      jnp.asarray(g, jnp.float32).reshape(1, 1))
    return out, loss[:, 0]


def _gram_explicit_kernel(xg_ref, c_ref, nnz_ref, x0_ref, lam_ref,
                          out_ref, loss_ref, g0_acc, vec_acc,
                          *, cg_steps: int, dynamic_lambda: bool, TL: int,
                          mxu_bf16: bool):
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

    c = c_ref[0].astype(f32)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, TL), 1) + j * TL
    mask = (lidx < nnz_ref[:]).astype(f32)
    conf = c * mask

    Xf = xg_ref[:].astype(f32)
    mdt = jnp.bfloat16 if mxu_bf16 else xg_ref.dtype
    Xm = (Xf * mask[..., None]).astype(mdt)
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


@partial(jax.jit, static_argnames=("cg_steps", "dynamic_lambda", "mxu_bf16"))
def gram_cg_explicit(
    Xg: jax.Array,                   # (B, L, d) gathered source factors
    conf: jax.Array,                 # (B, L) ratings
    nnz: jax.Array,                  # (B,) int32
    x0: jax.Array,                   # (B, d) warm start
    lam: jax.Array,
    cg_steps: int = 3,
    dynamic_lambda: bool = False,
    mxu_bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Single-HBM-pass batched explicit-feedback Gram-CG solve + loss."""
    B, L, d = Xg.shape
    TB, TL = _pick_tiles(B, L, d, Xg.dtype.itemsize)
    grid = (B // TB, L // TL)
    conf = jnp.moveaxis(conf.reshape(B, L // TL, TL), 1, 0)
    kernel = partial(_gram_explicit_kernel, cg_steps=cg_steps,
                     dynamic_lambda=dynamic_lambda, TL=TL,
                     mxu_bf16=mxu_bf16)
    out, loss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, TL, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),           # Xg
            pl.BlockSpec((1, TB, TL), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),           # conf tile
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
