"""Pallas TPU kernel: fully-fused WRMF implicit-feedback bucket solve.

One kernel call performs the ENTIRE per-bucket ALS solve (rhs build, warm
3-step conjugate gradient, exact reference loss) with the gathered factor
block ``Xg (TB, L, d)`` resident in VMEM, read from HBM exactly once.  The
XLA path (ops/als.py) re-streams ``Xg`` ~8 times (rhs, 2 reads per CG step,
loss) and — with the dense zipf-head split — round-trips a ``(B, H)``
intermediate per CG step; both are HBM-bandwidth costs this kernel removes.

Math identical to ``_solve_bucket_implicit`` (ops/als.py), i.e. the batched
form of ``als_implicit`` / ``cg_solver_implicit[_global_bias]`` (reference
inst/include/wrmf_implicit.hpp:9-60,91-270):

    A p    = XtX p + Xg' diag(c-1) Xg p  [+ Vh' diag(W-1) Vh p]
    rhs    = Xg' (c - (c-1) g) + rhs0    [+ Vh' (Wc - (Wc-1) g)]
    loss_b = sum_nnz c ((1-g) - y.x)^2 + lam ||y||^2 [+ hot part]

Two kernel-design points (why this wins where ops/pallas_cg.py lost):

* the batched per-entity mat-vecs ``t_b = Xg_b p_b`` / ``Xg_b' t_b`` run as
  **block-diagonal MXU matmuls**: S entities are stacked into one
  ``(S*L, d) @ (d, S)`` product and the block-diagonal is masked out.  The
  S-fold FLOP waste is free next to the MXU's rate; the VPU
  broadcast-plus-lane-reduce formulation this replaces was the old fused
  kernel's bottleneck.
* the dense zipf-head terms (sparse/device.py ``HotBlock``) are computed
  in-kernel as plain ``(TB, H)`` MXU tiles, so the W-row block is read once
  per sweep instead of once per CG pass, and the ``th`` intermediate never
  touches HBM.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .solvers import CG_TOL

__all__ = ["fused_implicit_supported", "fused_implicit_solve"]

#: VMEM budget for the resident Xg block (double-buffered by the pipeline)
_XG_BYTES = 8 << 20
#: block-diagonal stacking factor (FLOP waste factor of the batched matvec)
_S = 32


def _pick_tb(L: int, d: int, itemsize: int, H: int) -> int:
    """TB from the VMEM budget alone (the batch is padded up to a TB
    multiple by the caller).  Multiples of ``_S`` so sub-groups tile TB."""
    cap = max(_XG_BYTES // max(L * d * itemsize, 1), 8)
    if H:
        cap = min(cap, (4 << 20) // (H * 4) * 8 or 8)
    cap = min(cap, 512)
    return max((cap // _S) * _S, 8)


def _pick_s(TB: int) -> int:
    """Largest sub-group size dividing TB (block-diagonal stack height)."""
    return max(s for s in range(8, min(_S, TB) + 1, 8) if TB % s == 0)


def fused_implicit_supported(B: int, L: int, d: int, itemsize: int = 2,
                             H: int = 0) -> bool:
    return not (d % 8 or L % 8 or B % 8 or d > 512 or (H and H % 128))


def _bmv(Xm, P, S: int, mdt):
    """Batched mat-vec ``t[b] = Xm[b] @ P[b]`` via block-diagonal MXU
    matmuls.  Xm: (TB, L, d) mdt, P: (TB, d) f32 -> (TB, L) f32."""
    TB, L, d = Xm.shape
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (S, L, S), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (S, L, S), 2))
    outs = []
    for s0 in range(0, TB, S):
        Xs = Xm[s0:s0 + S].reshape(S * L, d)              # collapse-leading
        Ps = P[s0:s0 + S].astype(mdt)                     # (S, d)
        dn = (((1,), (1,)), ((), ()))                     # contract d
        prod = jax.lax.dot_general(Xs, Ps, dn,
                                   preferred_element_type=jnp.float32)
        prod = prod.reshape(S, L, S)                      # unflatten-leading
        outs.append(jnp.sum(jnp.where(eye3, prod, 0.0), axis=2))
    return jnp.concatenate(outs, axis=0)                  # (TB, L)


def _bmvt(Xm, tw, S: int, mdt):
    """Batched transposed mat-vec ``out[b] = Xm[b]' @ tw[b]`` via
    block-diagonal MXU matmuls.  tw: (TB, L) f32 -> (TB, d) f32."""
    TB, L, d = Xm.shape
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (S, L, S), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (S, L, S), 2))
    outs = []
    for s0 in range(0, TB, S):
        Xs = Xm[s0:s0 + S].reshape(S * L, d)              # collapse-leading
        T3 = jnp.where(eye3, tw[s0:s0 + S][:, :, None], 0.0)
        T = T3.reshape(S * L, S).astype(mdt)              # collapse-leading
        dn = (((0,), (0,)), ((), ()))                     # contract S*L
        outs.append(jax.lax.dot_general(T, Xs, dn,
                                        preferred_element_type=jnp.float32))
    return jnp.concatenate(outs, axis=0)                  # (TB, d)


def _kernel(xtx_ref, rhs0_ref, xg_ref, c_ref, nnz_ref, x0_ref,
            lam_ref, g_ref, *rest,
            cg_steps: int, use_rhs0: bool, has_hot: bool, S: int,
            mxu_bf16: bool):
    if has_hot:
        w_ref, vh_ref, out_ref, loss_ref = rest
    else:
        out_ref, loss_ref = rest
    f32 = jnp.float32
    TB, L, d = xg_ref.shape
    mdt = jnp.bfloat16 if mxu_bf16 else xg_ref.dtype

    g = g_ref[0]
    lam = lam_ref[0]
    XtX = xtx_ref[...].astype(f32)                        # (d, d)
    Xm = xg_ref[...].astype(mdt)
    c = c_ref[...].astype(f32)                            # (TB, L)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    mask = lidx < nnz_ref[...]
    cm = jnp.where(mask, c, 0.0)
    cm1 = jnp.where(mask, c - 1.0, 0.0)

    if has_hot:
        Vh = vh_ref[...].astype(mdt)                      # (H, d)
        # compare/select in f32: bf16 compare+select crashes the Mosaic
        # backend on v5e (scripts/exp_bisect3.py)
        Wc32 = w_ref[...].astype(f32)                     # (TB, H)
        Wc = Wc32.astype(mdt)
        W1 = jnp.where(Wc32 > 0, Wc32 - 1.0, 0.0).astype(mdt)

    def hot_pair(P):
        """Vh' diag(W1) Vh P — matches the XLA chain dtype-for-dtype."""
        dn = (((1,), (1,)), ((), ()))
        th = jax.lax.dot_general(P.astype(mdt), Vh, dn,
                                 preferred_element_type=f32)
        thm = th.astype(mdt) * W1                         # (TB, H) mdt
        dn2 = (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(thm, Vh, dn2,
                                   preferred_element_type=f32)

    def matvec(P):
        out = jax.lax.dot_general(P, XtX, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        t = _bmv(Xm, P, S, mdt) * cm1
        out = out + _bmvt(Xm, t, S, mdt)
        if has_hot:
            out = out + hot_pair(P)
        return out

    # rhs = Xg'(cm - cm1*g) + rhs0  [+ Vh'(Wc - W1*g)]
    c_eff = cm - cm1 * g
    rhs = _bmvt(Xm, c_eff, S, mdt)
    if use_rhs0:
        rhs = rhs + rhs0_ref[...].astype(f32)
    if has_hot:
        ce_hot = (Wc32 - W1.astype(f32) * g).astype(mdt)
        dn2 = (((1,), (0,)), ((), ()))
        rhs = rhs + jax.lax.dot_general(ce_hot, Vh, dn2,
                                        preferred_element_type=f32)

    # conjugate gradient, lockstep with per-entity freeze (solvers.batched_cg)
    x = x0_ref[...].astype(f32)
    res = rhs - matvec(x)
    p = res
    rsold = jnp.sum(res * res, axis=1)
    for _ in range(cg_steps):
        live = rsold >= CG_TOL
        Ap = matvec(p)
        pAp = jnp.sum(p * Ap, axis=1)
        alpha = jnp.where(live, rsold / jnp.where(pAp == 0, 1.0, pAp), 0.0)
        x = x + alpha[:, None] * p
        res = res - alpha[:, None] * Ap
        rsnew = jnp.sum(res * res, axis=1)
        beta = jnp.where(live, rsnew / jnp.where(rsold == 0, 1.0, rsold), 0.0)
        p = res + beta[:, None] * p
        rsold = jnp.where(live, rsnew, rsold)

    out_ref[...] = x.astype(out_ref.dtype)

    # loss: sum_nnz c ((1-g) - y.x)^2 + lam ||y||^2  [+ hot part]
    base0 = 1.0 - g
    pred = _bmv(Xm, x, S, mdt)
    base = base0 - pred
    le = jnp.sum(cm * base * base, axis=1) + lam * jnp.sum(x * x, axis=1)
    if has_hot:
        dn = (((1,), (1,)), ((), ()))
        pred_h = jax.lax.dot_general(x.astype(mdt), Vh, dn,
                                     preferred_element_type=f32)
        base_h = base0 - pred_h
        le = le + jnp.sum(Wc.astype(f32) * base_h * base_h, axis=1)
    loss_ref[...] = le[:, None]


@partial(jax.jit, static_argnames=("cg_steps", "mxu_bf16"))
def fused_implicit_solve(
    XtX: jax.Array,                    # (d, d) f32, incl. lambda ridge
    rhs_init: Optional[jax.Array],     # (d,) or None
    Xg: jax.Array,                     # (B, L, d) gathered source factors
    c: jax.Array,                      # (B, L) confidences
    nnz: jax.Array,                    # (B,) int32
    x0: jax.Array,                     # (B, d) warm start
    lam: jax.Array,
    g: jax.Array,
    W: Optional[jax.Array] = None,     # (B, H) dense hot confidences
    Vh: Optional[jax.Array] = None,    # (H, d) hot source factors
    cg_steps: int = 3,
    mxu_bf16: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Fully-fused implicit-feedback bucket solve.

    Returns (y (B, d) f32, per-entity loss (B,) f32).
    """
    B0, L, d = Xg.shape
    has_hot = W is not None
    H = W.shape[1] if has_hot else 0
    TB = _pick_tb(L, d, Xg.dtype.itemsize, H)
    S = _pick_s(TB)
    # pad the batch to a TB multiple: padding rows have nnz=0 (and W=0) so
    # their solves are cheap garbage discarded by the slice below
    B = -(-B0 // TB) * TB
    if B != B0:
        pad = B - B0
        Xg = jnp.concatenate(
            [Xg, jnp.zeros((pad, L, d), Xg.dtype)], axis=0)
        c = jnp.concatenate([c, jnp.zeros((pad, L), c.dtype)], axis=0)
        nnz = jnp.concatenate([nnz, jnp.zeros((pad,), nnz.dtype)], axis=0)
        x0 = jnp.concatenate([x0, jnp.zeros((pad, d), x0.dtype)], axis=0)
        if has_hot:
            W = jnp.concatenate([W, jnp.zeros((pad, H), W.dtype)], axis=0)
    use_rhs0 = rhs_init is not None
    rhs0 = (jnp.zeros((1, d), jnp.float32) if rhs_init is None
            else rhs_init.astype(jnp.float32)[None, :])

    kernel = partial(_kernel, cg_steps=cg_steps, use_rhs0=use_rhs0,
                     has_hot=has_hot, S=S, mxu_bf16=mxu_bf16)
    in_specs = [
        pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, L, d), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((TB, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),            # lam (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),            # g   (1,)
    ]
    args = [XtX.astype(jnp.float32), rhs0, Xg, c.astype(jnp.float32),
            nnz.astype(jnp.int32)[:, None], x0.astype(jnp.float32),
            jnp.asarray(lam, jnp.float32).reshape(1),
            jnp.asarray(g, jnp.float32).reshape(1)]
    if has_hot:
        in_specs += [
            pl.BlockSpec((TB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
        args += [W, Vh]
    out, loss = pl.pallas_call(
        kernel,
        grid=(B // TB,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TB, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, d), jnp.float32),
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
        ],
        # v5e has 128 MB VMEM; Mosaic's default limit rejects the
        # double-buffered Xg + (TB, H) hot blocks (the axon remote-compile
        # helper surfaces the rejection as an opaque crash)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
    )(*args)
    return out[:B0], loss[:B0, 0]
