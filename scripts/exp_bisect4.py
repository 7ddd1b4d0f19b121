"""Bisect which composition of pallas_sweep pieces crashes at H=4096."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rsparse_tpu.ops.pallas_sweep import _bmv, _bmvt

B, L, d, H = 2048, 32, 128, 4096
TB, S = 512, 32
bf16 = jnp.bfloat16

rng = np.random.default_rng(0)
Xg = jnp.asarray(rng.standard_normal((B, L, d)) * 0.1, bf16)
c = jnp.asarray(1 + rng.random((B, L)), jnp.float32)
nnz = jnp.asarray(rng.integers(0, L + 1, B), jnp.int32)[:, None]
x0 = jnp.asarray(rng.standard_normal((B, d)) * 0.1, jnp.float32)
XtX = jnp.eye(d, dtype=jnp.float32)
W = jnp.asarray((rng.random((B, H)) > 0.9) * (1 + rng.random((B, H))), bf16)
Vh = jnp.asarray(rng.standard_normal((H, d)) * 0.1, bf16)


def kernel(xtx_ref, xg_ref, c_ref, nnz_ref, x0_ref, w_ref, vh_ref,
           out_ref, *, mode):
    f32 = jnp.float32
    mdt = bf16
    XtX = xtx_ref[...].astype(f32)
    Xm = xg_ref[...]
    cc = c_ref[...].astype(f32)
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    mask = lidx < nnz_ref[...]
    cm = jnp.where(mask, cc, 0.0)
    cm1 = jnp.where(mask, cc - 1.0, 0.0)
    Vhl = vh_ref[...]
    Wc32 = w_ref[...].astype(f32)
    W1 = jnp.where(Wc32 > 0, Wc32 - 1.0, 0.0).astype(mdt)

    def hot_pair(P):
        dn = (((1,), (1,)), ((), ()))
        th = jax.lax.dot_general(P.astype(mdt), Vhl, dn,
                                 preferred_element_type=f32)
        thm = th.astype(mdt) * W1
        dn2 = (((1,), (0,)), ((), ()))
        return jax.lax.dot_general(thm, Vhl, dn2,
                                   preferred_element_type=f32)

    def matvec(P, with_hot):
        out = jax.lax.dot_general(P, XtX, (((1,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        t = _bmv(Xm, P, S, mdt) * cm1
        out = out + _bmvt(Xm, t, S, mdt)
        if with_hot:
            out = out + hot_pair(P)
        return out

    x = x0_ref[...].astype(f32)
    if mode == "rhs_hot_only":
        rhs = _bmvt(Xm, cm, S, mdt) + jax.lax.dot_general(
            Wc32.astype(mdt), Vhl, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)
        out_ref[...] = rhs
        return
    if mode == "one_matvec_hot":
        out_ref[...] = matvec(x, True)
        return
    if mode == "cg1_hot":
        rhs = _bmvt(Xm, cm, S, mdt)
        res = rhs - matvec(x, True)
        out_ref[...] = res
        return
    if mode == "cg3_nohot":
        rhs = _bmvt(Xm, cm, S, mdt)
        res = rhs - matvec(x, False)
        p, rsold = res, jnp.sum(res * res, axis=1)
        for _ in range(3):
            Ap = matvec(p, False)
            pAp = jnp.sum(p * Ap, axis=1)
            alpha = rsold / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha[:, None] * p
            res = res - alpha[:, None] * Ap
            rsnew = jnp.sum(res * res, axis=1)
            p = res + (rsnew / jnp.where(rsold == 0, 1.0, rsold))[:, None] * p
            rsold = rsnew
        out_ref[...] = x
        return
    if mode == "cg3_hot":
        rhs = _bmvt(Xm, cm, S, mdt) + hot_pair(x)
        res = rhs - matvec(x, True)
        p, rsold = res, jnp.sum(res * res, axis=1)
        for _ in range(3):
            Ap = matvec(p, True)
            pAp = jnp.sum(p * Ap, axis=1)
            alpha = rsold / jnp.where(pAp == 0, 1.0, pAp)
            x = x + alpha[:, None] * p
            res = res - alpha[:, None] * Ap
            rsnew = jnp.sum(res * res, axis=1)
            p = res + (rsnew / jnp.where(rsold == 0, 1.0, rsold))[:, None] * p
            rsold = rsnew
        out_ref[...] = x
        return


def tryit(mode):
    try:
        f = pl.pallas_call(
            partial(kernel, mode=mode),
            grid=(B // TB,),
            in_specs=[
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, L, d), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TB, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((H, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TB, d), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, d), jnp.float32),
        )
        np.asarray(jax.jit(f)(XtX, Xg, c, nnz, x0, W, Vh))
        print(f"{mode}: OK")
    except Exception as e:
        print(f"{mode}: FAIL {type(e).__name__} {str(e)[:110]}")


for m in ("rhs_hot_only", "one_matvec_hot", "cg1_hot", "cg3_nohot",
          "cg3_hot"):
    tryit(m)
