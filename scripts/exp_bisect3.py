"""Bisect the hot-chain ops that crash Mosaic."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB, d, H = 64, 128, 512
bf16 = jnp.bfloat16


def tryk(name, kern, ins, out_shape, out_dtype=jnp.float32):
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(a.shape, (lambda n: lambda: (0,) * n)(a.ndim),
                                   memory_space=pltpu.VMEM) for a in ins],
            out_specs=pl.BlockSpec(out_shape, (lambda: (0,) * len(out_shape)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(out_shape, out_dtype),
        )
        out = jax.jit(f)(*ins)
        np.asarray(out)
        print(f"{name}: OK")
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:130]}")
        return False


rng = np.random.default_rng(0)
W = jnp.asarray((rng.random((TB, H)) > 0.9) * (1 + rng.random((TB, H))), bf16)
Vh = jnp.asarray(rng.standard_normal((H, d)) * 0.1, bf16)
P = jnp.asarray(rng.standard_normal((TB, d)), jnp.float32)

# a) bf16 where/compare
def ka(w_ref, o_ref):
    Wc = w_ref[...]
    one = jnp.asarray(1.0, bf16)
    W1 = jnp.where(Wc > 0, Wc - one, jnp.asarray(0.0, bf16))
    o_ref[...] = W1.astype(jnp.float32)
tryk("a bf16 where", ka, [W], (TB, H))

# b) th = P@Vh' (contract d on both last dims)
def kb(p_ref, vh_ref, o_ref):
    dn = (((1,), (1,)), ((), ()))
    o_ref[...] = jax.lax.dot_general(p_ref[...].astype(bf16), vh_ref[...],
                                     dn, preferred_element_type=jnp.float32)
tryk("b th dot NT", kb, [P, Vh], (TB, H))

# c) full hot pair
def kc(p_ref, w_ref, vh_ref, o_ref):
    Wc = w_ref[...]
    one = jnp.asarray(1.0, bf16)
    W1 = jnp.where(Wc > 0, Wc - one, jnp.asarray(0.0, bf16))
    dn = (((1,), (1,)), ((), ()))
    th = jax.lax.dot_general(p_ref[...].astype(bf16), vh_ref[...], dn,
                             preferred_element_type=jnp.float32)
    thm = th.astype(bf16) * W1
    dn2 = (((1,), (0,)), ((), ()))
    o_ref[...] = jax.lax.dot_general(thm, vh_ref[...], dn2,
                                     preferred_element_type=jnp.float32)
tryk("c hot pair", kc, [P, W, Vh], (TB, d))

# d) hot pair with scalar g from SMEM
def kd(p_ref, w_ref, vh_ref, g_ref, o_ref):
    g = g_ref[0]
    Wc = w_ref[...]
    one = jnp.asarray(1.0, bf16)
    W1 = jnp.where(Wc > 0, Wc - one, jnp.asarray(0.0, bf16))
    ce = (Wc - W1 * g.astype(bf16)).astype(bf16)
    dn2 = (((1,), (0,)), ((), ()))
    o_ref[...] = jax.lax.dot_general(ce, vh_ref[...], dn2,
                                     preferred_element_type=jnp.float32)

try:
    f = pl.pallas_call(
        kd,
        in_specs=[pl.BlockSpec(P.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(W.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(Vh.shape, lambda: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((TB, d), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TB, d), jnp.float32),
    )
    out = jax.jit(f)(P, W, Vh, jnp.zeros((1,), jnp.float32))
    np.asarray(out)
    print("d smem-g hot rhs: OK")
except Exception as e:
    print(f"d smem-g hot rhs: FAIL {type(e).__name__} {str(e)[:130]}")
