"""Bisect which op crashes the Mosaic backend (pallas_sweep kernel)."""
import sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, L, d, TB = 32, 32, 128, 64


def try_kernel(name, kern, shapes_in, shapes_out):
    try:
        f = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(s, (lambda n: lambda: (0,) * n)(len(s)),
                                   memory_space=pltpu.VMEM)
                      for s in shapes_in],
            out_specs=pl.BlockSpec(shapes_out, (lambda: (0,) * len(shapes_out)),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shapes_out, jnp.float32),
        )
        args = [jnp.asarray(np.random.default_rng(0).standard_normal(s),
                            jnp.float32) for s in shapes_in]
        out = jax.jit(f)(*args)
        np.asarray(out)
        print(f"{name}: OK")
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__} {str(e)[:120]}")


# 1. collapse-leading reshape + dot contract-d
def k1(x_ref, p_ref, o_ref):
    Xs = x_ref[...].reshape(S * L, d)
    dn = (((1,), (1,)), ((), ()))
    prod = jax.lax.dot_general(Xs, p_ref[...], dn,
                               preferred_element_type=jnp.float32)
    o_ref[...] = prod.reshape(S, L, S).sum(axis=2, keepdims=False)[..., None]

try_kernel("bmv core (reshape+dot+unflatten)", k1,
           [(S, L, d), (S, d)], (S, L, 1))


# 2. eye3 mask + where + collapse + dot contract-axis0
def k2(x_ref, t_ref, o_ref):
    eye3 = (jax.lax.broadcasted_iota(jnp.int32, (S, L, S), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (S, L, S), 2))
    Xs = x_ref[...].reshape(S * L, d)
    T3 = jnp.where(eye3, t_ref[...][:, :, None], 0.0)
    T = T3.reshape(S * L, S)
    dn = (((0,), (0,)), ((), ()))
    o_ref[...] = jax.lax.dot_general(T, Xs, dn,
                                     preferred_element_type=jnp.float32)

try_kernel("bmvt core (where+collapse+dotT)", k2,
           [(S, L, d), (S, L)], (S, d))


# 3. concat of sub-group results
def k3(x_ref, p_ref, o_ref):
    outs = []
    for s0 in range(0, TB, S):
        outs.append(x_ref[s0:s0 + S].sum(axis=2) * p_ref[s0:s0 + S, :1])
    o_ref[...] = jnp.concatenate(outs, axis=0)

try_kernel("subgroup slice+concat", k3, [(TB, L, d), (TB, d)], (TB, L))


# 4. iota mask + masked c (TB, L) lanes < 128
def k4(c_ref, n_ref, o_ref):
    lidx = jax.lax.broadcasted_iota(jnp.int32, (TB, L), 1)
    mask = lidx < n_ref[...]
    o_ref[...] = jnp.where(mask, c_ref[...], 0.0)

try_kernel("mask iota (TB,L) L=32 lanes", k4, [(TB, L), (TB, 1)], (TB, L))


# 5. scalar from SMEM
def k5(x_ref, o_ref, *, s):
    o_ref[...] = x_ref[...] * s[0]

def run5():
    try:
        f = pl.pallas_call(
            lambda x_ref, s_ref, o_ref: o_ref.__setitem__(
                ..., x_ref[...] * s_ref[0]),
            in_specs=[pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda: (0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )
        out = jax.jit(f)(jnp.ones((8, 128), jnp.float32),
                         jnp.ones((1,), jnp.float32))
        np.asarray(out)
        print("smem scalar: OK")
    except Exception as e:
        print(f"smem scalar: FAIL {type(e).__name__} {str(e)[:120]}")

run5()
