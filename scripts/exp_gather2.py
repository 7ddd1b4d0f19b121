"""Probe Mosaic same-shape dynamic-gather lowerings (exp_gather.py follow-up)."""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_TABLE = 32768
D = 128
K = 10

tab16 = jax.random.normal(jax.random.PRNGKey(0), (N_TABLE, D),
                          jnp.float32).astype(jnp.bfloat16)
idx = jax.random.randint(jax.random.PRNGKey(1), (N_TABLE,), 0, N_TABLE,
                         jnp.int32)


def probe(name, build):
    try:
        f, args, ref = build()
        out = f(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(K):
            out = f(*args)
        np.asarray(out).ravel()[0]
        dt = (time.perf_counter() - t0) / K
        ok = bool(np.allclose(np.asarray(out), ref))
        n = ref.shape[0] if hasattr(ref, "shape") else N_TABLE
        print(f"{name}: {dt*1e3:.3f} ms  correct={ok}  "
              f"({n*K/ (dt*K)/1e6:.1f}M rows/s)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}")


# 1. same-shape take_along_axis: indices (N_TABLE, D) == operand shape
def b1():
    def kern(t_ref, i_ref, o_ref):
        ii = jnp.broadcast_to(i_ref[...][:, :1], (N_TABLE, D))
        o_ref[...] = jnp.take_along_axis(t_ref[...], ii, axis=0)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((N_TABLE, D), lambda: (0, 0)),
                  pl.BlockSpec((N_TABLE, 1), lambda: (0, 0))],
        out_specs=pl.BlockSpec((N_TABLE, D), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((N_TABLE, D), jnp.bfloat16)))
    ref = np.asarray(tab16)[np.asarray(idx)]
    return f, (tab16, idx.reshape(-1, 1)), ref


# 2. smaller tile: operand (2048, 128), same-shape gather within tile
def b2():
    nt = 2048
    tab = tab16[:nt]
    ii = idx[:nt] % nt
    def kern(t_ref, i_ref, o_ref):
        jj = jnp.broadcast_to(i_ref[...][:, :1], (nt, D))
        o_ref[...] = jnp.take_along_axis(t_ref[...], jj, axis=0)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((nt, D), lambda: (0, 0)),
                  pl.BlockSpec((nt, 1), lambda: (0, 0))],
        out_specs=pl.BlockSpec((nt, D), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, D), jnp.bfloat16)))
    ref = np.asarray(tab)[np.asarray(ii)]
    return f, (tab, ii.reshape(-1, 1)), ref


# 3. lane gather: transposed table (D, N_TABLE) -> take_along_axis axis=1
def b3():
    tabT = tab16.T                       # (128, 32768)
    def kern(t_ref, i_ref, o_ref):
        ii = jnp.broadcast_to(i_ref[...][:1, :], (D, N_TABLE))
        o_ref[...] = jnp.take_along_axis(t_ref[...], ii, axis=1)
    f = jax.jit(pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec((D, N_TABLE), lambda: (0, 0)),
                  pl.BlockSpec((1, N_TABLE), lambda: (0, 0))],
        out_specs=pl.BlockSpec((D, N_TABLE), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((D, N_TABLE), jnp.bfloat16)))
    ref = np.asarray(tabT)[:, np.asarray(idx)]
    return f, (jnp.asarray(tabT), idx.reshape(1, -1)), ref


# 4. XLA one-shot baseline at this size (same chained-free scale ref)
def b4():
    f = jax.jit(lambda t, i: t[i])
    ref = np.asarray(tab16)[np.asarray(idx)]
    return f, (tab16, idx), ref


print(jax.devices())
probe("same-shape TALA (32768,128)", b1)
probe("same-shape TALA (2048,128) tile", b2)
probe("lane-gather TALA (128,32768)", b3)
probe("XLA gather 32768 rows", b4)
