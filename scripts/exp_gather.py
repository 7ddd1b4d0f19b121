"""Experiment: cold-gather rate characterization (PERF.md roadmap items 0/1).

Measures the XLA HBM row-gather rate with a *chained* in-jit loop (the axon
relay over-pipelines independent dispatches; a data dependency + final scalar
readback is the repo's established timing methodology), then probes Mosaic
in-kernel gather formulations from a VMEM-resident table.

Run on the real TPU: python scripts/exp_gather.py
"""
import sys, time
sys.path.insert(0, "/root/repo")

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

N_TABLE = 32768
D = 128
N_IDX = 2_097_152          # ~2.1M cold nnz
K = 10                     # chained reps inside one jit


@partial(jax.jit, static_argnames=("k",))
def chained_gather(table, idx, k):
    def body(carry, _):
        i = carry
        g = table[i]                                   # (N_IDX, D) gather
        # force next-iter dependence on g (cheap elementwise)
        i = (i + (g[:, 0] > 9.0).astype(jnp.int32)) % N_TABLE
        return i, g[0, 0].astype(jnp.float32)
    i, outs = jax.lax.scan(body, idx, None, length=k)
    return outs.sum()


def timed_chain(f, *a, k=K, label="", bytes_per=None):
    out = f(*a, k)
    float(out)
    t0 = time.perf_counter()
    out = f(*a, k)
    float(out)
    dt = (time.perf_counter() - t0) / k
    eff = (bytes_per or (N_IDX * D * 2)) / dt / 1e9
    print(f"{label}: {dt*1e3:.2f} ms/gather  ({eff:.0f} GB/s payload, "
          f"{N_IDX/dt/1e6:.1f}M rows/s)")
    return dt


key = jax.random.PRNGKey(0)
tab32 = jax.random.normal(key, (N_TABLE, D), jnp.float32)
tab16 = tab32.astype(jnp.bfloat16)
idx = jax.random.randint(jax.random.PRNGKey(1), (N_IDX,), 0, N_TABLE,
                         jnp.int32)

print("jax", jax.__version__, jax.devices())
info = pltpu.get_tpu_info()
print("tpu info:", info)

timed_chain(chained_gather, tab16, idx, label="XLA gather bf16",
            bytes_per=N_IDX * D * 2)
timed_chain(chained_gather, tab32, idx, label="XLA gather f32 ",
            bytes_per=N_IDX * D * 4)

# ---- Mosaic in-kernel gather probes (table staged whole in VMEM) ----
BLK = 8192

def mk(kernel, blk=BLK, interpret=False):
    grid = N_IDX // blk
    return jax.jit(pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((N_TABLE, D), lambda i: (0, 0)),
            pl.BlockSpec((blk, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((blk, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N_IDX, D), jnp.bfloat16),
        interpret=interpret,
    ))


def kern_take(table_ref, idx_ref, out_ref):
    out_ref[...] = jnp.take(table_ref[...], idx_ref[:, 0], axis=0)


def kern_tala(table_ref, idx_ref, out_ref):
    # take_along_axis with operand-shaped indices (N/TBL-pass style, 1 pass:
    # BLK == N_TABLE // 4 here so test with explicit same-shape form)
    tab = table_ref[...]
    ii = jnp.broadcast_to(idx_ref[...], (idx_ref.shape[0], D))
    out_ref[...] = jnp.take_along_axis(tab, ii, axis=0)


def kern_dslice_loop(table_ref, idx_ref, out_ref):
    def body(j, _):
        r = idx_ref[j, 0]
        out_ref[pl.ds(j, 1), :] = table_ref[pl.ds(r, 1), :]
        return 0
    jax.lax.fori_loop(0, idx_ref.shape[0], body, 0)


idx2 = idx.reshape(N_IDX, 1)
ref = np.asarray(jax.jit(lambda t, i: t[i[:, 0]])(tab16, idx2))

for name, kern in [("pallas jnp.take", kern_take),
                   ("pallas take_along_axis", kern_tala),
                   ("pallas dyn-slice loop", kern_dslice_loop)]:
    try:
        f = mk(kern)
        out = f(tab16, idx2)
        out.block_until_ready()
        # chained timing: feed output back via cheap xor on idx
        t0 = time.perf_counter()
        o = None
        for _ in range(K):
            o = f(tab16, idx2)
        np.asarray(o[0, 0])
        dt = (time.perf_counter() - t0) / K
        ok = bool(np.array_equal(np.asarray(out), ref))
        print(f"{name}: {dt*1e3:.2f} ms  correct={ok}  "
              f"({N_IDX/dt/1e6:.1f}M rows/s)")
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:240]}")
