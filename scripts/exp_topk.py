#!/usr/bin/env python
"""Experiment: where does masked top-k time go on TPU, and which exact
top-k formulation is fastest (grouped-sort grid / iterative-max /
approx_max_k reference point).

Usage: python scripts/exp_topk.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp
    from rsparse_tpu.ops.topk import exact_top_k, NEG_INF

    B, R, N, k = 4096, 128, 32768, 10
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, R)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((R, N)), jnp.float32)
    M = 600_000
    mrows = jnp.asarray(rng.integers(0, B, M), jnp.int32)
    mcols = jnp.asarray(rng.integers(0, N, M), jnp.int32)

    def timeit(name, fn, reps=20):
        o = fn()
        jax.block_until_ready(o)
        t0 = time.time()
        for _ in range(reps):
            o = fn()
        jax.block_until_ready(o)
        dt = (time.time() - t0) / reps
        print(f"{name:42s} {dt*1e3:8.2f} ms  "
              f"({B*N/dt/1e9:7.1f} G scores/s)", file=sys.stderr, flush=True)
        return o

    matmul = jax.jit(lambda: jnp.dot(x, y, preferred_element_type=jnp.float32))
    timeit("matmul only", matmul)

    @jax.jit
    def masked():
        s = jnp.dot(x, y, preferred_element_type=jnp.float32)
        return s.at[mrows, mcols].set(NEG_INF)
    timeit("matmul + scatter mask", masked)

    for group in (128, 256, 512, 1024):
        @jax.jit
        def full(group=group):
            s = jnp.dot(x, y, preferred_element_type=jnp.float32)
            s = s.at[mrows, mcols].set(NEG_INF)
            return exact_top_k(s, k, group=group)
        timeit(f"+ grouped-sort top-k (group={group})", full)

    @jax.jit
    def iterative():
        s = jnp.dot(x, y, preferred_element_type=jnp.float32)
        s = s.at[mrows, mcols].set(NEG_INF)
        G = 256
        sg = s.reshape(B, N // G, G)
        outs_s, outs_i = [], []
        for _ in range(k):
            gm = jnp.max(sg, axis=-1)             # (B, N/G)
            gi = jnp.argmax(sg, axis=-1)
            bg = jnp.argmax(gm, axis=-1)          # (B,)
            bs = jnp.take_along_axis(gm, bg[:, None], 1)[:, 0]
            bi = (jnp.take_along_axis(
                gi, bg[:, None], 1)[:, 0] + bg * G)
            outs_s.append(bs)
            outs_i.append(bi)
            sg = jnp.where(
                (jnp.arange(N // G)[None, :, None] == bg[:, None, None])
                & (jnp.arange(G)[None, None, :]
                   == jnp.take_along_axis(gi, bg[:, None], 1)[..., None]),
                NEG_INF, sg)
        return jnp.stack(outs_s, 1), jnp.stack(outs_i, 1)
    timeit("+ iterative-max top-k", iterative)

    @jax.jit
    def approx():
        s = jnp.dot(x, y, preferred_element_type=jnp.float32)
        s = s.at[mrows, mcols].set(NEG_INF)
        return jax.lax.approx_max_k(s, k)
    timeit("+ approx_max_k (recall .95)", approx)

    @jax.jit
    def approx_exactish():
        s = jnp.dot(x, y, preferred_element_type=jnp.float32)
        s = s.at[mrows, mcols].set(NEG_INF)
        return jax.lax.approx_max_k(s, k, recall_target=0.9999)
    timeit("+ approx_max_k (recall .9999)", approx_exactish)

    # correctness cross-check of the grouped path vs iterative
    s_ref, i_ref = jax.jit(lambda: exact_top_k(
        masked(), k, group=512))()
    s_it, i_it = iterative()
    print("grouped vs iterative scores equal:",
          bool(jnp.allclose(s_ref, s_it)), file=sys.stderr)


if __name__ == "__main__":
    main()
