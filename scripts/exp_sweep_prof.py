"""Decompose the headline WRMF sweep cost and test the bf16-shadow-table
gather (the f32-rows-fetch-faster characterization is stale on jax 0.9:
bf16 rows now gather at 290M rows/s vs f32 267M — see exp_gather.py).

Run on the real TPU: python scripts/exp_sweep_prof.py
"""
import os, sys, time
sys.path.insert(0, "/root/repo")

import numpy as np

import bench
from bench import synth_ml20m_like, log

csr = synth_ml20m_like()

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from functools import partial
from rsparse_tpu.ops.als import ALSConfig, solver_code, wrmf_sweep
from rsparse_tpu.sparse.device import bucket_rows, split_hot_cold

RANK, LAM = 128, 0.1
n_users, n_items = csr.shape


def run(tag, n_hot, buckets_on=True, reps=8, compute_dtype="bfloat16",
        drop_hot_terms=False, use_pallas=False):
    hot, cold = (None, csr)
    w_dt = jnp.bfloat16 if compute_dtype == "bfloat16" else jnp.float32
    if n_hot:
        hot, cold = split_hot_cold(csr, n_hot, jnp.float32, w_dtype=w_dt)
    if drop_hot_terms:
        hot = None          # time the post-split cold path in isolation
    ui = bucket_rows(cold, jnp.float32, max_buckets=24,
                     include_empty=bool(n_hot), max_elems=1 << 21)
    if not buckets_on:
        import dataclasses
        ui = dataclasses.replace(ui, buckets=())
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((n_users, RANK)) * 0.01, jnp.float32)
    V = jnp.asarray(rng.standard_normal((n_items, RANK)) * 0.01, jnp.float32)
    cfg = ALSConfig(feedback="implicit",
                    solver=solver_code("conjugate_gradient"),
                    compute_dtype=compute_dtype, use_pallas=use_pallas)
    sweep = partial(jax.jit, static_argnames=("cfg",))(wrmf_sweep)
    t0 = time.time()
    U2, loss = sweep(V, U, ui.buckets, None, LAM, 0.0, cfg, hot)
    log(f"[{tag}] compile {time.time()-t0:.1f}s loss={float(loss):.1f}")
    t0 = time.time()
    for _ in range(reps):
        U2, loss = sweep(V, U2, ui.buckets, None, LAM, 0.0, cfg, hot)
    fl = float(loss)
    dt = (time.time() - t0) / reps
    log(f"[{tag}] {dt*1e3:.1f} ms/sweep  ({n_users/dt/1e6:.2f}M updates/s, "
        f"loss {fl:.0f})")
    return dt


if len(sys.argv) == 1 and __name__ == "__main__":
    log(f"devices: {jax.devices()}")
    full = run("headline hot4096+cold", 4096)
    fused = run("FUSED hot4096+cold", 4096, use_pallas=True)
    fused_cold = run("FUSED cold-only", 4096, use_pallas=True,
                     drop_hot_terms=True)
    log(f"fused vs XLA: {fused*1e3:.1f} vs {full*1e3:.1f} ms "
        f"(cold-only fused {fused_cold*1e3:.1f})")

# appended scan entrypoints
def scan_buckets():
    log(f"devices: {jax.devices()}")
    for mb in (6, 12, 24, 48):
        run_mb(mb)

def run_mb(mb):
    hot, cold_m = split_hot_cold(csr, 4096, jnp.float32, w_dtype=jnp.bfloat16)
    ui = bucket_rows(cold_m, jnp.float32, max_buckets=mb,
                     include_empty=True, max_elems=1 << 21)
    padded = sum(B * L for B, L in ui.shapes)
    rng = np.random.default_rng(0)
    U = jnp.asarray(rng.standard_normal((n_users, RANK)) * 0.01, jnp.float32)
    V = jnp.asarray(rng.standard_normal((n_items, RANK)) * 0.01, jnp.float32)
    cfg = ALSConfig(feedback="implicit",
                    solver=solver_code("conjugate_gradient"),
                    compute_dtype="bfloat16")
    sweep = partial(jax.jit, static_argnames=("cfg",))(wrmf_sweep)
    U2, loss = sweep(V, U, ui.buckets, None, LAM, 0.0, cfg, None)
    float(loss)
    t0 = time.time()
    for _ in range(8):
        U2, loss = sweep(V, U2, ui.buckets, None, LAM, 0.0, cfg, None)
    float(loss)
    dt = (time.time() - t0) / 8
    log(f"max_buckets={mb}: {len(ui.buckets)} chunks, "
        f"padding {padded/max(cold_m.nnz,1):.2f}x, {dt*1e3:.1f} ms cold-iso")

def scan_hot():
    log(f"devices: {jax.devices()}")
    for nh in (2048, 4096, 6144, 8192):
        run(f"hot{nh}", nh)

if len(sys.argv) > 1 and sys.argv[1] == "buckets":
    scan_buckets()
elif len(sys.argv) > 1 and sys.argv[1] == "hot":
    scan_hot()
