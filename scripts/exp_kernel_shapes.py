"""Per-bucket-shape timing: fused Pallas kernel vs XLA streaming CG.

Uses the actual headline cold-bucket shapes.  Chained reps inside one jit
with a scalar readback (relay methodology).
"""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import bench
from bench import synth_ml20m_like, log

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp
from functools import partial
from rsparse_tpu.ops.als import ALSConfig, solver_code, _solve_bucket_implicit
from rsparse_tpu.ops.pallas_sweep import fused_implicit_solve
from rsparse_tpu.sparse.device import bucket_rows, split_hot_cold

csr = synth_ml20m_like()
RANK, LAM = 128, 0.1
n_users, n_items = csr.shape

hot, cold = split_hot_cold(csr, 4096, jnp.float32, w_dtype=jnp.bfloat16)
ui = bucket_rows(cold, jnp.float32, max_buckets=24, include_empty=True,
                 max_elems=1 << 21)
rng = np.random.default_rng(0)
V = jnp.asarray(rng.standard_normal((n_items, RANK)) * 0.01, jnp.float32)
XtX = (V.T @ V + LAM * jnp.eye(RANK, dtype=jnp.float32))
lam = jnp.float32(LAM)
g = jnp.float32(0.0)
cfg_x = ALSConfig(feedback="implicit", solver=solver_code("conjugate_gradient"),
                  compute_dtype="bfloat16")

REPS = 10


@partial(jax.jit, static_argnames=("impl", "use_hot"))
def run_bucket(V, XtX, bucket, x0, W, Vh, impl, use_hot):
    Wb = W if use_hot else None
    Vhb = Vh if use_hot else None

    def body(x, _):
        if impl == "xla":
            y, l = _solve_bucket_implicit(V, None, XtX, None, bucket, x,
                                          lam, g, cfg_x, jnp.float32,
                                          hot_W=Wb, V_hot=Vhb)
        else:
            src_g = V.astype(jnp.bfloat16)
            Xg = src_g[bucket.col_idx]
            y, l = fused_implicit_solve(
                XtX, None, Xg, bucket.values, bucket.nnz, x, lam, g,
                W=None if Wb is None else Wb.astype(jnp.bfloat16),
                Vh=None if Vhb is None else Vhb.astype(jnp.bfloat16))
        return y, l.sum()

    y, ls = jax.lax.scan(body, x0, None, length=REPS)
    return ls.sum()


total = {("xla", False): 0.0, ("fused", False): 0.0,
         ("xla", True): 0.0, ("fused", True): 0.0}
Vh_full = V[hot.hot_ids]
for bucket in ui.buckets:
    B, L = bucket.col_idx.shape
    x0 = jnp.asarray(rng.standard_normal((B, RANK)) * 0.01, jnp.float32)
    ids = jnp.minimum(bucket.row_ids, n_users - 1)
    W = hot.W[ids]
    line = f"bucket ({B:6d},{L:5d}) nnz={int(np.sum(np.asarray(bucket.nnz))):8d}:"
    for use_hot in (False, True):
        for impl in ("xla", "fused"):
            l = run_bucket(V, XtX, bucket, x0, W, Vh_full, impl, use_hot)
            float(l)
            t0 = time.time()
            l = run_bucket(V, XtX, bucket, x0, W, Vh_full, impl, use_hot)
            float(l)
            dt = (time.time() - t0) / REPS
            total[(impl, use_hot)] += dt
            line += f"  {impl}{'+hot' if use_hot else ''}={dt*1e3:6.2f}ms"
    log(line)
log(f"TOTALS: xla={total[('xla', False)]*1e3:.1f} "
    f"fused={total[('fused', False)]*1e3:.1f} "
    f"xla+hot={total[('xla', True)]*1e3:.1f} "
    f"fused+hot={total[('fused', True)]*1e3:.1f} ms")
