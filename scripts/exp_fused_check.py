"""Interpret-mode correctness check of ops/pallas_sweep.py vs the XLA path."""
import os, sys
sys.path.insert(0, "/root/repo")
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

import jax.experimental.pallas as pl
import rsparse_tpu.ops.pallas_sweep as ps

_orig = pl.pallas_call
ps.pl.pallas_call = lambda *a, **k: _orig(*a, **{**k, "interpret": True})

from rsparse_tpu.ops.als import ALSConfig, CONJUGATE_GRADIENT, \
    _solve_bucket_implicit
from rsparse_tpu.sparse.device import RowBucket


def mk_bucket(rng, B, L, n_src):
    col_idx = rng.integers(0, n_src, (B, L)).astype(np.int32)
    nnz = rng.integers(0, L + 1, B).astype(np.int32)
    nnz[0] = 0
    vals = (1.0 + 4 * rng.random((B, L))).astype(np.float32)
    return RowBucket(row_ids=jnp.arange(B, dtype=jnp.int32),
                     col_idx=jnp.asarray(col_idx),
                     values=jnp.asarray(vals),
                     nnz=jnp.asarray(nnz))


def check(B=64, L=32, d=16, H=0, g=0.0, use_rhs0=True, mxu_bf16=False,
          seed=0):
    rng = np.random.default_rng(seed)
    n_src = 200
    src = (rng.standard_normal((n_src, d)) * 0.1).astype(np.float32)
    bucket = mk_bucket(rng, B, L, n_src)
    XtX = (src.T @ src + 0.5 * np.eye(d)).astype(np.float32)
    rhs0 = ((rng.standard_normal(d) * 0.1).astype(np.float32)
            if use_rhs0 else None)
    x0 = (rng.standard_normal((B, d)) * 0.1).astype(np.float32)
    lam, gj = jnp.float32(0.5), jnp.float32(g)

    hot_W = V_hot = None
    if H:
        hw = rng.random((B, H)).astype(np.float32)
        hw[hw < 0.6] = 0.0          # ~40% present
        hw[hw > 0] += 1.0
        hot_W = jnp.asarray(hw)
        V_hot = jnp.asarray((rng.standard_normal((H, d)) * 0.1), jnp.float32)

    cdt = "bfloat16" if mxu_bf16 else "float32"
    cfg = ALSConfig(feedback="implicit", solver=CONJUGATE_GRADIENT,
                    use_global_bias=bool(g) or use_rhs0,
                    compute_dtype=cdt)
    y_ref, l_ref = _solve_bucket_implicit(
        jnp.asarray(src), None, jnp.asarray(XtX),
        None if rhs0 is None else jnp.asarray(rhs0),
        bucket, jnp.asarray(x0), lam, gj, cfg, jnp.float32,
        hot_W=hot_W, V_hot=V_hot)

    gdt = jnp.bfloat16 if mxu_bf16 else jnp.float32
    Xg = jnp.asarray(src)[bucket.col_idx].astype(gdt)
    y, l = ps.fused_implicit_solve(
        jnp.asarray(XtX), None if rhs0 is None else jnp.asarray(rhs0),
        Xg, bucket.values, bucket.nnz, jnp.asarray(x0), lam, gj,
        W=None if not H else hot_W.astype(gdt),
        Vh=None if not H else V_hot.astype(gdt),
        cg_steps=3, mxu_bf16=mxu_bf16)

    tol = 2e-2 if mxu_bf16 else 2e-5
    dy = float(jnp.max(jnp.abs(y - y_ref)) / (jnp.max(jnp.abs(y_ref)) + 1e-9))
    dl = float(jnp.max(jnp.abs(l - l_ref) / (jnp.abs(l_ref) + 1.0)))
    status = "OK " if (dy < tol and dl < tol) else "FAIL"
    print(f"{status} B={B} L={L} d={d} H={H} g={g} rhs0={use_rhs0} "
          f"bf16={mxu_bf16}: dy={dy:.2e} dloss={dl:.2e}")
    return status == "OK "


ok = True
ok &= check()
ok &= check(B=64, L=32, d=16, H=0, g=0.0, use_rhs0=False)
ok &= check(B=32, L=8, d=128, H=0)
ok &= check(B=64, L=16, d=16, H=128)
ok &= check(B=64, L=16, d=16, H=128, g=0.15)
ok &= check(B=64, L=64, d=32, H=256, g=0.15, mxu_bf16=True)
ok &= check(B=128, L=40, d=24, H=0, mxu_bf16=True)
print("ALL OK" if ok else "FAILURES")
