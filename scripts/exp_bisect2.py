"""Bisect fused_implicit_solve configs on the real TPU."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from rsparse_tpu.ops.pallas_sweep import fused_implicit_solve, _pick_tb, _pick_s


def tryit(B, L, d, H, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    tb = _pick_tb(B, L, d, jnp.dtype(dtype).itemsize, H)
    tag = f"B={B} L={L} d={d} H={H} TB={tb} S={_pick_s(tb) if tb else '-'}"
    try:
        Xg = jnp.asarray(rng.standard_normal((B, L, d)) * 0.1, dtype)
        c = jnp.asarray(1 + rng.random((B, L)), jnp.float32)
        nnz = jnp.asarray(rng.integers(0, L + 1, B), jnp.int32)
        x0 = jnp.asarray(rng.standard_normal((B, d)) * 0.1, jnp.float32)
        XtX = jnp.eye(d, dtype=jnp.float32)
        W = Vh = None
        if H:
            W = jnp.asarray((rng.random((B, H)) > 0.9)
                            * (1 + rng.random((B, H))), dtype)
            Vh = jnp.asarray(rng.standard_normal((H, d)) * 0.1, dtype)
        t0 = time.time()
        y, l = fused_implicit_solve(XtX, None, Xg, c, nnz, x0,
                                    jnp.float32(0.1), jnp.float32(0.0),
                                    W=W, Vh=Vh)
        fl = float(l.sum())
        ok = np.isfinite(fl)
        print(f"{tag}: OK compile+run {time.time()-t0:.1f}s loss={fl:.1f} "
              f"finite={ok}")
        return True
    except Exception as e:
        print(f"{tag}: FAIL {type(e).__name__} {str(e)[:150]}")
        return False


tryit(64, 32, 128, 0)
tryit(64, 32, 128, 512)
tryit(2048, 32, 128, 0)
tryit(2048, 32, 128, 4096)
tryit(32768, 8, 128, 0)
tryit(32768, 8, 128, 4096)
tryit(1024, 512, 128, 4096)
tryit(64, 4096, 128, 4096)
