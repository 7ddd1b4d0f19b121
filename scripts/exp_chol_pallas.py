"""Perf experiment: Pallas VMEM-resident batched Cholesky solve vs the
XLA blocked solve (23.5 ms per 8192 @ d=128 baseline).

Usage: python scripts/exp_chol_pallas.py [bc ...]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

_cache = os.environ.get(
    "RSPARSE_JAX_CACHE",
    str(Path(__file__).resolve().parents[1] / ".jax_cache"))
if _cache:
    jax.config.update("jax_compilation_cache_dir", _cache)

from rsparse_tpu.ops.pallas_chol import pallas_spd_solve  # noqa: E402
from rsparse_tpu.ops.solvers import batched_spd_solve_blocked  # noqa: E402


def make_problem(B, d, seed=0):
    rng = np.random.default_rng(seed)
    X = rng.standard_normal((B, d, 3 * d)).astype(np.float32)
    lhs = X @ X.transpose(0, 2, 1) / (3 * d) + 0.1 * np.eye(d, dtype=np.float32)
    rhs = rng.standard_normal((B, d)).astype(np.float32)
    return jnp.asarray(lhs), jnp.asarray(rhs)


def bench(fn, *args, reps=10):
    out = fn(*args)
    out.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.perf_counter() - t0) / reps, out


def main():
    print(jax.__version__, jax.devices(), flush=True)
    bcs = [int(a) for a in sys.argv[1:]] or [32, 64, 128]

    # correctness first, small
    lhs, rhs = make_problem(64, 128, 1)
    oracle = np.linalg.solve(np.asarray(lhs, np.float64),
                             np.asarray(rhs, np.float64)[..., None])[..., 0]
    x = pallas_spd_solve(lhs, rhs, bs=32, bc=32)
    err = np.linalg.norm(np.asarray(x) - oracle) / np.linalg.norm(oracle)
    print(f"correctness (B=64,d=128): rel err {err:.3e}", flush=True)

    lhs, rhs = make_problem(8192, 128, 2)
    t_ref, xr = bench(lambda a, b: batched_spd_solve_blocked(a, b), lhs, rhs,
                      reps=5)
    print(f"XLA blocked solve: {t_ref*1e3:.1f} ms", flush=True)
    for bc in bcs:
        try:
            t, xp = bench(lambda a, b, bc=bc: pallas_spd_solve(
                a, b, bs=32, bc=bc), lhs, rhs, reps=5)
            err = np.max(np.abs(np.asarray(xp) - np.asarray(xr)))
            print(f"pallas bc={bc}: {t*1e3:.1f} ms  maxdiff vs XLA {err:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas bc={bc}: FAILED {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
