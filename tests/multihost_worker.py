"""Worker process for the multi-host WRMF test (tests/test_multihost.py).

Runs as one of N processes: brings up ``jax.distributed`` over gloo on a
virtual 2-device CPU backend, fits WRMF on a deterministic synthetic
problem through the multi-host mesh path, and (process 0) writes the
results for the parent test to compare against a single-process fit.

Usage: python multihost_worker.py <pid> <nproc> <port> <out.npz> [mode]

``mode`` = "fit" (default): plain 2-iteration fit.
``mode`` = "ckpt": fit 1 iteration with a mid-fit checkpoint, then resume
in a FRESH model for the remaining iteration — the multi-host
checkpoint-restart story (orbax multiprocess save/restore of the
replicated fit state).
``mode`` = "alx": fit with routing="alx" — the all-to-all factor exchange
riding the ("dcn","ici") axes across the 2 processes.
``mode`` = "sgd": RankMF (WARP) + FM + GloVe with state tables row-sharded
over ("dcn","ici") across the 2 processes (parallel/sgd_sharded.py) —
BASELINE config #5's "factor tables row-sharded across 2+ hosts" shape.
"""

import os
import sys


def main():
    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "fit"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=2").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from rsparse_tpu.parallel.multihost import (initialize,
                                                make_multihost_mesh)
    initialize(f"127.0.0.1:{port}", nproc, pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == 2 * nproc

    import numpy as np
    import scipy.sparse as sp
    from rsparse_tpu import WRMF

    rs = np.random.RandomState(0)
    x = sp.random(96, 80, density=0.3, random_state=rs, format="csr")
    x.data = 1.0 + 4.0 * x.data

    mesh = make_multihost_mesh()
    assert mesh.shape == {"dcn": nproc, "ici": 2}

    if mode == "sgd":
        from rsparse_tpu.models.fm import FactorizationMachine
        from rsparse_tpu.models.glove import GloVe
        from rsparse_tpu.models.rankmf import RankMF
        from rsparse_tpu.parallel.sgd_sharded import unshard

        inter = (x > 0).astype(np.float64).tocsr()
        rmf = RankMF(rank=6, loss="warp", seed=3, batch_size=32,
                     max_negative_samples=8, mesh=mesh)
        w_rmf = unshard(rmf.partial_fit_transform(inter, n_iter=2))

        yb = (np.asarray(inter[:, :16].sum(axis=1)).ravel() > 0
              ).astype(np.float64)
        fm = FactorizationMachine(rank=4, learning_rate_w=0.2, seed=3,
                                  mesh=mesh)
        fm.fit(inter, yb, n_iter=2)
        p_fm = fm.predict(inter)

        rs2 = np.random.RandomState(2)
        cm = sp.random(48, 48, density=0.3, random_state=rs2, format="coo")
        cm.data = 1.0 + 2.0 * cm.data
        g = GloVe(rank=6, x_max=10.0, learning_rate=0.05, seed=1,
                  batch_size=64, n_hot=0, mesh=mesh)
        w_g = unshard(g.fit_transform(cm, n_iter=2), 48)

        if pid == 0:
            np.savez(out, w_rmf=w_rmf, p_fm=p_fm, w_g=w_g,
                     glove_cost=np.asarray(g.cost_history))
        jax.distributed.shutdown()
        return

    kw = dict(rank=6, lambda_=0.5, feedback="implicit", solver="cholesky",
              precision="double", seed=0, mesh=mesh)
    if mode == "alx":
        m = WRMF(routing="alx", **{k: v for k, v in kw.items()
                                   if k != "solver"},
                 solver="conjugate_gradient")
        emb = m.fit_transform(x, n_iter=2, convergence_tol=-1)
    elif mode == "ckpt":
        ckpt_dir = out + ".ckpt"
        m1 = WRMF(**kw)
        m1.fit_transform(x, n_iter=1, convergence_tol=-1,
                         checkpoint_path=ckpt_dir, checkpoint_every=1)
        # fresh process-state model resumes from the shared store
        m = WRMF(**kw)
        emb = m.fit_transform(x, n_iter=2, convergence_tol=-1,
                              checkpoint_path=ckpt_dir, resume=True)
    else:
        m = WRMF(**kw)
        emb = m.fit_transform(x, n_iter=2, convergence_tol=-1)

    # every process holds the same replicated result; process 0 reports
    if pid == 0:
        np.savez(out, emb=np.asarray(emb), V=np.asarray(m._V),
                 loss=np.asarray(m.loss_history))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
