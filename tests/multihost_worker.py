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
