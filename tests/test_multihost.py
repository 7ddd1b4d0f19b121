"""Multi-host (multi-process) distributed layer.

The reference is single-process (SURVEY §2.4); this is the net-new layer.
Real 2-host hardware is not reachable here, so the multi-process runtime is
validated the way JAX upstream does: N actual OS processes on the CPU
backend with gloo cross-process collectives, each owning a virtual
2-device "host".  The model-level test asserts WRMF through a
``("dcn","ici")`` mesh with per-process bucket building reproduces the
single-process fit.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest
import scipy.sparse as sp


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(n_proc: int, out_path: str, timeout: int = 600,
                 mode: str = "fit"):
    port = _free_port()
    script = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)        # workers pick their own device count
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), str(n_proc), str(port),
             out_path, mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for pid in range(n_proc)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, o in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{o[-4000:]}"


def test_two_process_wrmf_matches_single_process(tmp_path):
    """WRMF(mesh=multihost) on 2 processes x 2 CPU devices == the
    single-process model, bit-for-bit up to collective reduction order."""
    out = str(tmp_path / "mh.npz")
    _run_workers(2, out)
    got = np.load(out)

    # single-process reference (this pytest process: plain WRMF, no mesh)
    from rsparse_tpu import WRMF
    rs = np.random.RandomState(0)
    x = sp.random(96, 80, density=0.3, random_state=rs, format="csr")
    x.data = 1.0 + 4.0 * x.data
    m = WRMF(rank=6, lambda_=0.5, feedback="implicit", solver="cholesky",
             precision="double", seed=0)
    emb = m.fit_transform(x, n_iter=2, convergence_tol=-1)

    np.testing.assert_allclose(got["emb"], np.asarray(emb),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["V"], np.asarray(m._V),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["loss"], np.asarray(m.loss_history),
                               rtol=1e-10)


def test_distributed_bucket_rows_single_process():
    """The distributed bucket builder degenerates correctly at
    n_processes == 1: same members, global row ids, sentinel padding."""
    import jax
    import jax.numpy as jnp
    from rsparse_tpu.parallel.multihost import (distributed_bucket_rows,
                                                make_multihost_mesh)
    if jax.process_count() != 1:
        pytest.skip("single-process check")
    rs = np.random.RandomState(1)
    x = sp.random(64, 48, density=0.25, random_state=rs, format="csr")
    mesh = make_multihost_mesh()
    br = distributed_bucket_rows(x, 0, 64, 48, mesh, jnp.float32)
    assert br.n_rows == 64 and br.n_cols == 48 and br.nnz == x.nnz
    seen = {}
    for b in br.buckets:
        ids = np.asarray(b.row_ids)
        cols = np.asarray(b.col_idx)
        vals = np.asarray(b.values)
        nnz = np.asarray(b.nnz)
        for j, r in enumerate(ids):
            if r == 64:       # sentinel padding
                assert nnz[j] == 0
                continue
            seen[int(r)] = (cols[j, :nnz[j]], vals[j, :nnz[j]])
    csr = sp.csr_matrix(x)
    for r in range(64):
        s, e = csr.indptr[r], csr.indptr[r + 1]
        if e == s:
            assert r not in seen
            continue
        c, v = seen[r]
        np.testing.assert_array_equal(c, csr.indices[s:e])
        np.testing.assert_allclose(v, csr.data[s:e], rtol=1e-6)


def test_two_process_checkpoint_resume(tmp_path):
    """Mid-fit checkpoint + resume across 2 processes must reproduce the
    uninterrupted multi-host fit exactly (orbax multiprocess store of the
    replicated fit state; the ALS loop is deterministic given (U, V))."""
    out_plain = str(tmp_path / "plain.npz")
    _run_workers(2, out_plain)
    out_ckpt = str(tmp_path / "ckpt.npz")
    _run_workers(2, out_ckpt, mode="ckpt")
    a, b = np.load(out_plain), np.load(out_ckpt)
    np.testing.assert_allclose(b["emb"], a["emb"], rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(b["loss"], a["loss"], rtol=1e-12)


def test_two_process_sharded_sgd(tmp_path):
    """RankMF + FM + GloVe with state tables row-sharded over ('dcn','ici')
    across 2 REAL processes must reproduce the single-process fits
    (BASELINE config #5's row-sharded-across-hosts shape)."""
    out = str(tmp_path / "sgd.npz")
    _run_workers(2, out, mode="sgd")
    got = np.load(out)

    from rsparse_tpu.models.fm import FactorizationMachine
    from rsparse_tpu.models.glove import GloVe
    from rsparse_tpu.models.rankmf import RankMF

    rs = np.random.RandomState(0)
    x = sp.random(96, 80, density=0.3, random_state=rs, format="csr")
    x.data = 1.0 + 4.0 * x.data
    inter = (x > 0).astype(np.float64).tocsr()

    rmf = RankMF(rank=6, loss="warp", seed=3, batch_size=32,
                 max_negative_samples=8)
    w_rmf = np.asarray(rmf.partial_fit_transform(inter, n_iter=2))
    # atol 5e-5: the sharded path's scatter/psum aggregation order differs
    # from the single-device scatter order, and XLA-CPU threaded
    # reductions are not run-deterministic — observed f32 reorder noise
    # up to ~2e-5 on ~1e-3 values (flaked once at 1e-6 in a full-suite
    # run, passed in isolation)
    np.testing.assert_allclose(got["w_rmf"], w_rmf, atol=5e-5)

    yb = (np.asarray(inter[:, :16].sum(axis=1)).ravel() > 0
          ).astype(np.float64)
    fm = FactorizationMachine(rank=4, learning_rate_w=0.2, seed=3)
    fm.fit(inter, yb, n_iter=2)
    np.testing.assert_allclose(got["p_fm"], fm.predict(inter), atol=1e-6)

    rs2 = np.random.RandomState(2)
    cm = sp.random(48, 48, density=0.3, random_state=rs2, format="coo")
    cm.data = 1.0 + 2.0 * cm.data
    g = GloVe(rank=6, x_max=10.0, learning_rate=0.05, seed=1,
              batch_size=64, n_hot=0)
    w_g = np.asarray(g.fit_transform(cm, n_iter=2))
    np.testing.assert_allclose(got["w_g"], w_g, atol=2e-6)
    np.testing.assert_allclose(got["glove_cost"], g.cost_history, rtol=1e-5)


def test_two_process_routing_alx(tmp_path):
    """routing='alx' across 2 real processes: the routed exchange over
    ('dcn','ici') must reproduce the single-process CG fit."""
    out = str(tmp_path / "alx.npz")
    _run_workers(2, out, mode="alx")
    got = np.load(out)
    from rsparse_tpu import WRMF
    rs = np.random.RandomState(0)
    x = sp.random(96, 80, density=0.3, random_state=rs, format="csr")
    x.data = 1.0 + 4.0 * x.data
    m = WRMF(rank=6, lambda_=0.5, feedback="implicit", n_hot=0,
             solver="conjugate_gradient", precision="double", seed=0)
    emb = m.fit_transform(x, n_iter=2, convergence_tol=-1)
    np.testing.assert_allclose(got["emb"], np.asarray(emb),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(got["loss"], np.asarray(m.loss_history),
                               rtol=1e-10)
