"""Trajectory parity vs a numpy replica of the reference training loop.

The replica implements the exact per-entity semantics of the reference C++
(inst/include/wrmf_implicit.hpp:91-305): alternating item/user sweeps, CG
warm-started from the previous factors with per-entity CG_TOL freeze, the
nnz-normalized loss with the final lambda*||X||^2 term, and the closing
avoid-CG half-sweep from zero init (R/model_WRMF.R:355-359,412-452).
Matching the *loss trajectory over iterations* (not just one sweep) pins
down warm-start handling, sweep ordering, and loss bookkeeping at once.
"""

import numpy as np
import scipy.sparse as sp

from rsparse_tpu import WRMF

CG_TOL = 1e-10


def _cg(Xn, conf, x0, XtX, steps):
    x = x0.copy()
    c1 = conf - 1.0
    r = Xn.T @ (conf - c1 * (Xn @ x)) - XtX @ x
    p = r.copy()
    rsold = r @ r
    for _ in range(steps):
        if rsold < CG_TOL:
            break
        Ap = XtX @ p + Xn.T @ (c1 * (Xn @ p))
        alpha = rsold / (p @ Ap)
        x += alpha * p
        r -= alpha * Ap
        rsnew = r @ r
        p = r + (rsnew / rsold) * p
        rsold = rsnew
    return x


def _sweep_ref(conf_csc, X, Y, lam, solver, cg_steps):
    """One reference half-sweep: solve all columns of conf (targets Y)
    given X; returns (new Y, loss) matching wrmf_implicit.hpp loss rules."""
    r = X.shape[1]
    XtX = X.T @ X + lam * np.eye(r)
    Y = Y.copy()
    loss = 0.0
    for i in range(conf_csc.shape[1]):
        p1, p2 = conf_csc.indptr[i], conf_csc.indptr[i + 1]
        if p1 == p2:
            Y[i] = 0.0
            continue
        idx = conf_csc.indices[p1:p2]
        c = conf_csc.data[p1:p2]
        Xn = X[idx]                      # (nnz, r)
        if solver == "conjugate_gradient":
            y = _cg(Xn, c, Y[i].copy(), XtX, cg_steps)
        else:
            lhs = XtX + Xn.T @ (np.diag(c - 1.0) @ Xn)
            y = np.linalg.solve(lhs, Xn.T @ c)
        Y[i] = y
        loss += np.sum(c * (1.0 - Xn @ y) ** 2) + lam * (y @ y)
    loss += lam * np.sum(X * X)
    return Y, loss


def _fit_ref(csr, rank, lam, n_iter, solver, cg_steps, seed):
    rng = np.random.default_rng(seed)
    n_u, n_i = csr.shape
    U = rng.standard_normal((n_u, rank)) * 0.01
    if solver == "conjugate_gradient":
        V = np.zeros((n_i, rank))
    else:
        V = rng.standard_normal((n_i, rank)) * 0.01
    csc = csr.tocsc()
    losses = []
    for _ in range(n_iter):
        V, _ = _sweep_ref(csc, U, V, lam, solver, cg_steps)
        U, loss = _sweep_ref(csr.T.tocsc(), V, U, lam, solver, cg_steps)
        losses.append(loss / csr.nnz)
    # closing avoid-CG half-sweep from zeros
    final_solver = "cholesky" if solver == "conjugate_gradient" else solver
    U, _ = _sweep_ref(csr.T.tocsc(), V, np.zeros_like(U), lam, final_solver,
                      cg_steps)
    return U, V, losses


def test_implicit_cg_trajectory_matches_replica():
    rs = np.random.RandomState(0)
    csr = sp.random(80, 50, density=0.25, random_state=rs, format="csr")
    csr.data = 1.0 + 9.0 * csr.data
    lam = 0.7
    model = WRMF(rank=6, lambda_=lam, feedback="implicit",
                 solver="conjugate_gradient", precision="double", seed=3)
    emb = model.fit_transform(csr, n_iter=4, convergence_tol=-1)
    U_ref, V_ref, losses_ref = _fit_ref(csr, 6, lam, 4,
                                        "conjugate_gradient", 3, seed=3)
    np.testing.assert_allclose(model.loss_history, losses_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(model.components).T, V_ref,
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(emb), U_ref, rtol=1e-6,
                               atol=1e-10)


def test_implicit_cholesky_trajectory_matches_replica():
    rs = np.random.RandomState(1)
    csr = sp.random(60, 40, density=0.3, random_state=rs, format="csr")
    csr.data = 1.0 + 4.0 * csr.data
    lam = 1.2
    model = WRMF(rank=5, lambda_=lam, feedback="implicit", solver="cholesky",
                 precision="double", seed=7)
    emb = model.fit_transform(csr, n_iter=3, convergence_tol=-1)
    U_ref, V_ref, losses_ref = _fit_ref(csr, 5, lam, 3, "cholesky", 3,
                                        seed=7)
    np.testing.assert_allclose(model.loss_history, losses_ref, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(emb), U_ref, rtol=1e-6,
                               atol=1e-10)


def _sweep_ref_explicit(conf_csc, X, Y, lam, dynamic, cnt_src):
    """Explicit half-sweep (wrmf_explicit.hpp:34-173), Cholesky."""
    r = X.shape[1]
    Y = Y.copy()
    loss = 0.0
    for i in range(conf_csc.shape[1]):
        p1, p2 = conf_csc.indptr[i], conf_csc.indptr[i + 1]
        if p1 == p2:
            Y[i] = 0.0
            continue
        idx = conf_csc.indices[p1:p2]
        vals = conf_csc.data[p1:p2]
        lam_use = lam * (p2 - p1) if dynamic else lam
        Xn = X[idx]
        lhs = Xn.T @ Xn + lam_use * np.eye(r)
        y = np.linalg.solve(lhs, Xn.T @ vals)
        Y[i] = y
        diff = vals - Xn @ y
        loss += diff @ diff + lam_use * (y @ y)
    if dynamic:
        loss += lam * np.sum((X * X).sum(1) * cnt_src)
    else:
        loss += lam * np.sum(X * X)
    return Y, loss


def test_explicit_dynamic_lambda_trajectory_matches_replica():
    rs = np.random.RandomState(2)
    csr = sp.random(70, 45, density=0.25, random_state=rs, format="csr")
    csr.data = 1.0 + 4.0 * csr.data
    lam = 0.3
    model = WRMF(rank=5, lambda_=lam, feedback="explicit", solver="cholesky",
                 dynamic_lambda=True, precision="double", seed=11)
    emb = model.fit_transform(csr, n_iter=3, convergence_tol=-1)

    rng = np.random.default_rng(11)
    n_u, n_i = csr.shape
    U = rng.standard_normal((n_u, 5)) * 0.01
    V = rng.standard_normal((n_i, 5)) * 0.01
    cnt_u = np.diff(csr.indptr)
    cnt_i = np.diff(csr.tocsc().indptr)
    csc = csr.tocsc()
    losses = []
    for _ in range(3):
        V, _ = _sweep_ref_explicit(csc, U, V, lam, True, cnt_u)
        U, loss = _sweep_ref_explicit(csr.T.tocsc(), V, U, lam, True, cnt_i)
        losses.append(loss / csr.nnz)
    U, _ = _sweep_ref_explicit(csr.T.tocsc(), V, np.zeros_like(U), lam,
                               True, cnt_i)
    np.testing.assert_allclose(model.loss_history, losses, rtol=1e-8)
    np.testing.assert_allclose(np.asarray(emb), U, rtol=1e-6, atol=1e-10)
