"""GloVe: Global Vectors embeddings on TPU.

Re-design of the reference GloVe (R/model_GloVe.R:13-183 over
src/GloVe.cpp:5-158).  The reference runs hogwild AdaGrad SGD over raw COO
triplets with racy shared-parameter updates (src/GloVe.cpp:91-156).  The
TPU-native version is *deterministic minibatched* SGD: the co-occurrence
triplets are padded into fixed-size COO shards, an epoch is one jitted
``lax.scan`` over shards, and per-shard updates are segment scatter-adds
(duplicate indices within a shard accumulate instead of racing).

Update math matches the reference exactly per triplet:
  weight = min((x/x_max)^alpha, 1)                 (src/GloVe.cpp:46-51)
  cost_inner = clip(w_i.w_j + b_i + b_j - log x, +-100)   (:113-120)
  cost = weight * cost_inner; AdaGrad with squared-grad accumulators
  initialized to ones (:38-42); epoch loss = 0.5 * sum cost*cost_inner.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import logger, resolve_dtype

CLIP_VALUE = 100.0  # reference src/rsparse.h:19


class GloveState(NamedTuple):
    w_i: jax.Array       # (n, r) main embeddings
    w_j: jax.Array       # (n, r) context embeddings
    b_i: jax.Array       # (n,)
    b_j: jax.Array       # (n,)
    acc_w_i: jax.Array   # squared-grad accumulators (init ones)
    acc_w_j: jax.Array
    acc_b_i: jax.Array
    acc_b_j: jax.Array


@partial(jax.jit, static_argnames=("x_max", "alpha", "lr"),
         donate_argnums=(0,))
def _glove_epoch(state: GloveState, rows, cols, vals, valid,
                 x_max: float, alpha: float, lr: float):
    """One epoch over stacked COO shards: scan of minibatch AdaGrad steps.

    rows/cols: (n_shards, N) int32; vals/valid: (n_shards, N).
    """

    def step(st: GloveState, shard):
        r, c, v, m = shard
        wi = st.w_i[r]                       # (N, k)
        wj = st.w_j[c]
        bi = st.b_i[r]
        bj = st.b_j[c]
        logv = jnp.log(jnp.where(m, v, 1.0))
        weight = jnp.where(v < x_max, jnp.power(v / x_max, alpha), 1.0)
        cost_inner = jnp.sum(wi * wj, axis=1) + bi + bj - logv
        cost_inner = jnp.clip(cost_inner, -CLIP_VALUE, CLIP_VALUE)
        cost = jnp.where(m, weight * cost_inner, 0.0)
        loss = jnp.sum(cost * cost_inner)

        g_wi = cost[:, None] * wj
        g_wj = cost[:, None] * wi

        # Accumulator-first AdaGrad: fold this shard's squared grads into the
        # accumulators *before* scaling.  The reference's per-sample loop
        # updates after (src/GloVe.cpp:136-146), which is equivalent sample
        # by sample but diverges under minibatching — high-degree nodes would
        # sum many full-size steps against a stale accumulator.
        acc_w_i = st.acc_w_i.at[r].add(g_wi * g_wi)
        acc_w_j = st.acc_w_j.at[c].add(g_wj * g_wj)
        w_i = st.w_i.at[r].add(-lr * g_wi / jnp.sqrt(acc_w_i[r]))
        w_j = st.w_j.at[c].add(-lr * g_wj / jnp.sqrt(acc_w_j[c]))

        acc_b_i = st.acc_b_i.at[r].add(cost * cost)
        acc_b_j = st.acc_b_j.at[c].add(cost * cost)
        b_i = st.b_i.at[r].add(-lr * cost / jnp.sqrt(acc_b_i[r]))
        b_j = st.b_j.at[c].add(-lr * cost / jnp.sqrt(acc_b_j[c]))

        return GloveState(w_i, w_j, b_i, b_j, acc_w_i, acc_w_j,
                          acc_b_i, acc_b_j), loss

    state, losses = jax.lax.scan(step, state, (rows, cols, vals, valid))
    return state, 0.5 * jnp.sum(losses)


def _stack_coo(coo: sp.coo_matrix, batch_size: int, dtype,
               order: Optional[np.ndarray] = None, swap: bool = False):
    n = coo.nnz
    idx = np.arange(n) if order is None else order
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    r = np.concatenate([coo.row[idx], np.zeros(pad, coo.row.dtype)])
    c = np.concatenate([coo.col[idx], np.zeros(pad, coo.col.dtype)])
    v = np.concatenate([coo.data[idx], np.ones(pad)])
    m = np.concatenate([np.ones(n, bool), np.zeros(pad, bool)])
    if swap:
        r, c = c, r
    shape = (nb, batch_size)
    return (jnp.asarray(r.reshape(shape), jnp.int32),
            jnp.asarray(c.reshape(shape), jnp.int32),
            jnp.asarray(v.reshape(shape), dtype),
            jnp.asarray(m.reshape(shape)))


class GloVe:
    """GloVe model (mlapi-style fit_transform)."""

    def __init__(
        self,
        rank: int,
        x_max: float,
        learning_rate: float = 0.15,
        alpha: float = 0.75,
        lambda_: float = 0.0,
        shuffle: bool = False,
        init: Optional[dict] = None,
        batch_size: int = 8192,
        precision: str = "float32",
        seed: Optional[int] = None,
    ):
        self.rank = int(rank)
        self.x_max = float(x_max)
        self.learning_rate = float(learning_rate)
        self.alpha = float(alpha)
        self.lambda_ = float(lambda_)  # reserved, as in the reference
        self.shuffle = shuffle
        self.batch_size = int(batch_size)
        self.dtype = resolve_dtype(precision)
        self._rng = np.random.default_rng(seed)
        self._init = init or {}
        self.components = None   # (rank, n) context embeddings w_j
        self.bias_i = None
        self.bias_j = None
        self.cost_history = []

    def fit_transform(self, x: sp.spmatrix, n_iter: int = 10,
                      convergence_tol: float = -1.0) -> jax.Array:
        coo = sp.coo_matrix(x)
        if coo.shape[0] != coo.shape[1]:
            raise ValueError("input co-occurrence matrix must be square")
        if coo.nnz and coo.data.min() <= 0:
            raise ValueError("all co-occurrence values must be > 0")
        n = coo.shape[0]
        k = self.rank

        # triangular co-occurrence => also fit on the transposed triplets
        # (reference R/model_GloVe.R:80,133-136)
        triu = bool((coo.row <= coo.col).all())
        tril = bool((coo.row >= coo.col).all())
        is_triangular = (triu or tril) and n > 1

        def initm(name, shape):
            v = self._init.get(name)
            if v is not None:
                v = np.asarray(v)
                want = tuple(reversed(shape)) if len(shape) == 2 else shape
                if v.shape == want and len(shape) == 2:
                    v = v.T  # accept reference-layout (rank, n) matrices
                if v.shape != shape:
                    raise ValueError(f"init {name} has wrong shape")
                return jnp.asarray(v, self.dtype)
            return jnp.asarray(
                self._rng.uniform(-0.5, 0.5, shape), self.dtype)

        state = GloveState(
            w_i=initm("w_i", (n, k)), w_j=initm("w_j", (n, k)),
            b_i=initm("b_i", (n,)), b_j=initm("b_j", (n,)),
            acc_w_i=jnp.ones((n, k), self.dtype),
            acc_w_j=jnp.ones((n, k), self.dtype),
            acc_b_i=jnp.ones((n,), self.dtype),
            acc_b_j=jnp.ones((n,), self.dtype),
        )

        nnz = max(coo.nnz, 1)
        self.cost_history = []
        shards = _stack_coo(coo, self.batch_size, self.dtype)
        shards_t = (_stack_coo(coo, self.batch_size, self.dtype, swap=True)
                    if is_triangular else None)
        for it in range(n_iter):
            if self.shuffle:
                order = self._rng.permutation(coo.nnz)
                shards = _stack_coo(coo, self.batch_size, self.dtype, order)
                if is_triangular:
                    shards_t = _stack_coo(coo, self.batch_size, self.dtype,
                                          order, swap=True)
            state, cost = _glove_epoch(state, *shards, x_max=self.x_max,
                                       alpha=self.alpha,
                                       lr=self.learning_rate)
            cost = float(cost)
            if is_triangular:
                state, cost2 = _glove_epoch(state, *shards_t,
                                            x_max=self.x_max,
                                            alpha=self.alpha,
                                            lr=self.learning_rate)
                cost += float(cost2)
            if np.isnan(cost):
                raise FloatingPointError(
                    "Cost becomes NaN, try a smaller learning_rate.")
            if cost / nnz > 1:
                raise FloatingPointError(
                    "Cost is too big, probably something is wrong... "
                    "try a smaller learning rate")
            self.cost_history.append(cost / nnz)
            logger.info("epoch %d, loss %.4f", it + 1, self.cost_history[-1])
            if (it > 0 and self.cost_history[-2] / self.cost_history[-1] - 1
                    < convergence_tol):
                logger.info("early stopping at epoch %d", it + 1)
                break

        self.components = np.asarray(state.w_j).T   # (rank, n), like w_j
        self.bias_i = np.asarray(state.b_i)
        self.bias_j = np.asarray(state.b_j)
        self._state = state
        return state.w_i

    def get_history(self):
        return {"cost_history": list(self.cost_history)}
