"""PureSVD recommender (reference R/model_PureSVD.R:20-109).

A recommender wrapper around soft_svd / soft_impute: item components are
``(V diag(d))'``, user embeddings are ``x V``; an L2-normalized copy of
``V'`` backs ``get_similar_items``.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import scipy.sparse as sp

from ..config import resolve_dtype
from ..ops.spmm import spmm_buckets
from ..sparse.device import bucket_rows
from .base import MatrixFactorizationRecommender, get_names
from .soft_als import SVDResult, soft_impute, soft_svd


class PureSVD(MatrixFactorizationRecommender):
    def __init__(
        self,
        rank: int = 10,
        lambda_: float = 0.0,
        init: Optional[SVDResult] = None,
        preprocess: Optional[Callable] = None,
        method: str = "svd",
        precision: str = "float32",
        seed: Optional[int] = None,
    ):
        super().__init__()
        if method not in ("svd", "impute"):
            raise ValueError("method must be 'svd' or 'impute'")
        self.rank = int(rank)
        self.lambda_ = float(lambda_)
        self.method = method
        self.precision = precision
        self.dtype = resolve_dtype(precision)
        self.preprocess = preprocess or (lambda m: m)
        self._init = init
        self._svd: Optional[SVDResult] = None
        self.seed = seed

    def fit_transform(self, x: sp.spmatrix, n_iter: int = 100,
                      convergence_tol: float = 1e-3):
        self.item_ids = get_names(x, 1)
        self.user_ids = get_names(x, 0)
        csr = sp.csr_matrix(x).astype(np.float64)
        csr = self.preprocess(csr)
        fn = soft_svd if self.method == "svd" else soft_impute
        self._svd = fn(csr, rank=self.rank, lambda_=self.lambda_,
                       n_iter=n_iter, convergence_tol=convergence_tol,
                       init=self._init, precision=self.precision,
                       seed=self.seed)
        u, d, v = self._svd[:3]
        # user embeddings = x V (reference R/model_PureSVD.R:77)
        xb = bucket_rows(csr, self.dtype)
        res = spmm_buckets(xb.buckets, csr.shape[0], v)
        # components = (V diag(d))' (reference R/model_PureSVD.R:80)
        self.components = np.asarray((v * d[None, :]).T)
        self._components_l2 = None
        return res

    def transform(self, x: sp.spmatrix):
        if self._svd is None:
            raise RuntimeError("model is not fitted")
        csr = sp.csr_matrix(x).astype(np.float64)
        csr = self.preprocess(csr)
        xb = bucket_rows(csr, self.dtype)
        return spmm_buckets(xb.buckets, csr.shape[0], self._svd.v)
