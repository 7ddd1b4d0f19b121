"""Bundled datasets.

The reference ships MovieLens-100k as a 943x1682 ``dgCMatrix``
(reference R/data.R:1-21, data/movielens100k.RData); we read the same file
directly via the RData parser.
"""

from __future__ import annotations

import os

import scipy.sparse as sp

from .rdata import parse_rdata, s4_to_scipy

_DEFAULT_PATHS = (
    os.path.join(os.path.dirname(__file__), "movielens100k.RData"),
    "/root/reference/data/movielens100k.RData",
)


def load_movielens100k(path: str | None = None) -> sp.csr_matrix:
    """Load the MovieLens-100k rating matrix (943 users x 1682 items,
    values 1..5) with user/item identifiers attached as ``row_names`` /
    ``col_names``."""
    paths = (path,) if path else _DEFAULT_PATHS
    last_err = None
    for p in paths:
        if p and os.path.exists(p):
            objs = parse_rdata(p)
            m = s4_to_scipy(objs["movielens100k"])
            csr = sp.csr_matrix(m)
            csr.row_names = m.row_names    # type: ignore[attr-defined]
            csr.col_names = m.col_names    # type: ignore[attr-defined]
            return csr
    raise FileNotFoundError(
        f"movielens100k.RData not found in {paths}; {last_err}")
