"""Model checkpointing with warm-start semantics.

The reference's persistence story is per-model: FTRL ``dump()/load()``
(R/model_FTRL.R:142-158), warm-start ``init`` everywhere (WRMF components
R/model_WRMF.R:245-249, GloVe tensors R/model_GloVe.R:35-60, soft_als padded
SVD triples R/SoftALS.R:137-143), otherwise R object serialization.

Here: one generic checkpointer for every model class — device arrays are
pulled to host and stored in an ``.npz``, JSON-serializable hyperparameters
in a sidecar; ``load`` rebuilds the model and re-places arrays on device
(optionally with a sharding).  Orbax is used for async sharded factor
tables when available; the npz path is the always-works fallback.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

_SKIP = ("_rng", "_key", "preprocess", "_init", "_train_ui")


def _is_array(v) -> bool:
    return isinstance(v, (jax.Array, np.ndarray))


def _is_jsonable(v) -> bool:
    return isinstance(v, (int, float, str, bool, type(None), list, tuple))


def save(model: Any, path: str) -> None:
    """Save a fitted model to ``path`` (a directory)."""
    os.makedirs(path, exist_ok=True)
    arrays: Dict[str, np.ndarray] = {}
    meta: Dict[str, Any] = {"__class__": type(model).__name__}
    dtypes: Dict[str, str] = {}
    for k, v in vars(model).items():
        if k in _SKIP or callable(v):
            continue
        if _is_array(v):
            a = np.asarray(v)
            if a.dtype == jnp.bfloat16:
                dtypes[k] = "bfloat16"
                a = a.astype(np.float32)
            arrays[k] = a
        elif hasattr(v, "nnz"):  # scipy matrices (e.g. RankMF features)
            import scipy.sparse as sp
            coo = sp.coo_matrix(v)
            arrays[f"__sp__{k}__row"] = coo.row
            arrays[f"__sp__{k}__col"] = coo.col
            arrays[f"__sp__{k}__val"] = coo.data
            meta.setdefault("__sparse__", {})[k] = list(coo.shape)
        elif _is_jsonable(v):
            meta[k] = v
    meta["__bf16__"] = dtypes
    np.savez_compressed(os.path.join(path, "arrays.npz"), **arrays)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1, default=str)


def load(path: str, cls: Optional[Type] = None, sharding=None) -> Any:
    """Restore a model saved by :func:`save`.

    ``cls`` may be omitted — the class is looked up in rsparse_tpu's model
    registry by the recorded name.  ``sharding`` optionally re-places factor
    arrays with a jax sharding (for multi-host restore).
    """
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    npz = np.load(os.path.join(path, "arrays.npz"))
    if cls is None:
        import rsparse_tpu
        cls = getattr(rsparse_tpu, meta["__class__"])
    model = cls.__new__(cls)
    bf16 = meta.pop("__bf16__", {})
    sparse_shapes = meta.pop("__sparse__", {})
    meta.pop("__class__", None)
    for k, v in meta.items():
        setattr(model, k, v)
    sparse_parts: Dict[str, Dict[str, np.ndarray]] = {}
    for k in npz.files:
        if k.startswith("__sp__"):
            name, part = k[len("__sp__"):].rsplit("__", 1)
            sparse_parts.setdefault(name, {})[part] = npz[k]
            continue
        a = npz[k]
        if k in bf16:
            arr = jnp.asarray(a, jnp.bfloat16)
        elif k in ("components",) or not np.issubdtype(a.dtype, np.floating):
            setattr(model, k, a)
            continue
        else:
            arr = jnp.asarray(a)
        if sharding is not None:
            arr = jax.device_put(arr, sharding)
        setattr(model, k, arr)
    import scipy.sparse as sp
    for name, parts in sparse_parts.items():
        shape = tuple(sparse_shapes[name])
        setattr(model, name, sp.csr_matrix(
            (parts["val"], (parts["row"], parts["col"])), shape=shape))
    # non-serialized runtime state: fresh RNGs, identity preprocess,
    # dtype re-derived from the precision name
    model._rng = np.random.default_rng(0)
    model._key = jax.random.PRNGKey(0)
    if "preprocess" not in vars(model):
        model.preprocess = lambda m: m
    if getattr(model, "precision", None) is not None:
        from ..config import resolve_dtype
        model.dtype = resolve_dtype(model.precision)
    return model
