"""Training checkpoint/resume.

Goes beyond the reference (reference: Nnet::Write per-epoch models under
$dir/nnet/ with lr/loss-encoded names, train_scheduler.sh marker files,
optimizer state NOT saved — momenta restart from zero on resume,
SURVEY.md §5): here params, optimizer/velocity state, BN accumulators,
the newbob state and the data-order seed all checkpoint together, so
resume is exact."""

from __future__ import annotations

import io
import json
import os
import zipfile
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree: Any, prefix: str) -> Dict[str, np.ndarray]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {prefix + jax.tree_util.keystr(path): np.asarray(leaf)
            for path, leaf in flat}


def _unflatten_into(arrays: Dict[str, np.ndarray], prefix: str) -> Any:
    out: Dict[str, Any] = {}
    for key, arr in arrays.items():
        if not key.startswith(prefix):
            continue
        keys = [k.strip("'\"") for k in
                key[len(prefix):].replace("]", "").split("[") if k]
        d = out
        for k in keys[:-1]:
            d = d.setdefault(k, {})
        d[keys[-1]] = jnp.asarray(arr)
    return out


def save_checkpoint(
    path: str,
    params: Any,
    velocity: Optional[Any] = None,
    model_states: Optional[Any] = None,
    meta: Optional[Dict] = None,
) -> None:
    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(params, "params"))
    if velocity is not None:
        arrays.update(_flatten(velocity, "velocity"))
    if model_states is not None:
        arrays.update(_flatten(model_states, "states"))
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        z.writestr("meta.json", json.dumps(meta or {}))
        buf = io.BytesIO()
        np.savez(buf, **arrays)
        z.writestr("arrays.npz", buf.getvalue())
    os.replace(tmp, path)  # atomic


def load_checkpoint(path: str) -> Tuple[Any, Any, Any, Dict]:
    """Returns (params, velocity, model_states, meta)."""
    with zipfile.ZipFile(path) as z:
        meta = json.loads(z.read("meta.json"))
        npz = np.load(io.BytesIO(z.read("arrays.npz")))
        arrays = {k: npz[k] for k in npz.files}
    return (
        _unflatten_into(arrays, "params"),
        _unflatten_into(arrays, "velocity") or None,
        _unflatten_into(arrays, "states") or None,
        meta,
    )
