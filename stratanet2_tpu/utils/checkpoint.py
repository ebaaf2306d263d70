"""Checkpoint I/O.

Extends the reference's model-only checkpoints (model/point_net2.py:186-220,
which drop optimizer state) to full training-state checkpoints: params +
batch-norm state + optimizer state + RNG + epoch/fold cursor — the
orbax-style resume plan from SURVEY.md §5. Files are pickled pytrees of
numpy arrays (host-portable, device-agnostic).

File naming matches the reference convention: PCC_model_fold_n={K}.pt for
cross-validation folds, PCC_model_full.pt otherwise (model/point_net2.py:194-198).
"""

from __future__ import annotations

import os
import pickle
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def checkpoint_name(fold_id: int) -> str:
    crossvalidating = fold_id > 0
    tag = f"fold_n={fold_id}" if crossvalidating else "full"
    return f"PCC_model_{tag}.pt"


def save_checkpoint(
    path: str,
    params,
    model_state,
    opt_state=None,
    metadata: Optional[Dict[str, Any]] = None,
) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": _to_host(params),
        "model_state": _to_host(model_state),
        "opt_state": _to_host(opt_state) if opt_state is not None else None,
        "metadata": metadata or {},
    }
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return pickle.load(f)


def find_checkpoint_by_experiment(experiments_path: str, experiment_id: str) -> str:
    """Locate a checkpoint by experiment id, preferring 'full' over fold
    checkpoints (utils/utils.py:145-153)."""
    matches = []
    for root, _dirs, files in os.walk(experiments_path):
        if os.path.basename(root) == experiment_id or experiment_id in root.split(os.sep):
            matches += [os.path.join(root, f) for f in files if f.endswith(".pt")]
    if not matches:
        raise FileNotFoundError(
            f"no checkpoint for experiment {experiment_id} under {experiments_path}"
        )
    full = sorted(m for m in matches if "full" in os.path.basename(m))
    if full:
        return full[0]
    # exact fold-1 match: a bare substring test would also hit
    # fold_n=10..19, and os.walk order is filesystem-dependent
    fold1 = sorted(
        m for m in matches
        if re.search(r"fold_n=1(?!\d)", os.path.basename(m))
    )
    return (fold1 or sorted(matches))[0]
