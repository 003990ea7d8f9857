"""Per-fold checkpoint / resume via orbax.

The reference ships checkpoint helpers but never calls them (save_checkpoint /
save_training_checkpoint, train/learning/training_common.py:209-237; call
site commented out at baselines/focal_train.py:130-131) and has no resume
path at all. Here checkpointing is a real subsystem: per fold we persist
(params, opt_state, mtl_state, epoch, best metric, early-stop counters) under
latest/ and best/, and `restore_fold` resumes mid-fold training exactly
(SURVEY.md §5 checkpoint/resume).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _ckpt_dir(root, fold: int, which: str) -> Path:
    return Path(root) / f"fold{fold}" / which


def save_fold_checkpoint(
    root,
    fold: int,
    state,
    *,
    best_metric: float,
    no_improve: int = 0,
    latest: bool = True,
    extra: Optional[Dict[str, Any]] = None,
) -> Path:
    """Write latest/ (every call) or best/ snapshots. The torch analogue is
    save_training_checkpoint's latest_epoch / best_epoch files
    (training_common.py:214-237)."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(root, fold, "latest" if latest else "best")
    path.parent.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "mtl_state": jax.device_get(state.mtl_state),
        "epoch": int(state.epoch),
    }
    ckptr.save(path.resolve(), payload, force=True)
    meta = {
        "epoch": int(state.epoch),
        "best_metric": float(best_metric),
        "no_improve": int(no_improve),
        **(extra or {}),
    }
    (path.parent / ("latest.json" if latest else "best.json")).write_text(
        json.dumps(meta)
    )
    return path


def restore_fold_checkpoint(
    root, fold: int, state_template, which: str = "latest"
) -> Optional[Tuple[Any, Dict[str, Any]]]:
    """Restore (state, meta) from a fold directory; None if absent.
    state_template provides the pytree structure/dtypes."""
    import orbax.checkpoint as ocp

    path = _ckpt_dir(root, fold, which)
    meta_path = path.parent / f"{which}.json"
    if not path.exists() or not meta_path.exists():
        return None
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "params": jax.device_get(state_template.params),
        "opt_state": jax.device_get(state_template.opt_state),
        "mtl_state": jax.device_get(state_template.mtl_state),
        "epoch": int(state_template.epoch),
    }
    payload = ckptr.restore(path.resolve(), item=template)
    meta = json.loads(meta_path.read_text())
    state = state_template.replace(
        params=payload["params"],
        opt_state=payload["opt_state"],
        mtl_state=payload["mtl_state"],
        epoch=np.int32(payload["epoch"]),
    )
    return state, meta
