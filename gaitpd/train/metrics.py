"""Host-side metrics: accuracy accounting, classification reports, confusion
matrices, throughput counters.

reference: train/learning/training_common.py:136-206 (ensembling, top-k,
report printers) and the inline accuracy math of the drivers. Reports use
sklearn exactly like the reference so printed output is comparable.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Sequence

import numpy as np


class AverageMeter:
    """reference training_common.py:16-29."""

    def __init__(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(1, self.count)


def accuracy(preds: np.ndarray, labels: np.ndarray) -> float:
    if len(labels) == 0:
        return 0.0
    return float((preds == labels).mean() * 100.0)


def ensemble_probs(logits_list: Sequence[np.ndarray]) -> np.ndarray:
    """Softmax-mean ensembling (reference training_common.py:136-143)."""
    probs = []
    for lg in logits_list:
        e = np.exp(lg - lg.max(axis=1, keepdims=True))
        probs.append(e / e.sum(axis=1, keepdims=True))
    return np.mean(probs, axis=0)


def topk_accuracy(logits: np.ndarray, labels: np.ndarray, topk=(1,)) -> List[float]:
    """reference training_common.py:153-163."""
    order = np.argsort(-logits, axis=1)
    out = []
    for k in topk:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out.append(float(hit.mean() * 100.0))
    return out


def classification_report_str(trues, preds, label_names=None) -> str:
    from sklearn.metrics import classification_report

    return classification_report(
        trues, preds, digits=2, zero_division=0, target_names=label_names
    )


def confusion_matrix_arr(trues, preds) -> np.ndarray:
    from sklearn.metrics import confusion_matrix

    return confusion_matrix(trues, preds)


def print_report(trues, preds, name: str, label_names=None):
    """reference training_common.py:186-196."""
    trues = list(trues) if trues is not None else []
    preds = list(preds) if preds is not None else []
    if not trues or not preds:
        print(f"\n{name}: (no samples)")
        return
    print(f"\n{name} Report:")
    print(classification_report_str(trues, preds, label_names))
    print(f"{name} Confusion Matrix:")
    print(confusion_matrix_arr(trues, preds))


def macro_f1(trues, preds) -> float:
    from sklearn.metrics import f1_score

    return float(f1_score(trues, preds, average="macro", zero_division=0))


class Throughput:
    """windows/sec counter (the new headline metric; the reference never
    measures throughput — SURVEY.md §6)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.windows = 0

    def add(self, n: int):
        self.windows += int(n)

    @property
    def per_sec(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.windows / dt if dt > 0 else 0.0


def count_params(params) -> int:
    """Trainable parameter count of a pytree (reference
    training_common.py:131-133)."""
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def print_class_balance(counts_per_stream, num_classes: int, tag: str = "EVAL",
                        label_names=None, stream_names=("skel", "sens")):
    """Class-balance table (reference training_common.py:106-128)."""
    names = label_names or [str(i) for i in range(num_classes)]
    totals = [max(1, int(np.sum(c))) for c in counts_per_stream]
    print(f"\n[{tag}] class balance")
    header = "class " + "  ".join(f"{s}_cnt  {s}_%" for s in stream_names)
    print(header)
    for i, name in enumerate(names):
        cells = []
        for c, tot in zip(counts_per_stream, totals):
            cnt = int(c[i]) if i < len(c) else 0
            cells.append(f"{cnt:9d}  {cnt / tot * 100.0:6.1f}%")
        print(f"{name:>5} " + "  ".join(cells))
    return counts_per_stream


def save_loss_curve(out_dir: str, fold_idx: int, train_losses, val_losses,
                    tag: str = "loss_curve"):
    """Per-fold train/eval loss PNG (reference train/utilities.py:205-224)."""
    import os

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    epochs = list(range(1, len(train_losses) + 1))
    plt.figure()
    plt.plot(epochs, train_losses, label="Train Loss")
    plt.plot(epochs, val_losses, label="Eval Loss")
    plt.xlabel("Epoch")
    plt.ylabel("Loss")
    plt.title(f"Fold {fold_idx} Loss Curves")
    plt.legend()
    plt.tight_layout()
    fold_dir = os.path.join(out_dir, f"fold_{fold_idx}")
    os.makedirs(fold_dir, exist_ok=True)
    path = os.path.join(fold_dir, f"{tag}.png")
    plt.savefig(path)
    plt.close()
    return path
