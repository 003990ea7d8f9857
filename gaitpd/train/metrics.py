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
