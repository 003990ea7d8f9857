"""Optimizer construction.

torch.optim.SGD(lr, momentum=0.9, weight_decay=1e-4) — the only optimizer the
primary reference drivers use (train/fbg_fog_train.py:288,
train/weargait_train.py:560) — decomposed into the exactly-equivalent optax
chain: grad += wd * p, buf = mu * buf + grad, p -= lr * buf. AdamW is provided
for the FOCAL/DeepAV/TACA baseline drivers
(train/baselines/focal_train.py:100, deepav_train.py, taca_train.py).
"""

from __future__ import annotations

import optax


def sgd_torch(lr: float, momentum: float = 0.9, weight_decay: float = 1e-4):
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=False))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def adamw_torch(lr: float, weight_decay: float = 1e-2, grad_clip: float = 0.0):
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=weight_decay))
    return optax.chain(*parts)


def adam_torch(lr: float, grad_clip: float = 0.0):
    parts = []
    if grad_clip:
        parts.append(optax.clip_by_global_norm(grad_clip))
    parts.append(optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8))
    return optax.chain(*parts)
