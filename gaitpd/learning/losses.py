"""Classification losses as pure functions (CE, weighted CE, label smoothing,
focal, LDAM, GCL) with explicit PRNG and valid-sample masks.

Functional re-design of the reference loss modules
(train/learning/optimizers/classification_losses.py:9-109): class-count state
becomes precomputed margin arrays, GCL's half-normal noise takes a threaded
PRNG key, and the DRW in-place ``.weight`` mutation
(train/utilities.py:197-202, train/weargait_train.py:154-160) becomes an
epoch-selected weight operand so a single jitted step covers warmup and
re-weighted phases.

All losses accept an optional ``valid`` (B,) float mask so padded batches
(static-shape TPU batching) contribute zero loss exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-8


def _log_softmax(logits):
    return jax.nn.log_softmax(logits, axis=-1)


def _masked_mean(x: jnp.ndarray, valid: Optional[jnp.ndarray]) -> jnp.ndarray:
    if valid is None:
        return jnp.mean(x)
    valid = valid.astype(x.dtype)
    return jnp.sum(x * valid) / jnp.maximum(jnp.sum(valid), 1.0)


def _weighted_nll(logits, labels, weight, valid):
    """torch F.cross_entropy semantics: with a class-weight vector the mean is
    sum(w[y_i] * nll_i) / sum(w[y_i])."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weight is None and valid is None:
        return jnp.mean(nll)
    w = jnp.ones_like(nll) if weight is None else weight[labels]
    if valid is not None:
        w = w * valid.astype(nll.dtype)
    return jnp.sum(w * nll) / jnp.maximum(jnp.sum(w), EPS)


def cross_entropy(logits, labels, weight=None, valid=None):
    """Plain / class-weighted CE (reference train/utilities.py:144-152)."""
    return _weighted_nll(logits, labels, weight, valid)


def label_smoothing_ce(logits, labels, smoothing: float = 0.1, valid=None):
    """KL(log_softmax || smoothed one-hot), batchmean reduction.
    reference classification_losses.py:9-19."""
    c = logits.shape[-1]
    logp = _log_softmax(logits)
    onehot = jax.nn.one_hot(labels, c, dtype=logp.dtype)
    t = (1.0 - smoothing) * onehot + smoothing / c
    kl = jnp.sum(t * (jnp.log(t + EPS) - logp), axis=-1)
    return _masked_mean(kl, valid)


def weighted_label_smoothing_ce(logits, labels, weight, smoothing: float = 0.1, valid=None):
    """reference classification_losses.py:22-35 — per-class weight multiplies
    the KL columns, then sum over classes and mean over batch."""
    c = logits.shape[-1]
    logp = _log_softmax(logits)
    onehot = jax.nn.one_hot(labels, c, dtype=logp.dtype)
    t = (1.0 - smoothing) * onehot + smoothing / c
    kl = t * (jnp.log(t + EPS) - logp) * weight[None, :]
    return _masked_mean(jnp.sum(kl, axis=-1), valid)


def focal_loss(logits, labels, gamma: float = 0.0, weight=None, valid=None):
    """reference classification_losses.py:38-52: focal factor applied to the
    per-sample CE values, then mean."""
    logp = _log_softmax(logits)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if weight is not None:
        nll = nll * weight[labels]
    p = jnp.exp(-nll)
    vals = (1.0 - p) ** gamma * nll
    return _masked_mean(vals, valid)


# ---------------------------------------------------------------------------
# Margin losses
# ---------------------------------------------------------------------------


def ldam_margins(cls_num_list, max_m: float = 0.5) -> jnp.ndarray:
    """m_j = max_m * n_j^{-1/4} / max_k n_k^{-1/4}.
    reference classification_losses.py:58-59."""
    n = np.asarray(cls_num_list, dtype=np.float64)
    m = 1.0 / np.sqrt(np.sqrt(np.maximum(n, 1.0)))
    m = m * (max_m / m.max())
    return jnp.asarray(m, dtype=jnp.float32)


def ldam_loss(logits, labels, m_list, s: float = 30.0, weight=None, valid=None):
    """LDAM margin loss: subtract the class margin at the target index, scale
    by s, then (weighted) CE. reference classification_losses.py:66-76."""
    c = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    x_m = logits - m_list[labels][:, None]
    out = jnp.where(onehot > 0, x_m, logits)
    return _weighted_nll(s * out, labels, weight, valid)


def gcl_margins(cls_num_list) -> jnp.ndarray:
    """m_j = max_k log(n_k) - log(n_j). reference classification_losses.py:83-85."""
    n = np.asarray(cls_num_list, dtype=np.float64)
    logn = np.log(np.maximum(n, 1.0))
    return jnp.asarray(logn.max() - logn, dtype=jnp.float32)


def gcl_loss(
    logits,
    labels,
    m_list,
    rng: jax.Array,
    m: float = 0.5,
    s: float = 30.0,
    noise_mul: float = 1.0,
    weight=None,
    valid=None,
    train_cls: bool = False,
    gamma: float = 0.0,
):
    """Gaussian-clouded logit loss. reference classification_losses.py:97-109.

    cosine' = cosine - noise_mul * |clip(N(0, 1/3), -1, 1)| / max(m_list) * m_list
    then subtract the target margin ``m`` and apply (weighted) CE on s*out.

    Deviation from the reference: the reference divides by ``m_list.max()``
    unguarded, which is NaN for perfectly balanced class counts; we guard the
    denominator with EPS (behaviour is identical whenever counts differ).
    """
    c = logits.shape[-1]
    noise = jax.random.normal(rng, logits.shape, dtype=logits.dtype) * (1.0 / 3.0)
    noise = jnp.abs(jnp.clip(noise, -1.0, 1.0))
    denom = jnp.maximum(jnp.max(m_list), EPS)
    cosine = logits - noise_mul * noise / denom * m_list[None, :]
    onehot = jax.nn.one_hot(labels, c, dtype=logits.dtype)
    out = jnp.where(onehot > 0, cosine - m, cosine)
    if train_cls:
        return focal_loss(s * out, labels, gamma=gamma, weight=weight, valid=valid)
    return _weighted_nll(s * out, labels, weight, valid)


# ---------------------------------------------------------------------------
# Consistency + class weighting helpers
# ---------------------------------------------------------------------------


def symmetric_kl_consistency(logits_a, logits_b, valid=None):
    """Symmetric KL between the two heads' predictive distributions,
    batchmean reduction. reference train/fbg_fog_train.py:81-89."""
    logp_a = _log_softmax(logits_a)
    logp_b = _log_softmax(logits_b)
    p_a = jnp.exp(logp_a)
    p_b = jnp.exp(logp_b)
    kl1 = jnp.sum(p_b * (jnp.log(p_b + EPS) - logp_a), axis=-1)
    kl2 = jnp.sum(p_a * (jnp.log(p_a + EPS) - logp_b), axis=-1)
    return _masked_mean(kl1, valid) + _masked_mean(kl2, valid)


def inv_freq_weights(counts) -> jnp.ndarray:
    """w_j = (1/(n_j+eps)) normalised to sum to n_classes.
    reference train/utilities.py:129-131."""
    c = jnp.asarray(counts, dtype=jnp.float32)
    w = 1.0 / (c + EPS)
    return w / jnp.sum(w) * c.shape[0]


def log_based_weights(counts, div: float) -> jnp.ndarray:
    """reference train/utilities.py:134-141."""
    c = np.asarray(counts, dtype=np.float32)
    raw = np.log(c.max() / c + 0.01) / div
    raw = np.clip(raw, 0.0, None)
    if raw.sum() > 0:
        raw = raw / raw.sum() * len(raw)
    return jnp.asarray(raw, dtype=jnp.float32)


def drw_weight_schedule(counts, epoch: jnp.ndarray, warmup: int, after: str = "eq"):
    """Deferred re-weighting as a pure function of the epoch index.

    The reference mutates ``GCLLoss.weight`` mid-training — at epoch ==
    drw_warmup in the fbg driver (train/utilities.py:197-202) and at epoch ==
    drw_warmup + 1 in the weargait driver (train/weargait_train.py:154-160,
    whose epochs are 1-based so the two coincide). Here: per-class weights are
    None (ones) before warmup and inverse-frequency afterwards, selected by a
    traced comparison so one compiled step serves the whole run.
    """
    w_after = inv_freq_weights(counts)
    w_before = jnp.ones_like(w_after)
    cond = epoch >= warmup if after == "eq" else epoch > warmup
    return jnp.where(cond, w_after, w_before)
