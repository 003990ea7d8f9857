"""Golden-value tests for the classification losses against torch-computed
references (the formulas of reference classification_losses.py re-derived
independently with torch ops in this test, never imported from the reference).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from gaitpd.learning import losses as L  # noqa: E402

RNG = np.random.default_rng(0)
LOGITS = RNG.normal(size=(16, 3)).astype(np.float32)
LABELS = RNG.integers(0, 3, size=16).astype(np.int64)
COUNTS = [30, 12, 4]


def tt(x):
    # .copy() so torch never aliases (and could never mutate) the jax buffer
    return torch.from_numpy(np.asarray(x).copy())


def test_cross_entropy_plain():
    got = float(L.cross_entropy(jnp.asarray(LOGITS), jnp.asarray(LABELS)))
    ref = float(F.cross_entropy(tt(LOGITS), tt(LABELS)))
    assert abs(got - ref) < 1e-5


def test_cross_entropy_weighted():
    w = np.asarray(L.inv_freq_weights(COUNTS))
    got = float(
        L.cross_entropy(jnp.asarray(LOGITS), jnp.asarray(LABELS), jnp.asarray(w))
    )
    ref = float(F.cross_entropy(tt(LOGITS), tt(LABELS), weight=tt(w)))
    assert abs(got - ref) < 1e-5


def test_cross_entropy_valid_mask():
    """Masked loss over the first 10 samples == plain loss on those samples."""
    valid = np.zeros(16, np.float32)
    valid[:10] = 1
    got = float(
        L.cross_entropy(jnp.asarray(LOGITS), jnp.asarray(LABELS), valid=jnp.asarray(valid))
    )
    ref = float(F.cross_entropy(tt(LOGITS[:10]), tt(LABELS[:10])))
    assert abs(got - ref) < 1e-5


def test_label_smoothing_ce():
    got = float(L.label_smoothing_ce(jnp.asarray(LOGITS), jnp.asarray(LABELS), 0.1))
    # torch-side reference: KLDiv(log_softmax, smoothed one-hot), batchmean
    logp = F.log_softmax(tt(LOGITS), dim=-1)
    t = torch.zeros_like(logp).scatter_(-1, tt(LABELS).unsqueeze(-1), 1)
    t = 0.9 * t + 0.1 / 3
    ref = float(F.kl_div(logp, t, reduction="batchmean"))
    assert abs(got - ref) < 1e-4


def test_focal_loss():
    got = float(L.focal_loss(jnp.asarray(LOGITS), jnp.asarray(LABELS), gamma=2.0))
    ce = F.cross_entropy(tt(LOGITS), tt(LABELS), reduction="none")
    ref = float((((1 - torch.exp(-ce)) ** 2.0) * ce).mean())
    assert abs(got - ref) < 1e-5


def test_ldam_loss():
    m_list = L.ldam_margins(COUNTS, max_m=0.5)
    w = L.inv_freq_weights(COUNTS)
    got = float(
        L.ldam_loss(
            jnp.asarray(LOGITS), jnp.asarray(LABELS), m_list, s=30.0, weight=w
        )
    )
    # torch reference of the LDAM formula
    m = 1.0 / np.sqrt(np.sqrt(np.asarray(COUNTS, np.float64)))
    m = m * (0.5 / m.max())
    x = tt(LOGITS)
    idx = torch.zeros_like(x, dtype=torch.bool).scatter_(1, tt(LABELS).view(-1, 1), 1)
    batch_m = tt(m.astype(np.float32))[tt(LABELS)].view(-1, 1)
    out = torch.where(idx, x - batch_m, x)
    ref = float(F.cross_entropy(30.0 * out, tt(LABELS), weight=tt(np.asarray(w))))
    assert abs(got - ref) < 1e-4


def test_gcl_loss_zero_noise():
    """With noise_mul=0 GCL reduces to CE(s*(cos - m at target)); check vs a
    torch computation of that formula."""
    m_list = L.gcl_margins(COUNTS)
    cos = np.tanh(LOGITS)  # pretend cosine-bounded inputs
    got = float(
        L.gcl_loss(
            jnp.asarray(cos), jnp.asarray(LABELS), m_list,
            jax.random.PRNGKey(0), m=0.2, s=25.0, noise_mul=0.0,
        )
    )
    x = tt(cos)
    idx = torch.zeros_like(x, dtype=torch.bool).scatter_(1, tt(LABELS).view(-1, 1), 1)
    out = torch.where(idx, x - 0.2, x)
    ref = float(F.cross_entropy(25.0 * out, tt(LABELS)))
    assert abs(got - ref) < 1e-5


def test_gcl_margins_balanced_guard():
    """Perfectly balanced counts must not produce NaN (the reference divides
    by m_list.max() unguarded — documented deviation)."""
    m_list = L.gcl_margins([10, 10, 10])
    out = L.gcl_loss(
        jnp.asarray(LOGITS), jnp.asarray(LABELS), m_list,
        jax.random.PRNGKey(0), m=0.2, s=25.0, noise_mul=1.0,
    )
    assert np.isfinite(float(out))


def test_symmetric_kl():
    a, b = LOGITS, RNG.normal(size=(16, 3)).astype(np.float32)
    got = float(L.symmetric_kl_consistency(jnp.asarray(a), jnp.asarray(b)))
    kl1 = F.kl_div(F.log_softmax(tt(a), 1), F.softmax(tt(b), 1), reduction="batchmean")
    kl2 = F.kl_div(F.log_softmax(tt(b), 1), F.softmax(tt(a), 1), reduction="batchmean")
    ref = float(kl1 + kl2)
    assert abs(got - ref) < 1e-4


def test_drw_schedule():
    w0 = L.drw_weight_schedule(COUNTS, jnp.asarray(0), warmup=5)
    w5 = L.drw_weight_schedule(COUNTS, jnp.asarray(5), warmup=5)
    np.testing.assert_allclose(np.asarray(w0), np.ones(3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w5), np.asarray(L.inv_freq_weights(COUNTS)), atol=1e-6)
