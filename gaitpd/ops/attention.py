"""Attention ops: zero-parameter cheap cross-attention and the generic
projected cross-attention used by the baseline families.

reference: CheapCrossAttention (train/feature_encoder.py:497-527 /
data/WearGait/weargait_encoders.py:324-336), MHSA/XAttn
(train/baselines/architectures/deepav.py:29-70), TACA temperature-scaled
cross-attention (train/baselines/architectures/taca.py:39-97).

TPU notes: T here is <= a few hundred, so dense (B,T,T) attention is tiny and
XLA fuses the softmax chain; the matmuls carry an explicit f32 accumulation
type so MXU bf16 inputs don't lose the logits. A length-blocked Pallas kernel
(gaitpd.ops.pallas_blocks.cheap_xattn_pallas) covers the same op for long
windows without recompiles; these jnp versions are the reference semantics
and the autodiff path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.einsum(
        "btd,bsd->bts", a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def cheap_cross_attention_sym(s: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Symmetric zero-parameter fusion of two (B,T,d) sequences:
    0.5*(softmax(SGᵀ/√d)G + softmax(GSᵀ/√d)S).
    reference train/feature_encoder.py:497-527."""
    d = s.shape[-1]
    sim = _dot(s, g) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    attn_sg = jax.nn.softmax(sim, axis=-1)
    attn_gs = jax.nn.softmax(sim.swapaxes(1, 2), axis=-1)
    s_star = jnp.einsum("bts,bsd->btd", attn_sg, g, precision=jax.lax.Precision.HIGHEST)
    g_star = jnp.einsum("bts,bsd->btd", attn_gs, s, precision=jax.lax.Precision.HIGHEST)
    return 0.5 * (s_star + g_star)


def cheap_cross_attention(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """One-directional variant: softmax(ABᵀ/√d) B.
    reference data/WearGait/weargait_encoders.py:324-336."""
    d = a.shape[-1]
    sim = _dot(a, b) / jnp.sqrt(jnp.asarray(d, jnp.float32))
    return jnp.einsum(
        "bts,bsd->btd", jax.nn.softmax(sim, axis=-1), b,
        precision=jax.lax.Precision.HIGHEST,
    )


def scaled_cross_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    n_heads: int,
    scale_mul: float | jnp.ndarray = 1.0,
    kv_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head cross-attention core on already-projected q/k/v
    (B, T, d_att): split heads, softmax(scale_mul * qkᵀ/√dk) v, merge heads.
    Covers DeepAV's MHSA/XAttn (deepav.py:41-70, scale_mul=1) and TACA's
    γ/τ-scaled logits (taca.py:78-89)."""
    b, tq, da = q.shape
    tk = k.shape[1]
    dk = da // n_heads

    def split(x, t):
        return x.reshape(b, t, n_heads, dk).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, tq), split(k, tk), split(v, tk)
    logits = jnp.einsum(
        "bhtd,bhsd->bhts", qh, kh, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) / jnp.sqrt(jnp.asarray(dk, jnp.float32))
    if kv_mask is not None:
        logits = jnp.where(kv_mask[:, None, None, :] == 0, -jnp.inf, logits)
    attn = jax.nn.softmax(scale_mul * logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", attn, vh, precision=jax.lax.Precision.HIGHEST)
    return out.transpose(0, 2, 1, 3).reshape(b, tq, da)


def masked_pairwise_enrichment(
    streams: Sequence[jnp.ndarray], mask: Optional[jnp.ndarray] = None
) -> list:
    """Relaxed-input pairwise cheap cross-attention: stream i is enriched by
    the mean of cheap_cross_attention(i, j) over the *enabled* partners j.

    With mask=None or all-True this reduces exactly to the reference's
    CheapXAttn3 averaging (weargait_encoders.py:367-381); with a traced (K,)
    mask, disabled partners drop out of the average instead of contributing
    zero-filled attention — the shape-stable upgrade of the reference's
    zero-fill masking (weargait_train.py:355-382), no recompiles per subset.
    """
    k = len(streams)
    if mask is None:
        mask = jnp.ones((k,), bool)
    mask_f = mask.astype(streams[0].dtype)
    out = []
    for i in range(k):
        acc = jnp.zeros_like(streams[i])
        cnt = jnp.zeros((), streams[i].dtype)
        for j in range(k):
            if i == j:
                continue
            acc = acc + mask_f[j] * cheap_cross_attention(streams[i], streams[j])
            cnt = cnt + mask_f[j]
        out.append(acc / jnp.maximum(cnt, 1.0))
    return out
