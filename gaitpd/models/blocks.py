"""Core TPU-native building blocks shared by every gaitpd model.

Design notes (TPU-first, not a torch translation):

* Temporal convolutions are expressed through ``lax.conv_general_dilated`` in
  NWC layout so XLA tiles them straight onto the MXU; for the tiny channel
  counts used here XLA fuses the surrounding elementwise ops into the conv.
* PyTorch's AdaptiveAvgPool1d (used throughout the reference, e.g.
  train/feature_encoder.py:49,101) is data-independent once (T_in, T_out) are
  known, so we lower it to a *constant pooling matrix* and a single matmul —
  one MXU op instead of a gather/segment-reduce, and exactly equal to the
  torch semantics (bin i averages frames [floor(i*T/out), ceil((i+1)*T/out))).
* Parameter initialisers mirror torch's ``kaiming_uniform_(a=sqrt(5))``
  defaults (uniform(-1/sqrt(fan_in), +1/sqrt(fan_in)) for both kernel and
  bias) so training dynamics stay within the ±1% parity target even though
  bit-level RNG equality is a non-goal.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# ---------------------------------------------------------------------------
# Initialisers (torch-parity scales)
# ---------------------------------------------------------------------------


def torch_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear/Conv1d default scale.

    flax Dense kernels are (in, out): fan_in = shape[0].
    Conv kernels (via nn.Conv) are (K, in, out): fan_in = K * shape[-2].
    """
    receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
    fan_in = receptive * shape[-2] if len(shape) >= 2 else shape[0]
    bound = 1.0 / np.sqrt(max(1, fan_in))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / np.sqrt(max(1, fan_in))

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def xavier_uniform_init(key, shape, dtype=jnp.float32):
    return nn.initializers.xavier_uniform()(key, shape, dtype)


# ---------------------------------------------------------------------------
# Adaptive average pooling as a constant matmul
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def adaptive_avg_pool_matrix(t_in: int, t_out: int) -> np.ndarray:
    """(t_in, t_out) matrix P with x_pooled = x^T P matching
    torch.nn.AdaptiveAvgPool1d semantics (bins [floor(i*T/out), ceil((i+1)*T/out)))."""
    p = np.zeros((t_in, t_out), dtype=np.float32)
    for i in range(t_out):
        start = (i * t_in) // t_out
        end = -(-((i + 1) * t_in) // t_out)  # ceil
        p[start:end, i] = 1.0 / (end - start)
    return p


def adaptive_avg_pool1d(x: jnp.ndarray, t_out: int) -> jnp.ndarray:
    """x: (B, T, C) -> (B, t_out, C) via one einsum (MXU-friendly).

    HIGHEST precision: on TPU the MXU would otherwise run this in bf16 and
    an *averaging* op must not lose mantissa bits (parity with torch's f32
    AdaptiveAvgPool1d is asserted in tests/test_blocks.py)."""
    t_in = x.shape[1]
    p = jnp.asarray(adaptive_avg_pool_matrix(t_in, t_out))
    return jnp.einsum("btc,to->boc", x, p, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


class Conv1dSame(nn.Module):
    """Conv1d(kernel, stride=1, padding=same) in NWC layout.

    Equivalent of the reference's nn.Conv1d(k=3, padding=1) blocks
    (train/feature_encoder.py:42-48,93-99) but laid out time-major so XLA
    feeds the MXU without transposes.
    """

    features: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.kernel_size * x.shape[-1]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class TorchLinear(nn.Module):
    """Dense layer with torch-default init scales."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=torch_kernel_init,
            bias_init=torch_bias_init(fan_in),
        )(x)


class CosineLinear(nn.Module):
    """Normalised cosine classifier for GCL heads.

    reference train/feature_encoder.py:7-24 — L2-normalise features and class
    weights, clamp the cosine to (-1+eps, 1-eps).
    """

    features: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "weight", xavier_uniform_init, (x.shape[-1], self.features), jnp.float32
        )
        # torch F.normalize uses max(norm, eps) in the denominator.
        x_norm = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), self.eps
        )
        w_norm = w / jnp.maximum(jnp.linalg.norm(w, axis=0, keepdims=True), self.eps)
        cos = x_norm @ w_norm
        return jnp.clip(cos, -1.0 + self.eps, 1.0 - self.eps)


class TaskHead(nn.Module):
    """Classification head: plain Linear (CE), LayerNorm+Linear (LDAM) or
    LayerNorm+CosineLinear (GCL). reference train/feature_encoder.py:112-146."""

    num_classes: int
    use_norm: bool = False
    use_cosine: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_norm or self.use_cosine:
            x = nn.LayerNorm(epsilon=1e-5)(x)
        if self.use_cosine:
            return CosineLinear(self.num_classes)(x)
        return TorchLinear(self.num_classes)(x)


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    """Exact (erf) GELU, matching torch nn.GELU default."""
    return nn.gelu(x, approximate=False)


def flatten_features(x: jnp.ndarray) -> jnp.ndarray:
    """(B, bdim, C) -> (B, bdim*C), matching torch .flatten(1) on the
    backbone output (reference train/feature_encoder.py:237-238)."""
    return x.reshape(x.shape[0], -1)


def flatten_skel(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, J, C) -> (B, T, J*C); passthrough for 3-D inputs.
    reference train/utilities.py:28-32."""
    if x.ndim == 4:
        b, t, j, c = x.shape
        return x.reshape(b, t, j * c)
    return x
