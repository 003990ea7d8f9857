"""Per-modality encoders and the shared temporal backbone.

Functionally equivalent to the reference encoder library
(train/feature_encoder.py:27-109 for FBG/FoG and
data/WearGait/weargait_encoders.py:40-113 for WearGait), re-expressed
time-major (NWC) so every conv + pool lowers to MXU matmuls with no
permutes, and with pooling as a constant-matrix matmul (see blocks.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gaitpd.models.blocks import (
    Conv1dSame,
    TorchLinear,
    adaptive_avg_pool1d,
    gelu,
)


class SensorEncoder(nn.Module):
    """Conv1d(k3, same) + conditional AdaptiveAvgPool1d(output_length).

    reference train/feature_encoder.py:27-58. The reference pools only when
    the runtime length equals ``sensor_length`` (a data-shape-dependent Python
    branch); with static shapes under jit this resolves at trace time.
    """

    out_channels: int
    sensor_length: Optional[int] = None
    output_length: int = 101

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, C_in)
        x = Conv1dSame(self.out_channels, kernel_size=3)(x)
        if x.shape[1] == self.sensor_length:
            x = adaptive_avg_pool1d(x, self.output_length)
        return x  # (B, T_out, C_out)


class SkeletonMLP(nn.Module):
    """Linear -> LayerNorm -> ReLU over each frame.
    reference train/feature_encoder.py:61-77."""

    output_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, T, D_in)
        h = TorchLinear(self.output_dim)(x)
        h = nn.LayerNorm(epsilon=1e-5)(h)
        return nn.relu(h)


class SharedBackbone(nn.Module):
    """Conv1d(k3) -> ReLU -> AdaptiveAvgPool1d(bdim); (B,T,C) -> (B,bdim,C_out).
    reference train/feature_encoder.py:80-109."""

    shared_out_channels: int = 16
    backbone_dim: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv1dSame(self.shared_out_channels, kernel_size=3)(x)
        x = nn.relu(x)
        return adaptive_avg_pool1d(x, self.backbone_dim)


class GELUBackbone(nn.Module):
    """Conv1d(k3) -> GELU -> AdaptiveAvgPool1d(bdim), the FOCAL-local backbone
    variant. reference train/baselines/architectures/focal.py:161-173."""

    shared_out_channels: int = 16
    backbone_dim: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = Conv1dSame(self.shared_out_channels, kernel_size=3)(x)
        x = gelu(x)
        return adaptive_avg_pool1d(x, self.backbone_dim)


# ---------------------------------------------------------------------------
# WearGait per-stream encoders (data/WearGait/weargait_encoders.py:40-101)
# ---------------------------------------------------------------------------


class WalkwayEncoder(nn.Module):
    """(B,64,2) -> (B,64,out_ch): Conv1d k3 + GELU + LayerNorm.
    reference data/WearGait/weargait_encoders.py:40-52."""

    out_ch: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = gelu(Conv1dSame(self.out_ch, kernel_size=3)(x))
        return nn.LayerNorm(epsilon=1e-5)(x)


class IMUEncoderShallow(nn.Module):
    """(B,T,24) -> (B,T',out_ch): Conv1d k3 + GELU [+ pool] + LayerNorm.
    reference data/WearGait/weargait_encoders.py:54-69."""

    out_ch: int
    pool_len: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = gelu(Conv1dSame(self.out_ch, kernel_size=3)(x))
        if self.pool_len:
            x = adaptive_avg_pool1d(x, self.pool_len)
        return nn.LayerNorm(epsilon=1e-5)(x)


class InsoleEncoderDeep(nn.Module):
    """Two conv blocks (k5 then k3) with a 1x1 residual projection.
    reference data/WearGait/weargait_encoders.py:71-101."""

    out_ch: int
    hidden_ch: Optional[int] = None
    pool_len: Optional[int] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h_ch = self.hidden_ch or max(self.out_ch, 2 * self.out_ch)
        h = gelu(Conv1dSame(h_ch, kernel_size=5)(x))
        y = Conv1dSame(self.out_ch, kernel_size=3)(h)
        skip = h if h_ch == self.out_ch else Conv1dSame(self.out_ch, kernel_size=1)(h)
        y = gelu(y + skip)
        if self.pool_len:
            y = adaptive_avg_pool1d(y, self.pool_len)
        return nn.LayerNorm(epsilon=1e-5)(y)
