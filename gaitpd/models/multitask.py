"""Multi-stream multitask models and pytree parameter partitions.

Replaces the reference's parameter-list accessors
(``get_shared_parameters`` / ``{walkway,insole,imu}_parameters``,
train/feature_encoder.py:256-265 and data/WearGait/weargait_encoders.py:159-189)
with *pytree masks over module-name prefixes* — the functional-JAX idiom the
gradient-surgery library (gaitpd.learning.mtl) consumes.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.traverse_util import flatten_dict, unflatten_dict

from gaitpd.models.blocks import TaskHead, flatten_features
from gaitpd.models.encoders import (
    IMUEncoderShallow,
    InsoleEncoderDeep,
    SensorEncoder,
    SharedBackbone,
    SkeletonMLP,
    WalkwayEncoder,
)

# ---------------------------------------------------------------------------
# Pytree partition helpers
# ---------------------------------------------------------------------------


def module_mask(params: Dict[str, Any], module_names: Sequence[str]):
    """Boolean pytree: True on leaves under any of the given top-level
    submodule names of the variable dict ({'params': {name: ...}})."""
    names = set(module_names)
    flat = flatten_dict(params)
    out = {}
    for path, leaf in flat.items():
        # path like ('params', 'backbone', 'Conv1dSame_0', 'Conv_0', 'kernel')
        top = path[1] if path[0] == "params" and len(path) > 1 else path[0]
        out[path] = top in names
    return unflatten_dict(out)


def mask_tree(tree, mask):
    """Zero out leaves where mask is False."""
    return jax.tree_util.tree_map(
        lambda x, m: x if m else jnp.zeros_like(x), tree, mask
    )


def combine_by_mask(a, b, mask):
    """Take leaves of ``a`` where mask is True, else leaves of ``b``."""
    return jax.tree_util.tree_map(lambda xa, xb, m: xa if m else xb, a, b, mask)


# ---------------------------------------------------------------------------
# FBG/FoG two-modality multitask model
# ---------------------------------------------------------------------------


class MultiModalMultiTask(nn.Module):
    """Skeleton + sensor dual-branch model with a weight-shared backbone.

    reference train/feature_encoder.py:149-265. Sync mode uses a single
    shared head applied to both streams; async mode has per-branch heads.
    Returns (logits_skel, logits_sens).
    """

    skeleton_output_dim: int
    sensor_out_channels: int
    sensor_length: int
    pose_length: int = 101
    shared_out_channels: int = 16
    backbone_dim: int = 8
    num_classes: int = 3
    use_norm: bool = False
    use_cosine: bool = False
    synchronized_loading: bool = False

    def setup(self):
        self.skeleton_encoder = SkeletonMLP(self.skeleton_output_dim)
        self.sensor_encoder = SensorEncoder(
            self.sensor_out_channels,
            sensor_length=self.sensor_length,
            output_length=self.pose_length,
        )
        self.backbone = SharedBackbone(self.shared_out_channels, self.backbone_dim)
        head = lambda: TaskHead(  # noqa: E731
            self.num_classes, use_norm=self.use_norm, use_cosine=self.use_cosine
        )
        if self.synchronized_loading:
            self.task_head_shared = head()
        else:
            self.task_head_skel = head()
            self.task_head_sensor = head()

    def __call__(self, x_skel: jnp.ndarray, x_sensor: jnp.ndarray):
        skel_repr = flatten_features(self.backbone(self.skeleton_encoder(x_skel)))
        sens_repr = flatten_features(self.backbone(self.sensor_encoder(x_sensor)))
        if self.synchronized_loading:
            return self.task_head_shared(skel_repr), self.task_head_shared(sens_repr)
        return self.task_head_skel(skel_repr), self.task_head_sensor(sens_repr)

    # --- partition metadata (consumed by gaitpd.learning.mtl) -------------
    @property
    def shared_modules(self) -> Tuple[str, ...]:
        """reference train/feature_encoder.py:256-265."""
        if self.synchronized_loading:
            return ("backbone", "task_head_shared")
        return ("backbone",)

    @property
    def task_modules(self) -> Tuple[Tuple[str, ...], ...]:
        """Private module groups per task (skeleton, sensor)."""
        if self.synchronized_loading:
            return (("skeleton_encoder",), ("sensor_encoder",))
        return (
            ("skeleton_encoder", "task_head_skel"),
            ("sensor_encoder", "task_head_sensor"),
        )


class SensorModalityModel(nn.Module):
    """Sensor-only stack. reference train/feature_encoder.py:268-305."""

    sensor_out_channels: int
    sensor_length: int
    pose_length: int = 101
    shared_out_channels: int = 16
    backbone_dim: int = 8
    num_classes: int = 3
    use_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = SensorEncoder(
            self.sensor_out_channels,
            sensor_length=self.sensor_length,
            output_length=self.pose_length,
            name="encoder",
        )(x)
        rep = flatten_features(
            SharedBackbone(self.shared_out_channels, self.backbone_dim, name="backbone")(feat)
        )
        return TaskHead(self.num_classes, use_norm=self.use_norm, name="task_head")(rep)


class SkelModalityModel(nn.Module):
    """Skeleton-only stack. reference train/feature_encoder.py:308-344."""

    skeleton_output_dim: int
    shared_out_channels: int = 16
    backbone_dim: int = 8
    num_classes: int = 3
    use_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        feat = SkeletonMLP(self.skeleton_output_dim, name="encoder")(x)
        rep = flatten_features(
            SharedBackbone(self.shared_out_channels, self.backbone_dim, name="backbone")(feat)
        )
        return TaskHead(self.num_classes, use_norm=self.use_norm, name="task_head")(rep)


# ---------------------------------------------------------------------------
# WearGait three-modality model
# ---------------------------------------------------------------------------


class WearGaitThreeModal(nn.Module):
    """Walkway / insole / IMU branches over one shared backbone.

    reference data/WearGait/weargait_encoders.py:116-189. The relaxed-input
    behaviour (any subset of sensors masked) is handled by the caller zeroing
    streams / selecting heads with a traced (3,) mask operand — the model
    itself is shape-stable across all 7 subsets.
    Returns (logits_walkway, logits_insole, logits_imu).
    """

    enc_out_ch: int = 12
    backbone_dim: int = 8
    shared_out_ch: int = 16
    num_classes: int = 2
    use_norm: bool = False
    use_cosine: bool = False
    synchronized: bool = True
    pool_len: Optional[int] = None

    def setup(self):
        self.enc_w = WalkwayEncoder(self.enc_out_ch)
        self.enc_i = InsoleEncoderDeep(
            self.enc_out_ch, hidden_ch=self.enc_out_ch * 2, pool_len=self.pool_len
        )
        self.enc_m = IMUEncoderShallow(self.enc_out_ch, pool_len=self.pool_len)
        self.backbone = SharedBackbone(self.shared_out_ch, self.backbone_dim)
        head = lambda: TaskHead(  # noqa: E731
            self.num_classes, use_norm=self.use_norm, use_cosine=self.use_cosine
        )
        if self.synchronized:
            self.head_shared = head()
        else:
            self.head_w = head()
            self.head_i = head()
            self.head_m = head()

    def _stream(self, x, enc):
        return flatten_features(self.backbone(enc(x)))

    def __call__(self, x_walk, x_insole, x_imu):
        fw = self._stream(x_walk, self.enc_w)
        fi = self._stream(x_insole, self.enc_i)
        fm = self._stream(x_imu, self.enc_m)
        if self.synchronized:
            return self.head_shared(fw), self.head_shared(fi), self.head_shared(fm)
        return self.head_w(fw), self.head_i(fi), self.head_m(fm)

    def forward_single(self, x, mod: str):
        """Run one branch only (single-modality baseline path,
        reference train/weargait_train.py:252-271)."""
        enc = {"walkway": self.enc_w, "insole": self.enc_i, "imu": self.enc_m}[mod]
        rep = self._stream(x, enc)
        if self.synchronized:
            return self.head_shared(rep)
        head = {"walkway": self.head_w, "insole": self.head_i, "imu": self.head_m}[mod]
        return head(rep)

    @property
    def shared_modules(self) -> Tuple[str, ...]:
        """reference data/WearGait/weargait_encoders.py:185-189."""
        if self.synchronized:
            return ("backbone", "head_shared")
        return ("backbone",)

    @property
    def task_modules(self) -> Tuple[Tuple[str, ...], ...]:
        """reference data/WearGait/weargait_encoders.py:159-183."""
        if self.synchronized:
            return (("enc_w",), ("enc_i",), ("enc_m",))
        return (("enc_w", "head_w"), ("enc_i", "head_i"), ("enc_m", "head_m"))
