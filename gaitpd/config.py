"""Typed configuration registry for the gaitpd-tpu framework.

Replaces the reference's four drifting hyperparameter dicts with one typed
registry (reference: train/configs.py:1-70, train/baselines/fusion_train.py:21-50,
train/baselines/focal_train.py:17-26, train/baselines/deepav_train.py:21-24,
train/baselines/taca_train.py:17-20) plus the WearGait CLI defaults
(train/weargait_train.py:648-691).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelDims:
    """Static shape/architecture parameters of the 2-modality FBG/FoG stack.

    Mirrors the keys of FBG_FOG_PARAMS (reference train/configs.py:1-32) and
    MODEL_KEYS (train/configs.py:60-70).
    """

    pose_length: int
    skeleton_input_dim: int
    skeleton_output_dim: int
    sensor_in_channels: int
    sensor_out_channels: int
    sensor_length: int
    shared_out_channels: int = 16
    backbone_dim: int = 8
    num_classes: int = 3

    @property
    def taskhead_input_dim(self) -> int:
        return self.shared_out_channels * self.backbone_dim


@dataclasses.dataclass(frozen=True)
class TrainParams:
    """Optimization hyperparameters (reference train/configs.py:12-15 and
    train/fbg_fog_train.py:288,299)."""

    learning_rate: float = 1e-3
    epochs: int = 50
    batch_size: int = 256
    momentum: float = 0.9
    weight_decay: float = 1e-4
    patience: int = 100


FBG = ModelDims(
    pose_length=101,
    skeleton_input_dim=51,
    skeleton_output_dim=3,
    sensor_in_channels=3,
    sensor_out_channels=3,
    sensor_length=65,
    num_classes=3,
)

FOG = ModelDims(
    pose_length=101,
    skeleton_input_dim=21,
    skeleton_output_dim=6,
    sensor_in_channels=6,
    sensor_out_channels=6,
    sensor_length=426,
    num_classes=3,
)

FBG_FOG_DIMS = {"fbg": FBG, "fog": FOG}
FBG_FOG_TRAIN = {
    "fbg": TrainParams(),
    "fog": TrainParams(),
}

# Backward-compatible dataset name aliasing (reference train/configs.py:34-47).
DATASET_ALIASES = {
    "fbg": "fbg",
    "fog": "fog",
    "weargait": "weargait",
    "walk": "fbg",
    "turn": "fog",
}

RAW_READER_DATASET = {"fbg": "walk", "fog": "turn", "weargait": "weargait"}


def normalize_dataset_name(dataset: str) -> str:
    """reference train/configs.py:50-54."""
    try:
        return DATASET_ALIASES[dataset.lower()]
    except KeyError as exc:
        raise ValueError(f"Unknown dataset: {dataset}") from exc


def raw_reader_dataset_name(dataset: str) -> str:
    """reference train/configs.py:57-58."""
    return RAW_READER_DATASET[normalize_dataset_name(dataset)]


@dataclasses.dataclass(frozen=True)
class WearGaitConfig:
    """WearGait 3-stream experiment config (reference train/weargait_train.py:648-691
    CLI defaults and data_processing/dataloader_weargait.py:26-48 channel sets)."""

    n_folds: int = 10
    test_per_class: int = 8
    win_len: int = 64
    hop_len: int = 64
    batch_size: int = 64
    epochs: int = 50
    patience: int = 50
    num_classes: int = 2
    lr: float = 1e-3
    momentum: float = 0.9
    weight_decay: float = 1e-4
    enc_out_ch: int = 12
    backbone_dim: int = 8
    shared_out_ch: int = 16
    proj_ch: int = 16
    walkway_channels: int = 2
    insole_channels: int = 13
    imu_channels: int = 24

    @property
    def modal_dims(self) -> dict:
        return {
            "walkway": self.walkway_channels,
            "insole": self.insole_channels,
            "imu": self.imu_channels,
        }


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """Imbalance-loss hyperparameters (reference train/fbg_fog_train.py:450-459)."""

    wm: str = "gcl"  # ce | class_wt | ldam | gcl
    ldam_s: float = 30.0
    ldam_m: float = 0.5
    gcl_m: float = 0.2
    gcl_s: float = 25.0
    noise_mul: float = 0.0
    drw_warmup: int = 0
    consistency_lambda: float = 1.0
    label_smoothing: float = 0.1


@dataclasses.dataclass(frozen=True)
class MTLConfig:
    """Gradient-surgery config (reference train/fbg_fog_train.py:289,452-453)."""

    method: str = "cagrad"  # any key of gaitpd.learning.mtl.METHODS, or "none"
    alpha: float = 0.1  # CAGrad c; 0 disables
    max_norm: float = 1.0
    # "sum" (fbg driver semantics: private grads get the plain multi-task sum,
    # reference multitask_weighting.py:680-688) or "sum_plus_own" (weargait
    # driver adds each stream's own-loss grad on top of that sum,
    # reference weargait_train.py:217-242).
    private_grads: str = "sum"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for data-parallel execution (framework-new; the
    reference is single-GPU, see SURVEY.md section 2.5)."""

    data_axis: str = "data"
    n_devices: Optional[int] = None  # None = all available


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    dataset: str = "fog"
    modality: str = "multimodal"  # skeleton | sensor | multimodal
    synchronized_loading: bool = False
    seed: int = 43
    loss: LossConfig = dataclasses.field(default_factory=LossConfig)
    mtl: MTLConfig = dataclasses.field(default_factory=MTLConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
