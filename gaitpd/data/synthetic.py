"""Synthetic dataset generators exposing the same reader interfaces as the
real raw readers, for tests / CPU-runnable end-to-end configs
(BASELINE.json "small CPU-runnable split") and benchmarking.

The reference readers' interfaces being mimicked:
  * FBG  PDReader: pose_dict (key "SUBxx_on_walk_i" -> (T,17,3)), sensor_dict
    (key "SUBxx_on" -> (101, n_trials, 3)), pose_label_dict ("SUBxx_on" ->
    0..2), sensor_label_dict, metadata_dict
    (train/data_processing/preprocess_fbg.py:7-149);
  * FoG  pdfeReader: pose_dict ("SUBxx_i" -> (T,7,3)), sensor_dict
    ("SUBxx_i" -> (~426,6)), labels_dict ("SUBxx" -> [label]*n)
    (train/data_processing/preprocess_fog.py:6-208);
  * WearGait 30 Hz per-subject streams: walkway (T,2), insole (T,13),
    imu (T,24) (train/data_processing/preprocess_weargait.py:225-343).

Class signal: each class shifts the stream mean and oscillation frequency so
small models can genuinely learn (loss decreases, accuracy above chance) —
used by the end-to-end tests (SURVEY.md §4(e)).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np


def _signal(
    rng, t: int, c: int, label: int, strength: float = 1.0,
    per_channel: bool = False,
) -> np.ndarray:
    """per_channel=False (default): the class wave/offset is COMMON-MODE
    across channels. For pose streams this means the reference's own
    preprocessing deletes it: center_poses subtracts the root joint per
    frame (dataloader_fbg_fog.py:93-99), and a signal identical on every
    joint cancels exactly — skeleton branches then train on pure noise
    (measured: skeleton-only accuracies are bit-invariant to `strength`).
    per_channel=True applies a CLASS-DETERMINISTIC per-channel gain pattern
    so the class signal SURVIVES root-joint centering (relative inter-joint
    differences remain) AND generalizes across segments/subjects (a
    per-segment random pattern would not). The pattern comes from its own
    seeded rng, so the main stream's draws are identical with the flag on
    or off — default False keeps every committed parity artifact
    bit-reproducible."""
    base = rng.normal(0.0, 1.0, size=(t, c)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi)
    freq = 0.05 * (1 + label)
    wave = np.sin(2 * np.pi * freq * np.arange(t) + phase)[:, None]
    if per_channel:
        amp = np.random.default_rng(9700 + label).uniform(
            0.5, 1.5, size=(1, c)
        ).astype(np.float32)
        return base + strength * amp * (wave + 0.5 * label)
    return base + strength * (wave + 0.5 * label)


@dataclasses.dataclass
class SyntheticFoGReader:
    """Matches the attribute surface of pdfeReader the loaders consume
    (incl. sensor_length, preprocess_fog.py:210-217)."""

    pose_dict: Dict[str, np.ndarray]
    sensor_dict: Dict[str, np.ndarray]
    labels_dict: Dict[str, List[int]]
    sensor_length: int = 426


def make_fog_reader(
    n_subjects: int = 9,
    segments: int = 4,
    n_classes: int = 3,
    pose_t: int = 101,
    sensor_t: int = 426,
    seed: int = 0,
    strength: float = 1.0,
    class_skew: bool = True,
    pose_per_joint: bool = False,
) -> SyntheticFoGReader:
    """class_skew gives lower classes more segments per subject (like the real
    datasets' class imbalance). This matters for parity checks: the
    reference's GCLLoss divides by m_list.max() unguarded
    (classification_losses.py:104) and NaNs out on EXACTLY balanced class
    counts, so balanced synthetic data silently breaks its wm=gcl path.
    pose_per_joint gives the pose class signal per-joint gains so it
    survives the reference's root-joint centering (see _signal)."""
    rng = np.random.default_rng(seed)
    pose_dict, sensor_dict, labels = {}, {}, {}
    for s in range(n_subjects):
        sid = f"SUB{s:02d}"
        label = s % n_classes
        n_seg = segments + (n_classes - 1 - label if class_skew else 0)
        labels[sid] = [label] * n_seg
        for i in range(n_seg):
            pose = _signal(rng, pose_t, 21, label, strength,
                           per_channel=pose_per_joint).reshape(pose_t, 7, 3)
            pose_dict[f"{sid}_{i}"] = pose
            sensor_dict[f"{sid}_{i}"] = _signal(rng, sensor_t, 6, label, strength)
    return SyntheticFoGReader(pose_dict, sensor_dict, labels, sensor_length=sensor_t)


@dataclasses.dataclass
class SyntheticFBGReader:
    """Matches the attribute surface of PDReader the loaders consume."""

    pose_dict: Dict[str, np.ndarray]
    sensor_dict: Dict[str, np.ndarray]
    pose_label_dict: Dict[str, int]
    sensor_label_dict: Dict[str, int]
    metadata_dict: Dict[str, np.ndarray]


def make_fbg_reader(
    n_subjects: int = 9,
    n_classes: int = 3,
    walks: int = 3,
    trials: int = 4,
    pose_t: int = 101,
    grf_t: int = 101,
    seed: int = 0,
    strength: float = 1.0,
    class_skew: bool = True,
    pose_per_joint: bool = False,
) -> SyntheticFBGReader:
    """class_skew: see make_fog_reader — imbalanced per-class walk/trial
    counts keep the reference's GCL loss non-degenerate. pose_per_joint:
    see make_fog_reader/_signal (the FBG pose stream is root-joint-centered
    by the same reference preprocessing)."""
    rng = np.random.default_rng(seed)
    pose_dict, sensor_dict = {}, {}
    pose_labels, sensor_labels, meta = {}, {}, {}
    for s in range(n_subjects):
        sid = f"SUB{s:02d}_on"
        label = s % n_classes
        skew = n_classes - 1 - label if class_skew else 0
        pose_labels[sid] = label
        sensor_labels[sid] = label
        meta[sid] = rng.uniform(0, 1, size=4).astype(np.float32)
        for w in range(walks + skew):
            pose = _signal(rng, pose_t, 51, label, strength,
                           per_channel=pose_per_joint).reshape(pose_t, 17, 3)
            pose_dict[f"{sid}_walk_{w}"] = pose
        # GRF: (101, n_trials, 3) 3-D arrays split per trial by the loader
        # (reference extract_grf_data shape; the loaders trim to length 65)
        sensor_dict[sid] = np.stack(
            [
                _signal(rng, grf_t, 3, label, strength)
                for _ in range(trials + skew)
            ],
            axis=1,
        )
    return SyntheticFBGReader(pose_dict, sensor_dict, pose_labels, sensor_labels, meta)


def make_weargait_streams(
    n_pd: int = 12,
    n_hc: int = 12,
    t_frames: int = 400,
    seed: int = 0,
    tie_free: bool = False,
    strength: float = 0.8,
) -> Tuple[Dict[str, Dict[str, np.ndarray]], List[str], List[str]]:
    """Per-subject {walkway (T,2), insole (T,13), imu (T,24)} streams with a
    PD-vs-HC separable signal; NaNs sprinkled into insole/imu to exercise the
    NaN guards of the pipeline (reference dataloader_weargait.py:212-227).

    tie_free: draw PD and HC stream lengths from DISJOINT ranges (PD strictly
    longer) so per-class train window counts can never tie in any fold with
    equal subjects per class. The reference's GCLLoss divides by
    m_list.max() (classification_losses.py:83-85,102), which is 0/0=NaN when
    class counts tie exactly — tie-free data keeps the oracle finite without
    touching its loss (VERDICT r2 item 8)."""
    rng = np.random.default_rng(seed)
    streams = {}
    pd_ids = [f"PD{i:03d}" for i in range(n_pd)]
    hc_ids = [f"HC{i:03d}" for i in range(n_hc)]
    for sid in pd_ids + hc_ids:
        label = 1 if sid.startswith("PD") else 0
        if tie_free:
            lo, hi = (40, 90) if label == 1 else (-90, -40)
            t = t_frames + int(rng.integers(lo, hi))
        else:
            t = t_frames + int(rng.integers(-50, 50))
        sub = {
            "walkway": _signal(rng, t, 2, label, strength=strength),
            "insole": _signal(rng, t, 13, label, strength=strength),
            "imu": _signal(rng, t, 24, label, strength=strength),
        }
        # sprinkle NaNs (~0.5%) into insole/imu like real sensor dropouts
        for m in ("insole", "imu"):
            mask = rng.uniform(size=sub[m].shape) < 0.005
            sub[m] = sub[m].copy()
            sub[m][mask] = np.nan
        streams[sid] = sub
    return streams, pd_ids, hc_ids
