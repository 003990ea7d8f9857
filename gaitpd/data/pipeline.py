"""Jit-compiled preprocessing graph: pad/trim, pelvis-centering, min-max /
z-score normalisation, and sliding-window segmentation.

These are the device-side equivalents of the reference's per-sample Python
loops (train/data_processing/dataloader_fbg_fog.py:24-121,
dataloader_weargait.py:181-274): each transform is a pure batched function so
the whole raw->window->normalise chain fuses into one XLA program and runs on
all samples of a fold at once (the "on-device windowed batching" of
BASELINE.json's north star).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MIN_STD_POSE = 1e-4  # reference dataloader_fbg_fog.py:20
MIN_STD_WG = 1e-6  # reference dataloader_weargait.py:28


# ---------------------------------------------------------------------------
# Host-side helpers (ragged raw sequences -> fixed arrays)
# ---------------------------------------------------------------------------


def pad_or_trim(seq: np.ndarray, target_len: int, pad_value: float = 0.0) -> np.ndarray:
    """End-pad or head-trim a (T, ...) sequence to exactly target_len frames.
    reference dataloader_fbg_fog.py:24-37."""
    length = seq.shape[0]
    if length == target_len:
        return seq
    if length > target_len:
        return seq[:target_len]
    pad = np.full((target_len - length, *seq.shape[1:]), pad_value, dtype=seq.dtype)
    return np.concatenate([seq, pad], axis=0)


def window_indices(n_frames: int, win: int, hop: int):
    """Strict full windows: [(wid, start, end)].
    reference dataloader_weargait.py:230-237."""
    out = []
    if n_frames <= 0 or n_frames < win:
        return out
    start, wid = 0, 0
    while start + win <= n_frames:
        out.append((wid, start, start + win))
        start += hop
        wid += 1
    return out


def window_stream_np(x: np.ndarray, win: int, hop: int) -> np.ndarray:
    """(T, C) -> (n_win, win, C) strict full windows, zero-copy strided view."""
    t = x.shape[0]
    n = 0 if t < win else (t - win) // hop + 1
    if n == 0:
        return np.zeros((0, win) + x.shape[1:], dtype=x.dtype)
    s0, s1 = x.strides[0], x.strides[1:]
    view = np.lib.stride_tricks.as_strided(
        x, shape=(n, win) + x.shape[1:], strides=(hop * s0, s0) + s1, writeable=False
    )
    return np.ascontiguousarray(view)


# ---------------------------------------------------------------------------
# Device-side batched transforms
# ---------------------------------------------------------------------------


def center_poses(poses: jnp.ndarray, root: int = 0) -> jnp.ndarray:
    """(N, T, J, 3) minus the root joint per frame.
    reference dataloader_fbg_fog.py:93-99."""
    return poses - poses[:, :, root : root + 1, :]


def minmax_poses(poses: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Per-sample min-max over (T, J) into [0, 1] per coordinate.
    reference dataloader_fbg_fog.py:107-113."""
    mins = jnp.min(poses, axis=(1, 2), keepdims=True)
    maxs = jnp.max(poses, axis=(1, 2), keepdims=True)
    return (poses - mins) / (maxs - mins + eps)


def zscore_poses(poses: jnp.ndarray, mean, std, min_std: float = MIN_STD_POSE):
    """Global z-score with small-std floor (reference dataloader_fbg_fog.py:114-119)."""
    std = jnp.where(std < min_std, 1.0, std)
    return (poses - mean) / std


def zscore(x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray, min_std: float = MIN_STD_WG):
    """Per-channel z-score with NaN guards matching reference
    dataloader_weargait.py:212-227: non-finite inputs -> train mean before the
    transform, std floored at MIN_STD, residual non-finites -> 0."""
    mean = jnp.where(jnp.isfinite(mean), mean, 0.0)
    std = jnp.where(jnp.isfinite(std) & (std > min_std), std, min_std)
    x = jnp.where(jnp.isfinite(x), x, mean)
    z = (x - mean) / std
    return jnp.where(jnp.isfinite(z), z, 0.0)


def fit_zscore_stats(x: jnp.ndarray, axis=0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NaN-aware per-channel mean/std over the given axis (the on-device
    analogue of reference fit_stats_on_train, dataloader_weargait.py:181-210)."""
    finite = jnp.isfinite(x)
    xf = jnp.where(finite, x, 0.0)
    n = jnp.maximum(jnp.sum(finite, axis=axis), 1)
    mean = jnp.sum(xf, axis=axis) / n
    var = jnp.sum(jnp.where(finite, (x - mean) ** 2, 0.0), axis=axis) / n
    std = jnp.maximum(jnp.sqrt(jnp.maximum(var, 0.0)), MIN_STD_WG)
    return mean, std


def window_stream(x: jnp.ndarray, win: int, hop: int) -> jnp.ndarray:
    """(T, C) -> (n_win, win, C) strict full windows; n_win is static given
    (T, win, hop) so this stays jit-friendly.

    Fast paths (profiled on v5e — a generic gather dominated the fused
    preproc+forward pipeline): hop == win is a pure reshape; win % hop == 0
    interleaves win//hop phase-shifted reshapes; only irregular hops fall
    back to the gather."""
    t = x.shape[0]
    n = 0 if t < win else (t - win) // hop + 1
    if n <= 0:
        return jnp.zeros((0, win) + x.shape[1:], x.dtype)
    if hop == win:
        return x[: n * win].reshape((n,) + (win,) + x.shape[1:])
    if win % hop == 0:
        # windows starting at phase j*hop come from the reshape of x[j*hop:]
        stride_groups = win // hop
        outs = []
        for j in range(stride_groups):
            xo = x[j * hop :]
            nj = (xo.shape[0]) // win
            outs.append(xo[: nj * win].reshape((nj, win) + x.shape[1:]))
        # interleave groups back into start-order
        max_nj = max(o.shape[0] for o in outs)
        padded = [
            jnp.pad(o, ((0, max_nj - o.shape[0]),) + ((0, 0),) * (o.ndim - 1))
            for o in outs
        ]
        inter = jnp.stack(padded, axis=1).reshape((-1, win) + x.shape[1:])
        return inter[:n]
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(win)[None, :]
    return x[idx]


def preprocess_and_window(
    x: jnp.ndarray, mean: jnp.ndarray, std: jnp.ndarray, win: int, hop: int
) -> jnp.ndarray:
    """The fused z-score + window stage of the north-star pipeline: one jit
    region from raw stream to model-ready windows."""
    return window_stream(zscore(x, mean, std), win, hop)
