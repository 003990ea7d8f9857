"""Skeleton topology and pose-sequence augmentation library.

reference train/data_processing/common.py:7-418, redesigned as *batched,
PRNG-keyed jax transforms*: each augmentation maps a (N, T, J, 3) stack and
one key to a new stack, so a whole reader's worth of sequences is augmented
in one fused XLA program (vs. the reference's per-sequence numpy/torch loops)
and results are reproducible from the key alone.

Also includes the reader-level augmentation orchestrator
(reference PoseSequenceAugmentation, common.py:276-385) and the AMB-ID
helpers (:388-418).
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# H36M 17-joint topology (reference common.py:7-44)
H36M_FULL = {
    "B.TORSO": 0, "L.HIP": 1, "L.KNEE": 2, "L.FOOT": 3,
    "R.HIP": 4, "R.KNEE": 5, "R.FOOT": 6,
    "C.TORSO": 7, "U.TORSO": 8, "NECK": 9, "HEAD": 10,
    "R.SHOULDER": 11, "R.ELBOW": 12, "R.HAND": 13,
    "L.SHOULDER": 14, "L.ELBOW": 15, "L.HAND": 16,
}

H36M_CONNECTIONS_FULL = {
    (0, 1), (0, 4), (4, 5), (5, 6), (1, 2), (2, 3), (0, 7), (7, 8),
    (8, 14), (14, 15), (15, 16), (8, 11), (11, 12), (12, 13), (8, 9), (9, 10),
}

# mirror pairs in H36M order (reference common.py:103-104)
H36M_LEFT = (14, 15, 16, 1, 2, 3)
H36M_RIGHT = (11, 12, 13, 4, 5, 6)


def _import_jax():
    import jax
    import jax.numpy as jnp

    return jax, jnp


# ---------------------------------------------------------------------------
# Batched sample-level transforms (reference common.py:93-273)
# ---------------------------------------------------------------------------


def mirror_reflection(x, left=H36M_LEFT, right=H36M_RIGHT):
    """Horizontal flip: negate x-coordinate and swap left/right joint sets.
    reference MirrorReflection (common.py:93-129). x: (..., J, C).
    Skeletons with fewer joints than the pair indices (e.g. the 7-keypoint
    FoG poses) only get the coordinate flip."""
    _, jnp = _import_jax()
    x = jnp.asarray(x)
    x = x.at[..., 0].multiply(-1.0)
    j = x.shape[-2]
    if max(max(left), max(right)) >= j:
        return x
    perm = np.arange(j)
    perm[list(left)] = right
    perm[list(right)] = left
    return x[..., perm, :]


def rotation_matrix_3d(angles_deg):
    """Rz @ Ry @ Rx from per-axis degree angles (reference common.py:371-385)."""
    _, jnp = _import_jax()
    a, b, g = jnp.radians(jnp.asarray(angles_deg))
    rx = jnp.array(
        [[1, 0, 0], [0, jnp.cos(a), -jnp.sin(a)], [0, jnp.sin(a), jnp.cos(a)]]
    )
    ry = jnp.array(
        [[jnp.cos(b), 0, jnp.sin(b)], [0, 1, 0], [-jnp.sin(b), 0, jnp.cos(b)]]
    )
    rz = jnp.array(
        [[jnp.cos(g), -jnp.sin(g), 0], [jnp.sin(g), jnp.cos(g), 0], [0, 0, 1]]
    )
    return rz @ ry @ rx


def random_rotation(x, key, min_deg: float, max_deg: float, per_sample: bool = True):
    """Random 3-D rotation; the reference draws a full-strength angle on one
    random main axis and 1/10-strength on the others
    (RandomRotation, common.py:183-201). x: (N, T, J, 3)."""
    jax, jnp = _import_jax()
    x = jnp.asarray(x)
    n = x.shape[0] if per_sample else 1
    k_axis, k_main, k_rest = jax.random.split(key, 3)
    main_axis = jax.random.randint(k_axis, (n,), 0, 3)
    full = jax.random.uniform(k_main, (n,), minval=min_deg, maxval=max_deg)
    rest = jax.random.uniform(
        k_rest, (n, 3), minval=min_deg / 10.0, maxval=max_deg / 10.0
    )
    angles = jnp.where(
        jax.nn.one_hot(main_axis, 3, dtype=bool), full[:, None], rest
    )
    rots = jax.vmap(rotation_matrix_3d)(angles)  # (n, 3, 3)
    if not per_sample:
        rots = jnp.broadcast_to(rots, (x.shape[0], 3, 3))
    return jnp.einsum("ntjc,ncd->ntjd", x, rots)


def random_noise(x, key, mean: float = 0.0, std: float = 0.01):
    """Additive gaussian jitter (RandomNoise, common.py:210-230)."""
    jax, jnp = _import_jax()
    x = jnp.asarray(x)
    return x + mean + std * jax.random.normal(key, x.shape, x.dtype)


def axis_mask(x, key):
    """Zero out one random coordinate axis per sample
    (axis_mask, common.py:233-273). x: (N, T, J, C)."""
    jax, jnp = _import_jax()
    x = jnp.asarray(x)
    c = x.shape[-1]
    axis = jax.random.randint(key, (x.shape[0],), 0, c)
    keep = 1.0 - jax.nn.one_hot(axis, c, dtype=x.dtype)  # (N, C)
    return x * keep[:, None, None, :]


def joint_dropout(x, key, dropout_prob: float):
    """Drop whole joints with probability p (PoseSequenceAugmentation
    .joint_dropout, common.py:338-342)."""
    jax, jnp = _import_jax()
    x = jnp.asarray(x)
    keep = jax.random.bernoulli(key, 1.0 - dropout_prob, (x.shape[0], x.shape[2]))
    return x * keep[:, None, :, None].astype(x.dtype)


def random_translation(x, key, translation_range: Tuple[float, float]):
    """Global translation per sample (common.py:350-355)."""
    jax, jnp = _import_jax()
    x = jnp.asarray(x)
    t = jax.random.uniform(
        key, (x.shape[0], 1, 1, x.shape[-1]),
        minval=translation_range[0], maxval=translation_range[1],
    )
    return x + t


# ---------------------------------------------------------------------------
# In-step on-device augmentation stage (framework-new; the reference defines
# these transforms in common.py:93-273 but never wires them into a driver —
# here they run INSIDE the jitted epoch scan with per-step PRNG keys)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AugmentSpec:
    """Static structure of the augmentation stage for one input stream.

    Only the *structure* (which transforms exist, and the joint count that
    lets a flattened (B, T, J*3) skeleton stream be reshaped for the spatial
    ops) is trace-time; strengths/probabilities are traced f32 operands (see
    train/step.py::make_loss_ctx aug_params), so sweeping them reuses one
    compiled train step."""

    joints: Optional[int] = None  # reshape (B, T, J*3) for the spatial ops
    mirror: bool = False      # per-sample horizontal flip (joints only)
    rotation: bool = False    # per-sample random 3-D rotation (joints only)
    noise: bool = False       # additive gaussian jitter (any stream)
    axis_mask: bool = False   # zero one random coord axis / channel


def augment_stream(x, key, spec: AugmentSpec, params):
    """Batched train-time augmentation of one stream inside the train step.

    x: (B, T, C); for the spatial ops C == spec.joints * 3.
    params: dict of traced f32 scalars {"mirror_p", "rot_deg", "noise_std",
    "axis_p"}. Every transform selects the identity at strength/probability
    0, so the stage is numerics-exact to off when all operands are zero.
    Semantics follow the reference's sample-level transforms
    (common.py:93-273): mirror = MirrorReflection, rotation = RandomRotation
    (one full-strength main axis, 1/10 on the others), noise = RandomNoise,
    axis_mask = axis_mask (coordinate axis for skeletons, channel for
    sensor streams)."""
    jax, jnp = _import_jax()
    x = jnp.asarray(x)
    in_dtype = x.dtype  # bf16 input storage must stay bf16 (HBM traffic)
    b = x.shape[0]
    k_mir, k_rot, k_noise, k_ax, k_axp = jax.random.split(key, 5)
    if spec.joints:
        orig_shape = x.shape
        s = x.reshape(x.shape[0], x.shape[1], spec.joints, 3)
        if spec.mirror:
            flip = jax.random.bernoulli(k_mir, params["mirror_p"], (b,))
            s = jnp.where(flip[:, None, None, None], mirror_reflection(s), s)
        if spec.rotation:
            s = random_rotation(
                s, k_rot, -params["rot_deg"], params["rot_deg"]
            ).astype(s.dtype)
        if spec.axis_mask:
            do = jax.random.bernoulli(k_axp, params["axis_p"], (b,))
            s = jnp.where(do[:, None, None, None], axis_mask(s, k_ax), s)
        x = s.reshape(orig_shape)
    elif spec.axis_mask:
        # sensor streams: one random CHANNEL per sample — the same primitive
        # with the channel dim in axis_mask's coordinate slot
        do = jax.random.bernoulli(k_axp, params["axis_p"], (b,))
        masked = axis_mask(x[:, :, None, :], k_ax)[:, :, 0, :]
        x = jnp.where(do[:, None, None], masked, x)
    if spec.noise:
        x = x + params["noise_std"] * jax.random.normal(k_noise, x.shape, x.dtype)
    return x.astype(in_dtype)


def make_aug_params(mirror_p=0.0, rot_deg=0.0, noise_std=0.0, axis_p=0.0):
    """The traced-operand dict consumed by augment_stream."""
    import jax.numpy as jnp

    return {
        "mirror_p": jnp.asarray(mirror_p, jnp.float32),
        "rot_deg": jnp.asarray(rot_deg, jnp.float32),
        "noise_std": jnp.asarray(noise_std, jnp.float32),
        "axis_p": jnp.asarray(axis_p, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Reader-level orchestration (reference common.py:276-327)
# ---------------------------------------------------------------------------


def estimate_translation_range(pose_dict, frac: float) -> Tuple[float, float]:
    """±frac of the global coordinate range (common.py:357-362)."""
    lo = min(float(np.min(p)) for p in pose_dict.values())
    hi = max(float(np.max(p)) for p in pose_dict.values())
    r = frac * (hi - lo)
    return (-r, r)


def augment_reader(reader, augmentation_list: Sequence[str], params: Dict, seed: int = 0):
    """Append augmented copies of every pose sequence to a (deep-copied)
    reader, suffixing keys with the augmentation name — the functional
    equivalent of PoseSequenceAugmentation.augment_data (common.py:286-327).
    """
    import jax

    key = jax.random.PRNGKey(seed)
    trans_range = None
    if "random_translation" in augmentation_list:
        trans_range = estimate_translation_range(
            reader.pose_dict, params.get("translation_frac", 0.1)
        )

    out = copy.deepcopy(reader)
    labels_attr = "labels_dict" if hasattr(reader, "labels_dict") else "pose_label_dict"
    labels = getattr(out, labels_attr)
    new_poses, new_labels = {}, {}
    for name, seq in reader.pose_dict.items():
        x = np.asarray(seq, np.float32)[None]  # (1, T, J, 3)
        for aug in augmentation_list:
            key, sub = jax.random.split(key)
            if aug == "mirror_reflection":
                y = mirror_reflection(x)
            elif aug == "joint_dropout":
                y = joint_dropout(x, sub, params.get("dropout_prob", 0.1))
            elif aug == "random_rotation":
                lo, hi = params.get("rotation_range", (-10.0, 10.0))
                y = random_rotation(x, sub, lo, hi)
            elif aug == "random_translation":
                y = random_translation(x, sub, trans_range)
            else:
                print(f"Warning: Unknown augmentation technique '{aug}'")
                continue
            aug_name = f"{name}_{aug}"
            new_poses[aug_name] = np.asarray(y[0])
            label_key = name if name in labels else "_".join(name.split("_")[:2])
            if label_key in labels:
                new_labels[aug_name] = labels[label_key]
    out.pose_dict.update(new_poses)
    labels.update(new_labels)
    return out


# ---------------------------------------------------------------------------
# AMB-ID helpers (reference common.py:388-418)
# ---------------------------------------------------------------------------


def walkid_to_ambid(cur_walk_id: int) -> int:
    return cur_walk_id - 3 if cur_walk_id >= 60 else cur_walk_id - 2


def get_ambid_from_videoname(path_file: str) -> str:
    return "AMB" + str(walkid_to_ambid(int(path_file[24:26]))).zfill(2)


def extract_unique_subs(dataset) -> List[str]:
    if dataset is None:
        return []
    return list({name.split("_")[0] for name in dataset.video_names})


def count_labels(dataset, all_labels) -> Dict:
    counts = {lbl: 0 for lbl in all_labels}
    if dataset is not None:
        labels, n = np.unique(dataset.labels, return_counts=True)
        counts.update(dict(zip(labels, n)))
    return counts


def rotate_around_z_axis(points: np.ndarray, theta_deg: float) -> np.ndarray:
    """reference common.py:47-50."""
    c, s = np.cos(np.radians(theta_deg)), np.sin(np.radians(theta_deg))
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    return points @ rot.T


def visualize_sequence(seq: np.ndarray, name: str, elev: int = 45, azim: int = 20):
    """Animated 3-D skeleton GIF (reference common.py:53-90). Host-side
    matplotlib; used for data QA, not in the training path."""
    from matplotlib import pyplot as plt
    from matplotlib.animation import FuncAnimation

    seq = np.asarray(seq).copy()
    for j in range(seq.shape[1]):
        seq[:, j, :] = rotate_around_z_axis(seq[:, j, :], 90)

    mins = np.min(seq, axis=(0, 1))
    maxs = np.max(seq, axis=(0, 1))
    fig = plt.figure()
    ax = fig.add_subplot(111, projection="3d")

    def update(frame):
        ax.clear()
        ax.set_xlim3d([mins[0], maxs[0]])
        ax.set_ylim3d([mins[1], maxs[1]])
        ax.set_zlim3d([mins[2], maxs[2]])
        ax.view_init(elev=elev, azim=azim)
        ax.set_box_aspect(list(maxs - mins))
        ax.set_title(f"Frame: {frame}")
        pts = seq[frame]
        if pts.shape[0] >= 17:
            for a, b in H36M_CONNECTIONS_FULL:
                ax.plot(*zip(pts[a], pts[b]))
        ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2])

    anim = FuncAnimation(fig, update, frames=seq.shape[0], interval=1)
    anim.save(f"{name}.gif", writer="pillow")
    plt.close(fig)
    return f"{name}.gif"
