"""Tests for augmentations, the FBG marker conversion, and the pose
extraction orchestration (with a stubbed inferencer)."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gaitpd.data import augment as A
from gaitpd.data.preprocess_fbg_raw import PD_MARKERS, convert_pd_h36m, identify_gaps


def test_mirror_reflection_involution():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, 17, 3)).astype(np.float32)
    y = np.asarray(A.mirror_reflection(A.mirror_reflection(x)))
    np.testing.assert_allclose(y, x, atol=1e-6)
    # left/right swapped, x negated
    z = np.asarray(A.mirror_reflection(x))
    np.testing.assert_allclose(z[:, :, 14, 0], -x[:, :, 11, 0], atol=1e-6)


def test_random_rotation_preserves_norm():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 4, 17, 3)).astype(np.float32)
    y = np.asarray(A.random_rotation(x, jax.random.PRNGKey(0), -30, 30))
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-4
    )


def test_axis_mask_zeroes_one_axis():
    x = np.ones((4, 5, 17, 3), np.float32)
    y = np.asarray(A.axis_mask(x, jax.random.PRNGKey(0)))
    zeros_per_sample = (y == 0).all(axis=(1, 2)).sum(axis=-1)
    np.testing.assert_array_equal(zeros_per_sample, np.ones(4))


def test_joint_dropout_keeps_shape():
    x = np.ones((4, 5, 17, 3), np.float32)
    y = np.asarray(A.joint_dropout(x, jax.random.PRNGKey(0), 0.5))
    assert y.shape == x.shape
    # a dropped joint is zero across all frames/coords
    dropped = (y == 0).all(axis=(1, 3))
    assert dropped.any()


def test_augment_reader_appends():
    from gaitpd.data.synthetic import make_fog_reader

    reader = make_fog_reader(n_subjects=2, segments=2)
    n0 = len(reader.pose_dict)
    out = A.augment_reader(reader, ["mirror_reflection"], {}, seed=0)
    assert len(out.pose_dict) == 2 * n0
    assert any(k.endswith("_mirror_reflection") for k in out.pose_dict)
    assert len(reader.pose_dict) == n0  # original untouched


def test_convert_pd_h36m_rules():
    rng = np.random.default_rng(0)
    seq = rng.normal(size=(3, 44, 3))
    out = convert_pd_h36m(seq)
    assert out.shape == (3, 17, 3)
    pelvis = (
        seq[:, PD_MARKERS["L.ASIS"]] + seq[:, PD_MARKERS["R.ASIS"]]
        + seq[:, PD_MARKERS["L.PSIS"]] + seq[:, PD_MARKERS["R.PSIS"]]
    ) / 4
    np.testing.assert_allclose(out[:, 0], pelvis)
    np.testing.assert_allclose(
        out[:, 9], out[:, 8] + np.array([0.27, 57.48, 11.44])
    )


def test_identify_gaps():
    frames = np.ones((6, 2, 3))
    frames[2:4, 0] = 0  # frames 2,3 corrupted
    gaps = identify_gaps(list(frames))
    assert gaps == {0: "2-4:2"}


def test_pose_extraction_resume(tmp_path):
    from gaitpd.data.pose_extraction import check_unfinished_videos, extract_all

    videos = tmp_path / "vids"
    preds = tmp_path / "preds"
    logs = tmp_path / "logs"
    videos.mkdir()
    preds.mkdir()
    for n in ("a.mp4", "b.mp4", "c.avi"):
        (videos / n).write_text("")
    # pretend b is done
    (preds / "b_3d_predictions.json").write_text("[]")
    assert sorted(check_unfinished_videos(videos, preds)) == ["a.mp4", "c.avi"]

    calls = []

    def stub_builder():
        def infer(path):
            calls.append(path)
            return [{"predictions": []}]

        return infer

    n = extract_all(videos, preds, logs, num_workers=2,
                    infer_builder=stub_builder, use_processes=False)
    assert n == 2
    assert len(calls) == 2
    assert json.loads((preds / "a_3d_predictions.json").read_text()) == [
        {"predictions": []}
    ]
    # second run: nothing left
    assert extract_all(videos, preds, logs, infer_builder=stub_builder,
                       use_processes=False) == 0
