"""Reference-oracle equality for the reader layer (VERDICT r3 item 4/5).

The fixture assertions in tests/test_data.py pin gaitpd's readers against
hand-derived expectations; these tests close the loop by running the
REFERENCE implementations themselves (imported unmodified from
/root/reference) on the SAME fixture trees and asserting dict-for-dict /
frame-for-frame equality:

* FoGReader vs reference pdfeReader
  (/root/reference/train/data_processing/preprocess_fog.py:6-208; its
  pd.read_excel is monkeypatched to read_csv — no xlsx engine in this
  container, tabular semantics unchanged);
* gaitpd.data.preprocess_weargait.run_end_to_end vs the reference's
  fold-agnostic run_end_to_end
  (preprocess_weargait.py:225-343, pandas-only, runs as-is).
"""

import json
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available"
)


@pytest.fixture()
def ref_data_processing():
    p = str(REF / "train")
    if p not in sys.path:
        sys.path.insert(0, p)
    return p


# --------------------------------------------------------------------------
# FoG reader oracle
# --------------------------------------------------------------------------


def _write_pose_json(pose_dir, video, n_frames, n_empty=0, kp_scale=1.0):
    """mmpose-style 3-D prediction json: 17 keypoints per frame, first
    person; n_empty frames carry no detections (skipped by both readers)."""
    rng = np.random.default_rng(abs(hash(video)) % 2**31)
    frames = []
    for f in range(n_frames):
        if f < n_empty:
            frames.append({"predictions": []})
            continue
        kps = (rng.normal(size=(17, 3)) * kp_scale).tolist()
        frames.append({"predictions": [[{"keypoints": kps}]]})
    (pose_dir / f"{video}_3d_predictions.json").write_text(json.dumps(frames))


def _write_imu_txt(imu_dir, name, n_rows, n_cols=9):
    rng = np.random.default_rng(abs(hash(name)) % 2**31)
    arr = rng.normal(size=(n_rows, n_cols))
    with open(imu_dir / f"{name}.txt", "w") as f:
        f.write("\t".join(f"c{i}" for i in range(n_cols)) + "\n")
        for row in arr:
            f.write("\t".join(f"{v:.6f}" for v in row) + "\n")


def _fog_fixture_tree(root: Path):
    """A tree rich enough to exercise: equal-split with remainder absorption,
    too-few-frames/samples skips, empty-prediction frames, the _cropped
    rename, lifted-video filtering, the standing-file skip, multi-column
    H&Y labels with NaN/float/garbage cells, and the hard-coded
    SUB19/SUB21/SUB24 bad-segment removals + label patch."""
    pose_dir = root / "predictions"
    lifted = root / "lifted"
    imu = root / "IMU"
    for d in (pose_dir, lifted, imu):
        d.mkdir()

    # pose videos (all lifted unless noted)
    _write_pose_json(pose_dir, "PDFE01_1", 75)            # 36x2 + tail of 5
    _write_pose_json(pose_dir, "PDFE02_1_cropped", 90, n_empty=5)
    _write_pose_json(pose_dir, "PDFE03_2", 40)            # 36x1 + tail of 4
    _write_pose_json(pose_dir, "PDFE04_1", 20)            # too few -> WARN skip
    _write_pose_json(pose_dir, "PDFE05_1", 50)            # NOT lifted -> skipped
    # the bad-segment subjects (need >=36 frames so the popped keys exist)
    _write_pose_json(pose_dir, "PDFE21_1", 72)
    _write_pose_json(pose_dir, "PDFE21_3", 40)
    _write_pose_json(pose_dir, "PDFE24_1", 80)
    for v in ("PDFE01_1", "PDFE02_1_cropped", "PDFE03_2", "PDFE04_1",
              "PDFE21_1", "PDFE21_3", "PDFE24_1"):
        (lifted / f"{v}.mp4").write_text("")

    # IMU trials
    _write_imu_txt(imu, "SUB01_1", 433)   # ->145 samples: 36x4 + tail of 5
    _write_imu_txt(imu, "SUB02_1", 200)   # ->67: 36x1 + tail of 32
    _write_imu_txt(imu, "SUB19_1", 150)   # 50 samples: 36x1 (SUB19_1_1 removed)
    _write_imu_txt(imu, "SUB03_1", 60)    # ->20 samples: too few -> WARN skip
    _write_imu_txt(imu, "SUB06_standing", 300)  # skipped by name

    # labels: 25 data rows so SUB21 exists (triggers the SUB19 label patch);
    # two H&Y columns with NaN / float / non-numeric cells
    rows = {"Name": [], "H&Y Stage": [], "H&Y Stage 2": []}
    for i in range(25):
        rows["Name"].append(f"row{i}")
        rows["H&Y Stage"].append([2, 3, np.nan, 4][i % 4])
        rows["H&Y Stage 2"].append(["", "3", "n/a", "2"][i % 4])
    df = pd.DataFrame(rows)
    labels = root / "PDFEinfo.csv"
    df.to_csv(labels, index=False)
    return pose_dir, imu, labels, lifted


def test_fog_reader_matches_reference_oracle(tmp_path, monkeypatch,
                                             ref_data_processing):
    pose_dir, imu, labels, lifted = _fog_fixture_tree(tmp_path)

    from data_processing.preprocess_fog import pdfeReader

    from gaitpd.data.readers import FoGReader

    # no xlsx engine in this container: feed the reference the same csv
    monkeypatch.setattr(pd, "read_excel",
                        lambda path, **k: pd.read_csv(path))
    ref = pdfeReader(str(pose_dir), str(imu), str(labels), str(lifted))
    ours = FoGReader(pose_dir, imu, labels, lifted)

    assert sorted(ours.pose_dict) == sorted(ref.pose_dict)
    for k in ref.pose_dict:
        np.testing.assert_array_equal(
            ours.pose_dict[k], ref.pose_dict[k], err_msg=f"pose {k}"
        )
    assert sorted(ours.sensor_dict) == sorted(ref.sensor_dict)
    for k in ref.sensor_dict:
        np.testing.assert_array_equal(
            ours.sensor_dict[k], ref.sensor_dict[k], err_msg=f"sensor {k}"
        )
    assert ours.sensor_length == ref.sensor_length
    assert ours.labels_dict == ref.labels_dict
    # the fixture genuinely exercised the interesting paths
    assert "SUB21_1_1" not in ref.pose_dict          # bad-segment removal ran
    assert "SUB19_1_1" not in ref.sensor_dict
    assert ref.labels_dict.get("SUB19") == [2]       # label patch ran
    assert "SUB04_1_1" not in ref.pose_dict          # too-few-frames skip
    assert "SUB05_1_1" not in ref.pose_dict          # not-lifted filter
    assert not any(k.startswith("SUB06") for k in ref.sensor_dict)


# --------------------------------------------------------------------------
# FBG reader oracle
# --------------------------------------------------------------------------


def test_fbg_reader_matches_reference_oracle(tmp_path, monkeypatch,
                                             ref_data_processing):
    """FBGReader vs the reference PDReader (preprocess_fbg.py:7-149) on the
    same npy/label fixture tree: pose (mm->m), GRF with the empty-column
    exclusion, per-video UPDRS labels and min-max demographics."""
    joints = tmp_path / "FBG"
    grf = tmp_path / "GRF"
    joints.mkdir()
    grf.mkdir()
    rng = np.random.default_rng(0)
    for name in ("SUB01_on_walk_1_0", "SUB01_off_walk_2_1",
                 "SUB02_on_walk_1_0"):
        np.save(joints / f"{name}.npy", rng.normal(size=(30, 51)) * 1000)
    np.save(grf / "SUB01_on_left.npy", rng.normal(size=(40, 3)))
    np.save(grf / "SUB01_off_right.npy", rng.normal(size=(35, 3)))
    np.save(grf / "SUB02_on_left.npy", np.zeros((10, 0)))  # excluded
    np.save(grf / "SUB02_on_right.npy", rng.normal(size=(20, 3)))
    labels = pd.DataFrame({
        "ID": ["SUB01", "SUB02"],
        "ON - UPDRS-III - walking": [2, 3],
        "OFF - UPDRS-III - walking": [4, 2],
        "Gender": ["M", "F"],
        "Age": [61, 70],
        "Height (cm)": [170, 182],
        "Weight (kg)": [70.5, 88.0],
        "BMI (kg/m2)": [24.4, 26.6],
    })
    label_path = tmp_path / "PDGinfo.csv"
    labels.to_csv(label_path, index=False)

    from data_processing.preprocess_fbg import PDReader

    from gaitpd.data.readers import FBGReader

    monkeypatch.setattr(pd, "read_excel",
                        lambda path, **k: pd.read_csv(path))
    ref = PDReader(str(joints), str(grf), str(label_path))
    ours = FBGReader(joints, grf, label_path)

    assert sorted(ours.pose_dict) == sorted(ref.pose_dict)
    for k in ref.pose_dict:
        np.testing.assert_allclose(ours.pose_dict[k], ref.pose_dict[k])
    assert sorted(ours.sensor_dict) == sorted(ref.sensor_dict)
    assert "SUB02_on_left" not in ref.sensor_dict  # empty-column exclusion
    for k in ref.sensor_dict:
        np.testing.assert_array_equal(ours.sensor_dict[k], ref.sensor_dict[k])
    assert ours.sensor_label_dict == ref.sensor_label_dict
    assert ours.pose_label_dict == ref.pose_label_dict
    assert sorted(ours.video_names) == sorted(ref.video_names)
    for k in ref.metadata_dict:
        np.testing.assert_allclose(
            np.asarray(ours.metadata_dict[k], float),
            np.asarray(ref.metadata_dict[k], float),
            err_msg=f"metadata {k}",
        )


# --------------------------------------------------------------------------
# WearGait raw preprocessor oracle
# --------------------------------------------------------------------------


def _weargait_fixture_csv(root, sid, t=200, hz=60, comma_decimals=False):
    rng = np.random.default_rng(abs(hash(sid)) % 2**31)
    time = np.arange(t) / hz
    if comma_decimals:
        time_strs = [f"{x:.4f}".replace(".", ",") + " sec" for x in time]
    else:
        time_strs = [f"{x:.4f} sec" for x in time]
    df = pd.DataFrame({"Time": time_strs})
    df["GeneralEvent"] = ["walking"] * (t - 10) + ["Standing"] * 10
    df["L Foot Pressure"] = rng.uniform(0, 700, t)
    df["R Foot Pressure"] = rng.uniform(0, 700, t)
    df["LTotalForce"] = rng.uniform(0, 700, t)
    df["RTotalForce"] = rng.uniform(0, 700, t)
    for c in ("LCoP_X", "LCoP_Y", "RCoP_X", "RCoP_Y"):
        df[c] = rng.normal(size=t)
    for side in ("Linsole", "Rinsole"):
        for ax in "XYZ":
            df[f"{side}:Acc_{ax}"] = rng.normal(size=t)
    from gaitpd.data.preprocess_weargait import IMU_SITES

    for s in IMU_SITES:
        for ax in "ENU":
            df[f"{s}_FreeAcc_{ax}"] = rng.normal(size=t)
    df.to_csv(root / f"{sid}_SelfPace_matTURN.csv", index=False)


def _weargait_demo_csv(root, name, sids):
    rows = [["junk"] * 3, ["Subject ID", "Weight (kg)", "Other"]]
    rows += [[sid, f"{60 + 2 * i}.5 kg", "x"] for i, sid in enumerate(sids)]
    path = root / name
    pd.DataFrame(rows).to_csv(path, index=False, header=False)
    return path


def test_weargait_preprocessor_matches_reference_oracle(
    tmp_path, ref_data_processing
):
    """gaitpd run_end_to_end vs the reference's fold-agnostic mode
    (train_subject_ids=None) on the same raw CSV tree: every per-subject
    stream pickle must be frame-for-frame equal (the reference names the
    un-normalised insole/imu pickles *_base; gaitpd defers the optional
    global z-score to the fold-local pipeline and uses the plain names its
    loader expects)."""
    from data_processing.preprocess_weargait import (
        run_end_to_end as ref_run,
    )

    from gaitpd.data.preprocess_weargait import run_end_to_end as our_run

    hc = tmp_path / "HC"
    pdd = tmp_path / "PD"
    hc.mkdir()
    pdd.mkdir()
    _weargait_fixture_csv(hc, "HC001")
    _weargait_fixture_csv(hc, "HC002", t=333, comma_decimals=True)
    _weargait_fixture_csv(pdd, "PD001", t=150)
    hc_demo = _weargait_demo_csv(tmp_path, "hc_demo.csv", ["HC001", "HC002"])
    pd_demo = _weargait_demo_csv(tmp_path, "pd_demo.csv", ["PD001"])

    ref_out = tmp_path / "ref_out"
    our_out = tmp_path / "our_out"
    ref_run(str(hc), str(pdd), str(hc_demo), str(pd_demo), str(ref_out),
            train_subject_ids=None)
    n = our_run(hc, pdd, hc_demo, pd_demo, our_out)
    assert n == 3

    for sid in ("hc001", "hc002", "pd001"):
        for our_name, ref_name in (
            ("walkway", "walkway"),
            ("insole", "insole_base"),
            ("imu", "imu_base"),
        ):
            ours = pd.read_pickle(our_out / f"{sid}_{our_name}.pkl")
            ref = pd.read_pickle(ref_out / f"{sid}_{ref_name}.pkl")
            pd.testing.assert_frame_equal(
                ours, ref, obj=f"{sid} {our_name}"
            )
        # sanity: the streams are non-trivial (standing rows dropped,
        # 30 Hz bins populated)
        w = pd.read_pickle(our_out / f"{sid}_walkway.pkl")
        assert len(w) > 10
        assert {"L Foot Pressure_BW", "R Foot Pressure_BW"} <= set(w.columns)
