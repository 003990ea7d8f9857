"""Reference-oracle equality for the FBG raw preprocessor (VERDICT r4
missing item 3).

`convert_pd_h36m`, `identify_gaps` and `extract_grf_data`
(/root/reference/train/data_processing/preprocess_fbg_raw.py:66-97,160-188,
190-276) are importable without `c3d`; these tests run them unmodified on
shared synthetic fixtures and assert equality with
gaitpd/data/preprocess_fbg_raw.py — the same pattern as
tests/test_reader_oracle.py. The reference's GRF extractor reads sheets via
pd.ExcelFile/pd.read_excel; no xlsx engine exists in this container, so both
sides run under the same CSV-backed monkeypatch (tabular semantics
unchanged).
"""

import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from gaitpd.data import preprocess_fbg_raw as ours

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not REF.exists(), reason="reference tree not available"
)


@pytest.fixture()
def ref_fbg_raw():
    p = str(REF / "train")
    if p not in sys.path:
        sys.path.insert(0, p)
    from data_processing import preprocess_fbg_raw as ref_mod

    return ref_mod


# --------------------------------------------------------------------------
# convert_pd_h36m oracle
# --------------------------------------------------------------------------


def test_convert_pd_h36m_matches_reference(ref_fbg_raw):
    rng = np.random.default_rng(0)
    seq = rng.normal(size=(23, 44, 3)) * 100.0  # mm-scale marker positions
    ref_out = ref_fbg_raw.convert_pd_h36m(seq.copy())
    our_out = ours.convert_pd_h36m(seq.copy())
    assert ref_out.shape == our_out.shape == (23, 17, 3)
    np.testing.assert_allclose(our_out, ref_out, rtol=0, atol=1e-12)


def test_convert_pd_h36m_marker_map_matches_reference(ref_fbg_raw):
    # the 44-marker index map and the fixed neck/head offsets are data the
    # reference defines (:18-63, :94-95); equality here pins the constants
    assert ours.PD_MARKERS == ref_fbg_raw.PD
    u = ref_fbg_raw.H36M_FULL["U.TORSO"]
    seq = np.zeros((1, 44, 3))
    ref_out = ref_fbg_raw.convert_pd_h36m(seq)
    np.testing.assert_allclose(
        ref_out[0, ref_fbg_raw.H36M_FULL["NECK"]] - ref_out[0, u],
        ours.NECK_OFFSET,
    )
    np.testing.assert_allclose(
        ref_out[0, ref_fbg_raw.H36M_FULL["HEAD"]] - ref_out[0, u],
        ours.HEAD_OFFSET,
    )


# --------------------------------------------------------------------------
# identify_gaps oracle
# --------------------------------------------------------------------------


def _gappy_sequence(zero_frames, n=12, n_markers=5):
    rng = np.random.default_rng(1)
    seq = rng.normal(size=(n, n_markers, 3)) + 1.0
    for f in zero_frames:
        seq[f, f % n_markers, :] = 0.0  # one all-zero marker corrupts a frame
    return seq


@pytest.mark.parametrize(
    "zero_frames",
    [
        [],                    # no gaps
        [0, 1],                # gap at the very start
        [3],                   # single interior gap
        [4, 5, 6, 10, 11],     # interior run + unterminated trailing gap
        list(range(12)),       # everything corrupted
    ],
)
def test_identify_gaps_matches_reference(ref_fbg_raw, zero_frames):
    seq = _gappy_sequence(zero_frames)
    assert ours.identify_gaps(seq) == ref_fbg_raw.identify_gaps(seq)


# --------------------------------------------------------------------------
# extract_grf_data oracle
# --------------------------------------------------------------------------


class _FakeExcelFile:
    """Stand-in for pd.ExcelFile that routes to the underlying CSV."""

    def __init__(self, path, *a, **k):
        self.path = path
        self.sheet_names = ["Sheet1"]


def _fake_read_excel(xls, sheet_name=None, **k):
    return pd.read_csv(xls.path)


def _write_grf_csv(path, n_trials, n_rows=101, gait_header=False,
                   ragged_tail=0, seed=0):
    """A gait-cycle sheet: consecutive (x,y,z) column triplets, one trial
    each; optionally a 'Gait cycle' first column (both extractors drop the
    first row AND column then) and `ragged_tail` trailing columns that do
    not complete a triplet (both must ignore them)."""
    rng = np.random.default_rng(seed)
    data = {}
    if gait_header:
        n_rows += 1  # both extractors drop the first row for gait sheets
        data["Gait cycle"] = np.arange(n_rows)
    for t in range(n_trials):
        for ax in "xyz":
            data[f"t{t}_{ax}"] = rng.normal(size=n_rows)
    for r in range(ragged_tail):
        data[f"extra{r}"] = rng.normal(size=n_rows)
    pd.DataFrame(data).to_csv(path, index=False)


def _grf_fixture_tree(root: Path):
    """Two subjects: SUB01 has ON left/right + OFF left (OFF right empty ->
    zeros((101,0,3))), a gait-header sheet, a ragged-tail sheet, and a
    sum_cycles sheet both sides must skip; SUB02 has only OFF. A stray file
    (not a directory) exercises the isdir skip."""
    s1_on = root / "SUB01" / "ON" / "GRF"
    s1_off = root / "SUB01" / "OFF" / "GRF"
    s2_off = root / "SUB02" / "OFF" / "GRF"
    for d in (s1_on, s1_off, s2_off):
        d.mkdir(parents=True)
    _write_grf_csv(s1_on / "SUB01_left_cycles.csv", 3, gait_header=True, seed=1)
    _write_grf_csv(s1_on / "SUB01_right_cycles.csv", 2, ragged_tail=2, seed=2)
    _write_grf_csv(s1_off / "SUB01_left_cycles.csv", 1, seed=3)
    _write_grf_csv(s1_off / "SUB01_sum_cycles.csv", 2, seed=4)  # skipped
    (s1_off / "notes.txt").write_text("ignored: not a .csv")
    _write_grf_csv(s2_off / "SUB02_left_cycles.csv", 2, gait_header=True, seed=5)
    _write_grf_csv(s2_off / "SUB02_right_cycles.csv", 4, seed=6)
    (root / "stray_file.csv").write_text("not a subject dir")


def test_extract_grf_data_matches_reference(ref_fbg_raw, tmp_path, monkeypatch):
    grf_root = tmp_path / "Gait cycle"
    grf_root.mkdir()
    _grf_fixture_tree(grf_root)
    out_ref = tmp_path / "out_ref"
    out_ours = tmp_path / "out_ours"

    monkeypatch.setattr(pd, "ExcelFile", _FakeExcelFile)
    monkeypatch.setattr(pd, "read_excel", _fake_read_excel)

    ref_fbg_raw.extract_grf_data(str(grf_root), str(out_ref))
    ours.extract_grf_data(str(grf_root), str(out_ours))

    ref_files = sorted(p.name for p in out_ref.glob("*.npy"))
    our_files = sorted(p.name for p in out_ours.glob("*.npy"))
    assert ref_files == our_files
    # the empty OFF-right slot of SUB01 must exist as (101, 0, 3)
    assert "SUB01_off_right.npy" in ref_files
    for name in ref_files:
        a = np.load(out_ref / name)
        b = np.load(out_ours / name)
        assert a.shape == b.shape, name
        np.testing.assert_allclose(b, a, rtol=0, atol=0, err_msg=name)
    assert np.load(out_ref / "SUB01_off_right.npy").shape == (101, 0, 3)
    # trial counts survive grouping: SUB01 ON-left = 3 trials
    assert np.load(out_ref / "SUB01_on_left.npy").shape == (101, 3, 3)
