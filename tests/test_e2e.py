"""End-to-end training runs on synthetic data (SURVEY.md §4(e)): loss
decreases, accuracy beats chance, masked relaxed-input eval works, and the
whole thing runs data-parallel on a multi-device CPU mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from gaitpd.train.fbg_fog_driver import FbgFogArgs, get_reader, train_one_fold
from gaitpd.train.weargait_driver import WearGaitArgs, run_cv


def test_fog_sensor_only_learns():
    args = FbgFogArgs(
        dataset="fog", modality="sensor", wm="ce", alpha=0.0,
        epochs=15, synthetic=True, verbose=False, seed=0,
    )
    reader = get_reader(args)
    from gaitpd.train.cv import fog_label_dict, generate_class_stratified_folds

    folds = generate_class_stratified_folds(
        fog_label_dict(reader), np.random.default_rng(0)
    )
    sk, se, avg = train_one_fold(1, reader, args, *folds[0])
    assert avg > 40.0, f"sensor-only FoG should beat 33% chance, got {avg}"


def test_fog_multimodal_cagrad_gcl_runs():
    args = FbgFogArgs(
        dataset="fog", modality="multimodal", wm="gcl", alpha=0.1,
        use_norm_and_cos=True, epochs=3, synthetic=True, verbose=False, seed=0,
    )
    reader = get_reader(args)
    from gaitpd.train.cv import fog_label_dict, generate_class_stratified_folds

    folds = generate_class_stratified_folds(
        fog_label_dict(reader), np.random.default_rng(0)
    )
    sk, se, avg = train_one_fold(1, reader, args, *folds[0])
    assert np.isfinite(avg) and avg > 0


def test_weargait_sync_masked_eval():
    args = WearGaitArgs(
        n_folds=2, test_per_class=3, epochs=4, patience=50, synthetic=True,
        verbose=False, seed=0, n_folds_cap=1, wm="gcl", alpha=0.5,
    )
    res = run_cv(args)
    assert set(res["masks"]) == {"W", "I", "M", "W+I", "W+M", "I+M", "W+I+M"}
    assert all(v is not None and np.isfinite(v) for v in res["masks"].values())
    assert res["macro"][0] > 50.0, f"should beat 50% chance, got {res['macro']}"


def test_weargait_async_runs():
    args = WearGaitArgs(
        n_folds=2, test_per_class=3, epochs=2, patience=50, synthetic=True,
        verbose=False, seed=0, n_folds_cap=1, wm="class_wt", alpha=0.5,
        async_loading=True,
    )
    res = run_cv(args)
    assert np.isfinite(res["macro"][0])


def test_fog_sync_multimodal_runs():
    """Sync loading is a FoG-only mode (FBG pose/GRF keys share no segment
    suffix, so pairing is structurally empty — also true in the reference)."""
    args = FbgFogArgs(
        dataset="fog", modality="multimodal", wm="gcl", alpha=0.1,
        synchronized_loading=True, epochs=2, synthetic=True, verbose=False,
        seed=0,
    )
    reader = get_reader(args)
    from gaitpd.train.cv import fog_label_dict, generate_class_stratified_folds

    folds = generate_class_stratified_folds(
        fog_label_dict(reader), np.random.default_rng(0)
    )
    sk, se, avg = train_one_fold(1, reader, args, *folds[0])
    assert np.isfinite(avg)


def test_fbg_async_multimodal_runs():
    args = FbgFogArgs(
        dataset="fbg", modality="multimodal", wm="ce", alpha=0.0,
        epochs=2, synthetic=True, verbose=False,
        seed=0,
    )
    reader = get_reader(args)
    from gaitpd.train.cv import fbg_label_dict, generate_class_stratified_folds

    folds = generate_class_stratified_folds(
        fbg_label_dict(reader), np.random.default_rng(0)
    )
    sk, se, avg = train_one_fold(1, reader, args, *folds[0])
    assert np.isfinite(avg)


def test_weargait_data_parallel_mesh():
    """Full 3-stream CAGrad training step over an 8-device data-parallel mesh
    (the multi-chip path the driver dry-runs)."""
    from gaitpd.runtime.mesh import make_mesh

    mesh = make_mesh(8)
    args = WearGaitArgs(
        n_folds=2, test_per_class=3, epochs=2, patience=50, synthetic=True,
        verbose=False, seed=0, n_folds_cap=1, wm="gcl", alpha=0.5,
        batch_size=64, mesh=mesh,
    )
    res = run_cv(args)
    assert np.isfinite(res["macro"][0])


def test_graft_entry_contract():
    """The driver-facing entry points must keep working: jittable forward and
    the 8-device multichip dry run (regression guard for step-API changes)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.asarray(out).shape == (64, 2)
    if len(jax.devices()) >= 8:
        mod.dryrun_multichip(8)


def test_graft_multichip_bootstraps_without_env(tmp_path):
    """`python __graft_entry__.py multichip 8` must pass under the DRIVER's
    ambient environment (no pre-set CPU/virtual-device env vars; typically
    JAX_PLATFORMS=axon with one real TPU) — the dry run bootstraps its own
    8-device virtual CPU mesh in a subprocess (VERDICT r1 item 1,
    MULTICHIP_r01.json rc=1 regression)."""
    import os
    import re
    import subprocess
    import sys

    env = dict(os.environ)
    # Undo the test conftest's CPU forcing so the subprocess sees what the
    # driver sees (JAX_PLATFORMS=axon from sitecustomize, or a bare default).
    env.pop("JAX_PLATFORM_NAME", None)
    env.pop("GAITPD_MULTICHIP_NO_REEXEC", None)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "",
        env.get("XLA_FLAGS", ""),
    ).strip()
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "/root/repo/__graft_entry__.py", "multichip", "8"],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        # the dryrun takes ~210 s standalone on this one-core box but
        # 3-4x that when parity/bench jobs share the core; the cap only
        # guards against hangs, so keep it generous
        timeout=1140,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8) OK" in proc.stdout


def test_fog_multimodal_ldam_runs():
    """LDAM branch end-to-end (the reference's LDAM is CUDA-only,
    classification_losses.py:60 — ours runs anywhere)."""
    args = FbgFogArgs(
        dataset="fog", modality="multimodal", wm="ldam", alpha=0.1,
        use_norm_and_cos=False, epochs=2, synthetic=True, verbose=False, seed=0,
    )
    reader = get_reader(args)
    from gaitpd.train.cv import fog_label_dict, generate_class_stratified_folds

    folds = generate_class_stratified_folds(
        fog_label_dict(reader), np.random.default_rng(0)
    )
    sk, se, avg = train_one_fold(1, reader, args, *folds[0])
    assert np.isfinite(avg)
