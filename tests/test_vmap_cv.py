"""Vmapped cross-validation (gaitpd/train/vmap_cv.py): numerical equivalence
with the sequential fold loop, and fold-axis sharding over the device mesh."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")

import gaitpd.train.weargait_driver as wd  # noqa: E402
from gaitpd.train.vmap_cv import run_cv_vmapped  # noqa: E402
from gaitpd.train.weargait_driver import WearGaitArgs, run_cv  # noqa: E402


def fixed_length_streams(n_per_class, t=448, seed=0):
    """Streams with IDENTICAL lengths so every fold has the same window/batch
    counts — the condition under which the vmapped driver's per-fold RNG
    chains match the sequential driver's exactly."""
    from gaitpd.data.synthetic import make_weargait_streams

    streams, pd_ids, hc_ids = make_weargait_streams(
        n_pd=n_per_class, n_hc=n_per_class, t_frames=t + 60, seed=seed
    )
    streams = {k: {m: v[:t] for m, v in sub.items()} for k, sub in streams.items()}
    return streams, pd_ids, hc_ids


@pytest.mark.parametrize("async_mode", [False, True])
def test_vmap_cv_matches_sequential(monkeypatch, async_mode):
    """With equal fold sizes, vmapped CV must reproduce the sequential
    driver's metrics (same inits, same per-fold host orders, same per-fold
    jax keys) to float tolerance — including the 7-subset masked eval."""
    fixed = fixed_length_streams(n_per_class=8, seed=3)
    monkeypatch.setattr(wd, "get_streams", lambda args: fixed)

    kw = dict(
        n_folds=2, test_per_class=3, epochs=3, patience=50, wm="gcl",
        alpha=0.5, seed=7, synthetic=True, verbose=False,
        async_loading=async_mode,
    )
    seq = run_cv(WearGaitArgs(**kw))
    vm = run_cv_vmapped(WearGaitArgs(**kw))

    np.testing.assert_allclose(vm["macro"][0], seq["macro"][0], atol=2e-2)
    for m in ("walkway", "insole", "imu"):
        np.testing.assert_allclose(
            vm["per_mod"][m], seq["per_mod"][m], atol=2e-2, err_msg=m
        )
    for mk in seq["masks"]:
        np.testing.assert_allclose(
            vm["masks"][mk], seq["masks"][mk], atol=2e-2, err_msg=mk
        )


def test_vmap_cv_fold_sharded_mesh():
    """8 folds sharded over the 8-device mesh (fold-parallel CV): runs one
    epoch end-to-end and yields finite per-fold macros."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gaitpd.runtime.mesh import make_mesh

    args = WearGaitArgs(
        n_folds=8, test_per_class=1, epochs=2, patience=50, wm="gcl",
        alpha=0.5, seed=0, synthetic=True, verbose=False,
        mesh=make_mesh(8),
    )
    res = run_cv_vmapped(args)
    assert len(res["per_fold_macro"]) == 8
    assert np.all(np.isfinite(res["per_fold_macro"]))
    assert np.isfinite(res["macro"][0])


@pytest.mark.parametrize("async_mode", [False, True])
def test_vmap_cv_single_mod_matches_sequential(monkeypatch, async_mode):
    """--single_mod under --vmap_folds reproduces the sequential
    single-modality sub-driver (forward_single through the shared backbone,
    same per-fold host orders / key chains / per-epoch async pools)."""
    fixed = fixed_length_streams(n_per_class=8, seed=5)
    monkeypatch.setattr(wd, "get_streams", lambda args: fixed)

    kw = dict(
        n_folds=2, test_per_class=3, epochs=3, patience=50, wm="gcl",
        seed=6, synthetic=True, verbose=False, single_mod="imu",
        async_loading=async_mode,
    )
    seq = run_cv(WearGaitArgs(**kw))
    vm = run_cv_vmapped(WearGaitArgs(**kw))
    np.testing.assert_allclose(vm["macro"][0], seq["macro"][0], atol=2e-2)
    np.testing.assert_allclose(
        vm["per_mod"]["imu"], seq["per_mod"]["imu"], atol=2e-2
    )
    assert vm["per_mod"]["walkway"] == 0.0 and vm["per_mod"]["insole"] == 0.0


def test_fbg_fog_vmap_checkpoint_resume(tmp_path):
    """The fbg_fog vmapped path checkpoints too: a killed-and-resumed run
    reproduces the uninterrupted one, including the best-epoch collected
    predictions (stored as fixed-shape stacks inside the snapshot)."""
    from gaitpd.train.fbg_fog_driver import FbgFogArgs
    from gaitpd.train.vmap_cv import run_fbg_fog_vmapped

    kw = dict(dataset="fog", modality="multimodal", wm="gcl",
              use_norm_and_cos=True, alpha=0.1, synthetic=True, seed=5,
              verbose=False)
    full = run_fbg_fog_vmapped(FbgFogArgs(epochs=4, **kw))
    # "crash" after 2 epochs, then resume to 4
    run_fbg_fog_vmapped(FbgFogArgs(epochs=2, ckpt_dir=str(tmp_path), **kw))
    resumed = run_fbg_fog_vmapped(
        FbgFogArgs(epochs=4, ckpt_dir=str(tmp_path), resume=True, **kw)
    )
    for key in ("skel", "sensor", "avg"):
        np.testing.assert_allclose(
            resumed["multimodal"][key], full["multimodal"][key], atol=1e-4,
            err_msg=key,
        )


@pytest.mark.parametrize(
    "config",
    [
        dict(modality="sensor", wm="ce", alpha=0.0),
        dict(modality="multimodal", wm="gcl", use_norm_and_cos=True, alpha=0.1),
        dict(modality="multimodal", wm="ce", synchronized_loading=True, alpha=0.0),
    ],
    ids=["sensor_ce", "mm_gcl_cagrad", "mm_ce_sync"],
)
def test_fbg_fog_vmap_matches_sequential(config):
    """FBG/FoG vmapped folds reproduce the sequential driver (same inits,
    orders, key chains) across the sensor-only, GCL+CAGrad and synchronized
    paths — including the collected best-epoch accuracies."""
    from gaitpd.train.fbg_fog_driver import FbgFogArgs, main
    from gaitpd.train.vmap_cv import run_fbg_fog_vmapped

    kw = dict(dataset="fog", epochs=4, synthetic=True, seed=5, verbose=False,
              **config)
    seq = main(FbgFogArgs(**kw))
    vm = run_fbg_fog_vmapped(FbgFogArgs(**kw))
    mod = config["modality"]
    for key in ("skel", "sensor", "avg"):
        np.testing.assert_allclose(
            vm[mod][key], seq[mod][key], atol=2e-2, err_msg=key
        )


def test_fusion_seeds_vmap_matches_sequential():
    """run_fusion_seeds_vmapped reproduces the sequential fusion driver per
    seed (seeds vary data AND init, like the reference's run_all.sh axis)."""
    from gaitpd.train.baseline_drivers import BaselineArgs
    from gaitpd.train.baseline_drivers import main as seq_main
    from gaitpd.train.vmap_cv import run_fusion_seeds_vmapped

    seeds = [0, 1]
    vm = run_fusion_seeds_vmapped(
        "fog", "cheap_xattn", seeds, synced=True, epochs=3, n_folds_cap=2,
        synthetic=True,
    )
    for seed in seeds:
        seq = seq_main(BaselineArgs(
            kind="fusion", dataset="fog", fusion_type="cheap_xattn",
            synced=True, seed=seed, epochs=3, n_folds_cap=2, synthetic=True,
            verbose=False,
        ))
        for key in ("skel", "sensor", "avg"):
            np.testing.assert_allclose(
                vm[seed][key], seq[key], atol=2e-2, err_msg=f"seed{seed}:{key}"
            )


def test_vmap_sweep_skip_if_done(tmp_path):
    """The vmapped sweep writes the sequential sweep's result schema, so
    skip-if-done resume interoperates across both modes."""
    from gaitpd import sweep

    argv = ["--mode", "fusion", "--dataset", "fog", "--synthetic",
            "--synchronized_loading", "--fusion_types", "early",
            "--seeds", "0", "1", "--epochs", "1", "--n_folds_cap", "1",
            "--out", str(tmp_path), "--vmap_seeds"]
    r1 = sweep.main(argv)
    assert r1 == {"done": 2, "skipped": 0, "failed": 0}
    # rerun (vmapped): all skipped
    r2 = sweep.main(argv)
    assert r2 == {"done": 0, "skipped": 2, "failed": 0}
    # rerun through the SEQUENTIAL path: still skipped (schema interop)
    r3 = sweep.main(argv[:-1])
    assert r3 == {"done": 0, "skipped": 2, "failed": 0}


def test_vmap_cv_early_stop_equivalence(monkeypatch):
    """With patience < epochs the sequential driver early-stops folds;
    vmapped CV freezes a stopped fold's best tracking instead of letting its
    (still-training) weights improve past where sequential stopped."""
    fixed = fixed_length_streams(n_per_class=8, seed=11)
    monkeypatch.setattr(wd, "get_streams", lambda args: fixed)

    kw = dict(
        n_folds=2, test_per_class=3, epochs=8, patience=1, wm="class_wt",
        alpha=0.5, seed=2, synthetic=True, verbose=False,
    )
    seq = run_cv(WearGaitArgs(**kw))
    vm = run_cv_vmapped(WearGaitArgs(**kw))
    np.testing.assert_allclose(vm["macro"][0], seq["macro"][0], atol=2e-2)
    for mk in seq["masks"]:
        np.testing.assert_allclose(
            vm["masks"][mk], seq["masks"][mk], atol=2e-2, err_msg=mk
        )


@pytest.mark.parametrize(
    "kind,synced",
    [("focal", True), ("taca", False), ("deepav", True)],
    ids=["focal_sync", "taca_async", "deepav_sync"],
)
def test_sota_seeds_vmap_matches_sequential(kind, synced):
    """The vmapped (seed x fold) sweep reproduces the sequential SOTA
    baseline drivers too (adamw + clip, summed CE, dropout rng threading,
    TACA's epoch-frac schedule)."""
    from gaitpd.train.baseline_drivers import BaselineArgs
    from gaitpd.train.baseline_drivers import main as seq_main
    from gaitpd.train.vmap_cv import run_baseline_seeds_vmapped

    seeds = [0, 1]
    vm = run_baseline_seeds_vmapped(
        "fog", kind, kind, seeds, synced=synced, epochs=3, n_folds_cap=2,
        synthetic=True,
    )
    for seed in seeds:
        seq = seq_main(BaselineArgs(
            kind=kind, dataset="fog", synced=synced, seed=seed, epochs=3,
            n_folds_cap=2, synthetic=True, verbose=False,
        ))
        for key in ("skel", "sensor", "avg"):
            np.testing.assert_allclose(
                vm[seed][key], seq[key], atol=2e-2, err_msg=f"{kind}:{seed}:{key}"
            )


def test_vmap_cv_checkpoint_resume(tmp_path):
    """A killed-and-resumed vmapped run reproduces the uninterrupted run
    exactly: one stacked orbax snapshot covers every fold, and resume
    fast-forwards the per-fold host orders and jax key chains."""
    kw = dict(n_folds=2, test_per_class=3, patience=50, wm="gcl", alpha=0.5,
              seed=9, synthetic=True, verbose=False)
    full = run_cv_vmapped(WearGaitArgs(epochs=5, **kw))
    # "crash" after 3 epochs, then resume to 5
    run_cv_vmapped(WearGaitArgs(epochs=3, ckpt_dir=str(tmp_path), **kw))
    resumed = run_cv_vmapped(
        WearGaitArgs(epochs=5, ckpt_dir=str(tmp_path), resume=True, **kw)
    )
    np.testing.assert_allclose(resumed["macro"][0], full["macro"][0], atol=1e-4)
    np.testing.assert_allclose(
        resumed["per_fold_macro"], full["per_fold_macro"], atol=1e-4
    )
    for mk in full["masks"]:
        np.testing.assert_allclose(
            resumed["masks"][mk], full["masks"][mk], atol=1e-4, err_msg=mk
        )


@pytest.mark.parametrize("baseline", ["cheap_xattn", "taca"])
def test_vmap_cv_weargait_baselines_match_sequential(monkeypatch, baseline):
    """--vmap_folds covers the WearGait baseline models too (fusion family +
    the adapter-carrying TACA with its epoch-frac schedule and dropout)."""
    fixed = fixed_length_streams(n_per_class=8, seed=13)
    monkeypatch.setattr(wd, "get_streams", lambda args: fixed)

    kw = dict(
        n_folds=2, test_per_class=3, epochs=3, patience=50, wm="class_wt",
        alpha=0.5, seed=4, synthetic=True, verbose=False, baseline=baseline,
    )
    seq = run_cv(WearGaitArgs(**kw))
    vm = run_cv_vmapped(WearGaitArgs(**kw))
    np.testing.assert_allclose(vm["macro"][0], seq["macro"][0], atol=2e-2)
    for mk in seq["masks"]:
        np.testing.assert_allclose(
            vm["masks"][mk], seq["masks"][mk], atol=2e-2, err_msg=mk
        )
