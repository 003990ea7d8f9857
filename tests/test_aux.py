"""Auxiliary subsystem tests: checkpoint save/resume roundtrip, sweep runner
skip-if-done, profiling counters, every MTL method runs one step."""

import json

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _tiny_state():
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.train.optim import sgd_torch
    from gaitpd.learning.mtl import make_method

    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    tx = sgd_torch(1e-3)
    mtl = make_method("cagrad", 3, c=0.5)
    xs = tuple(jnp.ones((2, 16, c)) for c in (2, 13, 24))
    state, partition = init_train_state(model, tx, mtl, xs, seed=0)
    return model, tx, mtl, partition, state, xs


def test_checkpoint_roundtrip(tmp_path):
    from gaitpd.train.checkpoint import restore_fold_checkpoint, save_fold_checkpoint

    model, tx, mtl, partition, state, xs = _tiny_state()
    state = state.replace(epoch=jnp.asarray(7, jnp.int32))
    save_fold_checkpoint(tmp_path, 1, state, best_metric=83.2, no_improve=3)
    restored, meta = restore_fold_checkpoint(tmp_path, 1, state)
    assert meta["epoch"] == 7 and meta["best_metric"] == 83.2 and meta["no_improve"] == 3
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restore_fold_checkpoint(tmp_path, 2, state) is None


def test_sweep_runner_skip_if_done(tmp_path, capsys):
    from gaitpd import sweep

    out = tmp_path / "sweep"
    args = [
        "--mode", "fusion", "--dataset", "fog", "--synthetic",
        "--fusion_types", "early", "--seeds", "0",
        "--epochs", "1", "--n_folds_cap", "1", "--out", str(out),
    ]
    res1 = sweep.main(args)
    assert res1 == {"done": 1, "skipped": 0, "failed": 0}
    payload = json.loads((out / "fusion_fog_early_seed0.json").read_text())
    assert payload["status"] == "ok"
    res2 = sweep.main(args)
    assert res2 == {"done": 0, "skipped": 1, "failed": 0}


@pytest.mark.parametrize(
    "name",
    ["ls", "uw", "scaleinvls", "rlw", "dwa", "pcgrad", "mgda", "graddrop",
     "log_mgda", "cagrad", "log_cagrad", "imtl", "log_imtl", "nashmtl",
     "famo", "fairgrad", "stl"],
)
def test_every_mtl_method_one_step(name):
    """All 17 weighting methods produce finite losses and update params
    through the shared train step (reference registry METHODS,
    multitask_weighting.py:1342-1361)."""
    from gaitpd.learning.mtl import make_method
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_apply_adapters, make_loss_ctx, make_train_step

    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    tx = sgd_torch(1e-2)
    kwargs = {"main_task": 0} if name == "stl" else {}
    mtl = make_method(name, 3, **kwargs)
    xs = tuple(jnp.asarray(np.random.default_rng(0).normal(size=(8, 16, c)), jnp.float32)
               for c in (2, 13, 24))
    ys = tuple(jnp.asarray(np.arange(8) % 2, jnp.int32) for _ in range(3))
    state, partition = init_train_state(model, tx, mtl, xs, seed=0)
    settings = StepSettings(n_streams=3, wm="ce", synchronized=True)
    ctx = make_loss_ctx(settings, [(5, 3)] * 3)
    ta, _ = make_apply_adapters(model.apply, settings)
    # donate like the real training loop does — catches aliased state leaves
    # (e.g. an init_state() reusing one zeros array for several leaves makes
    # Execute() reject the same buffer donated twice)
    step = jax.jit(make_train_step(ta, tx, settings, mtl, partition),
                   donate_argnums=(0,))
    batch = {"xs": xs, "ys": ys, "valid": jnp.ones((8,), jnp.float32)}
    old_leaves = [np.asarray(x) for x in jax.tree_util.tree_leaves(state.params)]
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), ctx)
    assert np.all(np.isfinite(np.asarray(metrics["losses"])))
    # params actually changed
    diffs = [
        float(np.abs(a - np.asarray(b)).max())
        for a, b in zip(
            old_leaves,
            jax.tree_util.tree_leaves(new_state.params),
        )
    ]
    assert max(diffs) > 0
    # second step with the carried state (exercises FAMO/DWA/Nash state)
    new_state2, metrics2 = step(new_state, batch, jax.random.PRNGKey(1), ctx)
    assert np.all(np.isfinite(np.asarray(metrics2["losses"])))


@pytest.mark.parametrize("remat", ["dots", "nothing"])
def test_remat_step_matches_no_remat(remat):
    """StepSettings.remat only changes the backward-pass schedule
    (jax.checkpoint around the per-stream forward inside the K cotangent
    pullbacks) — the one-step parameter update must be numerically
    equivalent to the default store-everything schedule. The perf outcome
    (remat is SLOWER on v5e — it re-reads the dominant input arrays K
    times) is documented in RESULTS.md round-4."""
    from gaitpd.learning.mtl import make_method
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_apply_adapters, make_loss_ctx, make_train_step

    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    xs = tuple(jnp.asarray(np.random.default_rng(1).normal(size=(8, 16, c)), jnp.float32)
               for c in (2, 13, 24))
    ys = tuple(jnp.asarray(np.arange(8) % 2, jnp.int32) for _ in range(3))
    batch = {"xs": xs, "ys": ys, "valid": jnp.ones((8,), jnp.float32)}

    results = []
    for mode in ("none", remat):
        tx = sgd_torch(1e-2)
        mtl = make_method("cagrad", 3)
        state, partition = init_train_state(model, tx, mtl, xs, seed=0)
        settings = StepSettings(n_streams=3, wm="gcl", synchronized=True,
                                remat=mode)
        ctx = make_loss_ctx(settings, [(5, 3)] * 3)
        ta, _ = make_apply_adapters(model.apply, settings)
        step = jax.jit(make_train_step(ta, tx, settings, mtl, partition))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(0), ctx)
        results.append((jax.tree_util.tree_leaves(new_state.params),
                        np.asarray(metrics["losses"])))
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)
    for a, b in zip(results[0][0], results[1][0]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-5)


def test_step_timer():
    from gaitpd.runtime.profiling import StepTimer

    t = StepTimer()
    t.add(100, 2)
    s = t.summary()
    assert s["windows"] == 100 and s["steps"] == 2
    assert s["windows_per_sec"] > 0


def test_padded_batch_is_noop():
    """A fully-invalid batch (quantized epoch tail) must not move params —
    weight decay/momentum are gated off."""
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_apply_adapters, make_loss_ctx, make_train_step
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state

    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    tx = sgd_torch(1e-2, weight_decay=1e-2)
    xs = tuple(jnp.ones((4, 16, c)) for c in (2, 13, 24))
    state, _ = init_train_state(model, tx, None, xs, seed=0)
    settings = StepSettings(n_streams=3, wm="ce", synchronized=True)
    ctx = make_loss_ctx(settings, [(5, 3)] * 3)
    ta, _ = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(ta, tx, settings, None, None))
    batch = {
        "xs": xs,
        "ys": tuple(jnp.zeros((4,), jnp.int32) for _ in range(3)),
        "valid": jnp.zeros((4,), jnp.float32),  # fully padded
    }
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), ctx)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(new_state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(metrics["n"]) == 0.0


def test_two_level_mesh_dp():
    """Hierarchical DP over a (slices=2, data=4) mesh: one CAGrad train step
    with the batch sharded over both axes."""
    from gaitpd.runtime.mesh import batch_sharding_2d, make_mesh_2d
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_apply_adapters, make_loss_ctx, make_train_step
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.learning.mtl import make_method

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh_2d(2, 4)
    sh = batch_sharding_2d(mesh)
    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    tx = sgd_torch(1e-3)
    mtl = make_method("cagrad", 3, c=0.5)
    b = 16
    xs = tuple(jax.device_put(jnp.ones((b, 16, c)), sh) for c in (2, 13, 24))
    ys = tuple(jax.device_put(jnp.zeros((b,), jnp.int32), sh) for _ in range(3))
    state, part = init_train_state(model, tx, mtl, tuple(x[:2] for x in xs))
    settings = StepSettings(n_streams=3, wm="gcl", synchronized=True,
                            private_grads="sum_plus_own")
    ctx = make_loss_ctx(settings, [(5, 3)] * 3)
    ta, _ = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(ta, tx, settings, mtl, part))
    batch = {"xs": xs, "ys": ys, "valid": jax.device_put(jnp.ones((b,)), sh)}
    new_state, metrics = step(state, batch, jax.random.PRNGKey(0), ctx)
    assert np.all(np.isfinite(np.asarray(metrics["losses"])))


def test_resume_matches_uninterrupted(tmp_path):
    """Checkpoint-resume determinism: 2 epochs + resume to 4 must reproduce
    the uninterrupted 4-epoch run exactly (RNG streams fast-forwarded)."""
    from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

    common = dict(
        n_folds=2, test_per_class=3, patience=50, wm="gcl", alpha=0.5,
        synthetic=True, verbose=False, seed=7, n_folds_cap=1,
    )
    full = run_cv(WearGaitArgs(epochs=4, **common))
    ck = str(tmp_path / "ck")
    run_cv(WearGaitArgs(epochs=2, ckpt_dir=ck, **common))
    resumed = run_cv(WearGaitArgs(epochs=4, ckpt_dir=ck, resume=True, **common))
    assert resumed["macro"][0] == pytest.approx(full["macro"][0], abs=1e-4)
    for k in full["masks"]:
        assert resumed["masks"][k] == pytest.approx(full["masks"][k], abs=1e-4)
