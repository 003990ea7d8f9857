"""On-device train-time augmentation stage (VERDICT r4 item 5).

The reference ships MirrorReflection / RandomRotation / RandomNoise /
axis_mask (common.py:93-273) but no driver ever applies them; gaitpd wires
them INSIDE the jitted train step (gaitpd/data/augment.py::augment_stream,
StepSettings.augment) with per-step PRNG keys and traced-operand strengths.
These tests pin: exact identity at zero strengths, transform semantics
against the oracle-tested primitives, strength sweeps without recompiles,
and the end-to-end driver path.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gaitpd.data.augment import (  # noqa: E402
    AugmentSpec,
    augment_stream,
    make_aug_params,
    mirror_reflection,
)


def _x(b=6, t=5, c=21, seed=0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=(b, t, c)), jnp.float32
    )


def test_identity_at_zero_strengths_skeleton():
    x = _x(c=51)
    spec = AugmentSpec(joints=17, mirror=True, rotation=True, noise=True,
                       axis_mask=True)
    y = augment_stream(x, jax.random.PRNGKey(0), spec, make_aug_params())
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_identity_at_zero_strengths_sensor():
    x = _x(c=13)
    spec = AugmentSpec(noise=True, axis_mask=True)
    y = augment_stream(x, jax.random.PRNGKey(0), spec, make_aug_params())
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_mirror_p1_matches_primitive():
    x = _x(c=51)
    spec = AugmentSpec(joints=17, mirror=True)
    y = augment_stream(
        x, jax.random.PRNGKey(1), spec, make_aug_params(mirror_p=1.0)
    )
    expect = mirror_reflection(
        x.reshape(x.shape[0], x.shape[1], 17, 3)
    ).reshape(x.shape)
    np.testing.assert_allclose(np.asarray(y), np.asarray(expect))


def test_axis_mask_channel_mode():
    x = _x(c=13) + 10.0  # strictly nonzero so zeroed channels are detectable
    spec = AugmentSpec(axis_mask=True)
    y = np.asarray(
        augment_stream(x, jax.random.PRNGKey(2), spec,
                       make_aug_params(axis_p=1.0))
    )
    zeroed = np.all(y == 0.0, axis=1)  # (B, C)
    assert np.all(zeroed.sum(axis=1) == 1), "exactly one channel per sample"
    kept = ~zeroed
    np.testing.assert_allclose(y[:, :, :][np.repeat(kept[:, None, :], 5, 1)],
                               np.asarray(x)[np.repeat(kept[:, None, :], 5, 1)])


def test_rotation_preserves_norms():
    x = _x(c=51)
    spec = AugmentSpec(joints=17, rotation=True)
    y = augment_stream(
        x, jax.random.PRNGKey(3), spec, make_aug_params(rot_deg=30.0)
    )
    s = np.asarray(x).reshape(6, 5, 17, 3)
    r = np.asarray(y).reshape(6, 5, 17, 3)
    assert not np.allclose(r, s)
    np.testing.assert_allclose(
        np.linalg.norm(r, axis=-1), np.linalg.norm(s, axis=-1), rtol=1e-4
    )


def test_noise_std_scales():
    x = _x(c=13)
    spec = AugmentSpec(noise=True)
    y = augment_stream(
        x, jax.random.PRNGKey(4), spec, make_aug_params(noise_std=0.5)
    )
    d = np.asarray(y) - np.asarray(x)
    assert 0.3 < d.std() < 0.7


def test_strength_sweep_does_not_recompile():
    """Strengths ride in ctx[0]["aug"] as operands: sweeping them (and
    turning the stage numerically off) reuses ONE compiled train step."""
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings,
        make_apply_adapters,
        make_loss_ctx,
        make_train_step,
    )

    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    xs = tuple(_x(b=8, t=16, c=c, seed=c) for c in (2, 13, 24))
    ys = tuple(jnp.asarray([0, 1] * 4, jnp.int32) for _ in range(3))
    batch = {"xs": xs, "ys": ys, "valid": jnp.ones((8,), jnp.float32)}
    spec = AugmentSpec(noise=True, axis_mask=True)
    settings = StepSettings(n_streams=3, wm="ce", synchronized=True,
                            augment=(spec,) * 3)
    tx = sgd_torch(1e-3)
    state, partition = init_train_state(model, tx, None, tuple(x[:2] for x in xs))
    ta, _ = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(ta, tx, settings, None, partition))

    def ctx_for(noise_std, axis_p):
        return make_loss_ctx(
            settings, [(4, 4)] * 3,
            aug_params=tuple(
                make_aug_params(noise_std=noise_std, axis_p=axis_p)
                for _ in range(3)
            ),
        )

    s0, m0 = step(state, batch, jax.random.PRNGKey(0), ctx_for(0.0, 0.0))
    jax.block_until_ready(m0["losses"])
    misses0 = step._cache_size()
    losses = {}
    for noise_std, axis_p in [(0.0, 0.0), (0.1, 0.0), (0.5, 0.5), (0.0, 1.0)]:
        _, m = step(state, batch, jax.random.PRNGKey(0),
                    ctx_for(noise_std, axis_p))
        losses[(noise_std, axis_p)] = np.asarray(m["losses"])
    assert step._cache_size() == misses0, "strength sweep must not recompile"
    # zero strengths == the (identical-rng) baseline; nonzero ones differ
    np.testing.assert_array_equal(losses[(0.0, 0.0)], np.asarray(m0["losses"]))
    assert not np.allclose(losses[(0.5, 0.5)], losses[(0.0, 0.0)])


def test_weargait_single_mod_augmentation(monkeypatch):
    """--single_mod sub-driver (run_single_mod_fold) applies the sensor
    augmentation stage too — same spy-based witness as the 3-stream test,
    pinned after r5 wired weargait_aug_config into the n_streams=1 paths."""
    import gaitpd.data.augment as A

    calls = []
    orig = A.augment_stream

    def spy(x, key, spec, params):
        calls.append(spec)
        return orig(x, key, spec, params)

    monkeypatch.setattr(A, "augment_stream", spy)

    from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

    out = run_cv(WearGaitArgs(
        n_folds=2, test_per_class=2, epochs=2, patience=50, wm="ce",
        alpha=0.5, seed=0, synthetic=True, verbose=False, n_folds_cap=1,
        single_mod="insole", aug_noise_std=0.3, aug_axis_p=0.3,
    ))
    assert np.isfinite(out["macro"][0])
    assert calls and all(s.noise and s.axis_mask and s.joints is None
                         for s in calls)


@pytest.mark.parametrize("driver", ["weargait", "fbg_fog"])
def test_driver_end_to_end_with_augmentation(driver, monkeypatch):
    """The CLI-reachable path: the aug flags reach the jitted train step
    (asserted via a trace-time spy on augment_stream — accuracy at 2 tiny
    epochs is too quantized to witness small perturbations), training
    completes, and metrics stay finite."""
    import gaitpd.data.augment as A

    calls = []
    orig = A.augment_stream

    def spy(x, key, spec, params):
        calls.append(spec)
        return orig(x, key, spec, params)

    monkeypatch.setattr(A, "augment_stream", spy)

    if driver == "weargait":
        from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

        kw = dict(n_folds=2, test_per_class=2, epochs=2, patience=50,
                  wm="ce", alpha=0.5, seed=0, synthetic=True, verbose=False,
                  n_folds_cap=1)
        aug = run_cv(WearGaitArgs(**kw, aug_noise_std=0.3, aug_axis_p=0.3))
        assert np.isfinite(aug["macro"][0])
        assert len(calls) >= 3 and all(s.noise and s.axis_mask for s in calls)
    else:
        from gaitpd.train.fbg_fog_driver import FbgFogArgs
        from gaitpd.train.fbg_fog_driver import main as fbg_main

        kw = dict(dataset="fog", modality="multimodal", wm="ce", alpha=0.0,
                  epochs=2, synthetic=True, n_folds_cap=1, verbose=False,
                  seed=0)
        aug = fbg_main(FbgFogArgs(**kw, aug_mirror_p=0.5, aug_rot_deg=20.0,
                                  aug_noise_std=0.1, aug_axis_p=0.2))
        for v in aug["multimodal"].values():
            assert np.isfinite(v)
        # stream 0 = skeleton (spatial ops, joints set), stream 1 = sensor
        assert any(s.joints == 7 and s.mirror and s.rotation for s in calls)
        assert any(s.joints is None and s.noise for s in calls)
