"""Serving engine tests: relaxed-input prediction over raw streams and
pre-windowed batches, plus checkpoint loading."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gaitpd.models.multitask import WearGaitThreeModal
from gaitpd.serve import CHANNELS, WearGaitEngine


@pytest.fixture(scope="module")
def engine():
    model = WearGaitThreeModal(synchronized=True)
    xs = tuple(jnp.ones((2, 64, c)) for c in (2, 13, 24))
    params = model.init(jax.random.PRNGKey(0), *xs)
    return WearGaitEngine(params, win=64, hop=64)


def test_predict_windows_full_and_subsets(engine):
    rng = np.random.default_rng(0)
    wins = {m: rng.normal(size=(5, 64, c)).astype(np.float32) for m, c in CHANNELS.items()}
    p_full = engine.predict_windows(wins)
    assert p_full.shape == (5, 2)
    np.testing.assert_allclose(p_full.sum(1), 1.0, rtol=1e-5)
    # IMU only — shape-stable, different probabilities
    p_imu = engine.predict_windows({"imu": wins["imu"]})
    assert p_imu.shape == (5, 2)
    assert not np.allclose(p_full, p_imu)


def test_predict_streams_subject_level(engine):
    rng = np.random.default_rng(1)
    streams = {
        "insole": rng.normal(size=(200, 13)).astype(np.float32),
        "imu": rng.normal(size=(190, 24)).astype(np.float32),
    }
    out = engine.predict_streams(streams)
    # min(200//64, 190//64) = 2 windows
    assert out["window_probs"].shape == (2, 2)
    assert out["subject_probs"].shape == (2,)
    assert out["pred"] in (0, 1)


def test_predict_streams_too_short(engine):
    with pytest.raises(ValueError):
        engine.predict_streams({"imu": np.zeros((10, 24), np.float32)})


def test_engine_from_checkpoint(tmp_path, engine):
    from gaitpd.train.checkpoint import save_fold_checkpoint
    from gaitpd.train.step import TrainState

    state = TrainState(
        params=engine.params, opt_state={}, mtl_state={},
        epoch=jnp.asarray(3, jnp.int32),
    )
    save_fold_checkpoint(tmp_path, 1, state, best_metric=90.0, latest=False)
    eng2 = WearGaitEngine.from_checkpoint(tmp_path, fold=1, which="best")
    rng = np.random.default_rng(2)
    wins = {"imu": rng.normal(size=(3, 64, 24)).astype(np.float32)}
    np.testing.assert_allclose(
        eng2.predict_windows(wins), engine.predict_windows(wins), rtol=1e-5
    )


def test_streaming_session(engine):
    try:
        from gaitpd.serve import StreamingSession
        sess = StreamingSession(engine, modalities=("insole", "imu"))
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(3)
    assert sess.poll() is None
    # stream arrives in drips at different rates
    for _ in range(10):
        sess.push("insole", rng.normal(size=(16, 13)))
        sess.push("imu", rng.normal(size=(13, 24)))
    out = sess.poll()
    assert out is not None
    # imu is the slower stream: 130 frames -> 2 windows of 64
    assert out["window_probs"].shape == (2, 2)
    assert sess.poll() is None  # drained


def test_engine_from_vmap_checkpoint(tmp_path):
    """Serving straight from the vmapped-CV stacked snapshot: each fold's
    best params slice out of extras['best_params'] and predict like an
    engine built from those params directly (training -> serving round-trip
    with no sequential re-save)."""
    from gaitpd.train.vmap_cv import run_cv_vmapped
    from gaitpd.train.weargait_driver import WearGaitArgs

    run_cv_vmapped(WearGaitArgs(
        n_folds=2, test_per_class=2, epochs=2, patience=50, wm="gcl",
        alpha=0.5, seed=0, synthetic=True, verbose=False,
        ckpt_dir=str(tmp_path),
    ))
    rng = np.random.default_rng(5)
    wins = {m: rng.normal(size=(3, 64, c)).astype(np.float32)
            for m, c in CHANNELS.items()}
    import orbax.checkpoint as ocp

    stacked = ocp.PyTreeCheckpointer().restore(
        (tmp_path / "vmap" / "latest").resolve()
    )["extras"]["best_params"]
    for fold in range(2):
        eng = WearGaitEngine.from_vmap_checkpoint(tmp_path, fold=fold)
        direct = WearGaitEngine(
            jax.tree_util.tree_map(lambda x: x[fold], stacked)
        )
        np.testing.assert_allclose(
            eng.predict_windows(wins), direct.predict_windows(wins),
            rtol=1e-6, err_msg=f"fold {fold}",
        )
    with pytest.raises(ValueError):
        WearGaitEngine.from_vmap_checkpoint(tmp_path, fold=7)


def test_poll_sessions_batched_matches_per_session(engine):
    """poll_sessions (throughput mode: one batched predict across N
    sessions, grouped by modality subset) returns the same probabilities as
    polling each session individually."""
    try:
        from gaitpd.serve import StreamingSession, poll_sessions
        mk = lambda mods: StreamingSession(engine, modalities=mods)  # noqa: E731
        sessions = [
            mk(("insole", "imu")), mk(("imu",)), mk(("insole", "imu")),
            mk(("walkway", "insole", "imu")), mk(("imu",)),
        ]
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(4)
    pushes = {}  # session idx -> modality -> frames (kept to replay)
    frames_per = [200, 64, 130, 70, 0]  # session 4 stays empty -> None
    for i, (sess, n) in enumerate(zip(sessions, frames_per)):
        pushes[i] = {}
        for m in sess.buffers:
            x = rng.normal(size=(n, {"walkway": 2, "insole": 13, "imu": 24}[m]))
            pushes[i][m] = x
            if n:
                sess.push(m, x)
    batched = poll_sessions(sessions)
    # replay the same frames into fresh sessions and poll individually
    for i, sess in enumerate(sessions):
        ref_sess = StreamingSession(engine, modalities=tuple(sess.buffers))
        for m, x in pushes[i].items():
            if x.shape[0]:
                ref_sess.push(m, x)
        ref = ref_sess.poll()
        if ref is None:
            assert batched[i] is None
        else:
            np.testing.assert_allclose(
                batched[i]["window_probs"], ref["window_probs"], rtol=1e-5,
                err_msg=f"session {i}",
            )
            np.testing.assert_array_equal(batched[i]["pred"], ref["pred"])


def test_poll_sessions_groups_by_engine(engine):
    """Sessions backed by DIFFERENT engines (per-fold params) in the same
    modality subset must each be scored by their own model, not the first
    member's (r3 advisor medium)."""
    try:
        from gaitpd.serve import StreamingSession, poll_sessions
    except Exception as e:  # pragma: no cover
        pytest.skip(f"native import unavailable: {e}")
    model = WearGaitThreeModal(synchronized=True)
    xs = tuple(jnp.ones((2, 64, c)) for c in (2, 13, 24))
    engine2 = WearGaitEngine(model.init(jax.random.PRNGKey(7), *xs))
    try:
        sessions = [StreamingSession(e, modalities=("imu",))
                    for e in (engine, engine2)]
    except Exception as e:
        pytest.skip(f"native build unavailable: {e}")
    rng = np.random.default_rng(6)
    x = rng.normal(size=(64, 24))
    for s in sessions:
        s.push("imu", x)
    batched = poll_sessions(sessions)
    for i, eng in enumerate((engine, engine2)):
        want = eng.predict_windows(
            {"imu": ((x - 0.0) / 1.0).astype(np.float32)[None]}
        )
        np.testing.assert_allclose(
            batched[i]["window_probs"], want, rtol=1e-5,
            err_msg=f"session {i} scored by the wrong engine",
        )
    # the two engines genuinely disagree, so the test has teeth
    assert not np.allclose(batched[0]["window_probs"],
                           batched[1]["window_probs"])
