"""Shape/compile tests across the full model zoo (SURVEY.md §4(c)): every
model family initialises and produces correctly-shaped logits, and the
relaxed-input mask changes no shapes."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gaitpd.models import baselines as B  # noqa: E402
from gaitpd.models import fusion as FU  # noqa: E402
from gaitpd.models.multitask import (  # noqa: E402
    MultiModalMultiTask,
    SensorModalityModel,
    SkelModalityModel,
    WearGaitThreeModal,
)

KEY = jax.random.PRNGKey(0)
B_ = 4


def _fog_inputs():
    return jnp.ones((B_, 101, 21)), jnp.ones((B_, 426, 6))


def _wg_inputs():
    return jnp.ones((B_, 64, 2)), jnp.ones((B_, 64, 13)), jnp.ones((B_, 64, 24))


@pytest.mark.parametrize("sync", [False, True])
def test_multimodal_multitask(sync):
    m = MultiModalMultiTask(
        skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
        synchronized_loading=sync,
    )
    xs = _fog_inputs()
    p = m.init(KEY, *xs)
    a, b = m.apply(p, *xs)
    assert a.shape == b.shape == (B_, 3)
    bound = m.bind(p)
    assert "backbone" in bound.shared_modules
    assert len(bound.task_modules) == 2


def test_single_modality_models():
    sk = SkelModalityModel(skeleton_output_dim=6)
    x = jnp.ones((B_, 101, 21))
    assert sk.apply(sk.init(KEY, x), x).shape == (B_, 3)
    se = SensorModalityModel(sensor_out_channels=6, sensor_length=426)
    x2 = jnp.ones((B_, 426, 6))
    assert se.apply(se.init(KEY, x2), x2).shape == (B_, 3)


@pytest.mark.parametrize("sync", [False, True])
def test_weargait_three_modal(sync):
    m = WearGaitThreeModal(synchronized=sync, use_cosine=sync)
    xs = _wg_inputs()
    p = m.init(KEY, *xs)
    outs = m.apply(p, *xs)
    assert all(o.shape == (B_, 2) for o in outs)
    y = m.apply(p, xs[1], "insole", method=WearGaitThreeModal.forward_single)
    assert y.shape == (B_, 2)


@pytest.mark.parametrize("name", list(FU.TWO_MOD_FUSIONS))
@pytest.mark.parametrize("sync", [False, True])
def test_two_mod_fusions(name, sync):
    cls = FU.TWO_MOD_FUSIONS[name]
    m = cls(
        skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
        synchronized_loading=sync,
    )
    xs = _fog_inputs()
    p = m.init(KEY, *xs)
    out = m.apply(p, *xs)
    if sync and name != "share_latent":
        assert out.shape == (B_, 3)
    else:
        assert out[0].shape == out[1].shape == (B_, 3)


@pytest.mark.parametrize("cls", [FU.EarlyFusion3, FU.LateFusion3, FU.SharedLatent3, FU.CheapXAttn3])
@pytest.mark.parametrize("sync", [False, True])
def test_three_mod_fusions(cls, sync):
    m = cls(synchronized=sync)
    xs = _wg_inputs()
    p = m.init(KEY, *xs)
    outs = m.apply(p, *xs)
    assert all(o.shape == (B_, 2) for o in outs)


def test_cheap_xattn3_mask_shape_stable():
    m = FU.CheapXAttn3(synchronized=True)
    xs = _wg_inputs()
    p = m.init(KEY, *xs)
    full = m.apply(p, *xs, mask=jnp.asarray([True, True, True]))
    part = m.apply(p, *xs, mask=jnp.asarray([True, False, True]))
    assert full[0].shape == part[0].shape == (B_, 2)
    assert not np.allclose(np.asarray(full[0]), np.asarray(part[0]))


@pytest.mark.parametrize("sync", [False, True])
def test_deepav_lite_2mod(sync):
    m = B.DeepAVLite(num_classes=3, synchronized=sync)
    xs = _fog_inputs()
    xs = (xs[0], xs[1])
    p = m.init(KEY, *xs)
    out = m.apply(p, *xs)
    if sync:
        assert out.shape == (B_, 3)
    else:
        assert out[0].shape == out[1].shape == (B_, 3)


@pytest.mark.parametrize("sync", [False, True])
def test_deepav_lite3(sync):
    m = B.DeepAVLite3(num_classes=2, synchronized=sync, depth=1, embed_dim=24)
    xs = _wg_inputs()
    p = m.init(KEY, *xs)
    outs = m.apply(p, *xs)
    assert all(o.shape == (B_, 2) for o in outs)
    # dropout path trains with an rng
    outs_t = m.apply(p, *xs, train=True, rngs={"dropout": KEY})
    assert outs_t[0].shape == (B_, 2)


def test_deepav_patch_embed_init_laws():
    """Default = lecun_normal kernel + ZERO bias (a masked-out stream
    tokenizes to LN's trained beta — see PatchEmbed1D docstring);
    torch_init=True = the reference's Conv1d law, uniform(+-1/sqrt(fan_in))
    for kernel AND bias (reference deepav.py:13 via torch defaults)."""
    xs = _wg_inputs()
    fan_in = 8 * xs[2].shape[-1]  # patch * in_dim of the imu tokenizer
    bound = 1.0 / np.sqrt(fan_in)

    m = B.DeepAVLite3(num_classes=2, synchronized=True)
    conv = m.init(KEY, *xs)["params"]["core"]["tk_imu"]["Conv_0"]
    assert np.all(np.asarray(conv["bias"]) == 0.0)
    kstd = float(np.asarray(conv["kernel"]).std())
    assert abs(kstd - bound) < 0.2 * bound  # lecun_normal: std == 1/sqrt(fan_in)

    m = B.DeepAVLite3(num_classes=2, synchronized=True, torch_init=True)
    conv = m.init(KEY, *xs)["params"]["core"]["tk_imu"]["Conv_0"]
    for name in ("kernel", "bias"):
        v = np.asarray(conv[name])
        assert np.abs(v).max() <= bound + 1e-7
        assert np.abs(v).max() > 0.9 * bound  # actually fills the range
        assert abs(v.std() - bound / np.sqrt(3)) < 0.15 * bound


def test_deepav_masked_stream_tokenizes_to_ln_bias():
    """With the default init law, a zero-filled (masked) stream's patch
    tokens are exactly LayerNorm's bias (zero at init): conv(0)+0 bias = 0,
    and LN maps an all-zero vector to beta. This is the mechanism behind
    the relaxed-input advantage measured in PARITY.md round 5."""
    from gaitpd.models.baselines import PatchEmbed1D

    pe = PatchEmbed1D(embed_dim=16, patch=8, stride=8)
    x = jnp.zeros((2, 64, 24))
    p = pe.init(KEY, x)
    out = pe.apply(p, x)
    beta = p["params"]["LayerNorm_0"]["bias"]
    assert np.allclose(np.asarray(out), np.asarray(beta), atol=1e-6)

    pe_t = PatchEmbed1D(embed_dim=16, patch=8, stride=8, torch_init=True)
    p_t = pe_t.init(KEY, x)
    out_t = pe_t.apply(p_t, x)
    # torch law: random per-channel conv bias -> LN variance-normalizes it
    # into a unit-scale garbage token instead
    assert float(np.abs(np.asarray(out_t)).max()) > 0.5


@pytest.mark.parametrize("sync", [False, True])
def test_focal_2mod(sync):
    m = B.FOCALSharedLatent(
        skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
        num_classes=3, synchronized=sync,
    )
    xs = _fog_inputs()
    p = m.init(KEY, *xs)
    out = m.apply(p, *xs)
    if sync:
        assert out.shape == (B_, 3)
    else:
        assert out[0].shape == out[1].shape == (B_, 3)


@pytest.mark.parametrize("sync", [False, True])
def test_focal_3mod(sync):
    m = B.FOCALSharedLatent3(synchronized=sync, d_shared=16, d_private=8)
    xs = _wg_inputs()
    p = m.init(KEY, *xs)
    outs = m.apply(p, *xs)
    assert all(o.shape == (B_, 2) for o in outs)


@pytest.mark.parametrize("sync", [False, True])
def test_taca_2mod(sync):
    m = B.TACAWrapper(
        skel_t=101, skel_d=21, sens_t=426, sens_d=6, num_classes=3,
        d_model=32, synchronized=sync,
    )
    xs = (jnp.ones((B_, 101 * 21)), jnp.ones((B_, 426 * 6)))
    p = m.init(KEY, *xs)
    out = m.apply(p, *xs)
    if sync:
        assert out.shape == (B_, 3)
    else:
        assert out[0].shape == out[1].shape == (B_, 3)


@pytest.mark.parametrize("sync", [False, True])
def test_taca_3mod(sync):
    m = B.TACA3TriWrapper(win_len=64, num_classes=2, d_model=32, synchronized=sync)
    xs = (jnp.ones((B_, 64 * 2)), jnp.ones((B_, 64 * 13)), jnp.ones((B_, 64 * 24)))
    p = m.init(KEY, *xs)
    outs = m.apply(p, *xs, train=False, epoch_frac=0.3)
    assert all(o.shape == (B_, 2) for o in outs)
