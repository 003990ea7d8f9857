"""Forward-pass numerical parity against the torch reference models.

The reference implementation (mounted read-only at /root/reference) is used
purely as a TEST ORACLE: we initialise the gaitpd flax models, transplant the
parameters into the reference's torch modules, and assert the forward passes
agree to float32 tolerance. Skipped when the reference tree is absent.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REF = Path("/root/reference")
pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference tree absent")

if REF.exists():
    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF / "data" / "WearGait"))

import torch  # noqa: E402

RNG = np.random.default_rng(0)


def t_(x):
    return torch.from_numpy(np.asarray(x))


def load_linear(mod, p):  # flax TorchLinear -> torch nn.Linear
    d = p["Dense_0"]
    mod.weight.data = t_(d["kernel"]).T.contiguous()
    if "bias" in d:
        mod.bias.data = t_(d["bias"])


def load_conv(mod, p):  # flax Conv1dSame -> torch nn.Conv1d
    c = p["Conv_0"]
    mod.weight.data = t_(c["kernel"]).permute(2, 1, 0).contiguous()
    mod.bias.data = t_(c["bias"])


def load_ln(mod, p):
    mod.weight.data = t_(p["scale"])
    mod.bias.data = t_(p["bias"])


def test_multimodal_multitask_forward_parity():
    from feature_encoder import MultiModalMultiTaskModel as RefModel

    from gaitpd.models.multitask import MultiModalMultiTask

    ours = MultiModalMultiTask(
        skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
        num_classes=3,
    )
    x_skel = jnp.asarray(RNG.normal(size=(4, 101, 21)), jnp.float32)
    x_sens = jnp.asarray(RNG.normal(size=(4, 426, 6)), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(0), x_skel, x_sens)
    ours_out = ours.apply(variables, x_skel, x_sens)

    ref = RefModel(
        skeleton_input_dim=21, skeleton_output_dim=6,
        sensor_in_channels=6, sensor_out_channels=6, sensor_length=426,
        shared_out_channels=16, backbone_dim=8, taskhead_input_dim=128,
        num_classes=3,
    ).eval()
    p = variables["params"]
    load_linear(ref.skeleton_encoder.fc1, p["skeleton_encoder"]["TorchLinear_0"])
    load_ln(ref.skeleton_encoder.ln1, p["skeleton_encoder"]["LayerNorm_0"])
    load_conv(ref.sensor_encoder.conv1d, p["sensor_encoder"]["Conv1dSame_0"])
    load_conv(ref.backbone.conv1d, p["backbone"]["Conv1dSame_0"])
    load_linear(ref.task_head_skel.fc, p["task_head_skel"]["TorchLinear_0"])
    load_linear(ref.task_head_sensor.fc, p["task_head_sensor"]["TorchLinear_0"])

    with torch.no_grad():
        ref_sk, ref_se = ref(t_(x_skel), t_(x_sens))
    np.testing.assert_allclose(np.asarray(ours_out[0]), ref_sk.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ours_out[1]), ref_se.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_weargait_three_modal_forward_parity():
    from weargait_encoders import WearGaitThreeModal as RefModel

    from gaitpd.models.multitask import WearGaitThreeModal

    ours = WearGaitThreeModal(synchronized=False)
    xw = jnp.asarray(RNG.normal(size=(4, 64, 2)), jnp.float32)
    xi = jnp.asarray(RNG.normal(size=(4, 64, 13)), jnp.float32)
    xm = jnp.asarray(RNG.normal(size=(4, 64, 24)), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(1), xw, xi, xm)
    ours_out = ours.apply(variables, xw, xi, xm)

    ref = RefModel(synchronized=False).eval()
    p = variables["params"]
    # walkway: conv + ln
    load_conv(ref.enc_w.conv, p["enc_w"]["Conv1dSame_0"])
    load_ln(ref.enc_w.ln, p["enc_w"]["LayerNorm_0"])
    # insole: conv1(k5) + conv2(k3) + skip(1x1) + ln2
    load_conv(ref.enc_i.conv1, p["enc_i"]["Conv1dSame_0"])
    load_conv(ref.enc_i.conv2, p["enc_i"]["Conv1dSame_1"])
    load_conv(ref.enc_i.skip, p["enc_i"]["Conv1dSame_2"])
    load_ln(ref.enc_i.ln2, p["enc_i"]["LayerNorm_0"])
    # imu: conv + ln
    load_conv(ref.enc_m.conv, p["enc_m"]["Conv1dSame_0"])
    load_ln(ref.enc_m.ln, p["enc_m"]["LayerNorm_0"])
    # backbone + heads
    load_conv(ref.backbone.conv, p["backbone"]["Conv1dSame_0"])
    load_linear(ref.head_w.fc, p["head_w"]["TorchLinear_0"])
    load_linear(ref.head_i.fc, p["head_i"]["TorchLinear_0"])
    load_linear(ref.head_m.fc, p["head_m"]["TorchLinear_0"])

    with torch.no_grad():
        ref_out = ref(t_(xw), t_(xi), t_(xm))
    for a, b in zip(ours_out, ref_out):
        np.testing.assert_allclose(np.asarray(a), b.numpy(), rtol=1e-4, atol=1e-5)


def test_cheap_xattn_model_forward_parity():
    from feature_encoder import CheapXAttnModel as RefModel

    from gaitpd.models.fusion import CheapXAttnModel

    ours = CheapXAttnModel(
        skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
        num_classes=3, synchronized_loading=True,
    )
    x_skel = jnp.asarray(RNG.normal(size=(2, 101, 21)), jnp.float32)
    x_sens = jnp.asarray(RNG.normal(size=(2, 426, 6)), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(2), x_skel, x_sens)
    ours_out = ours.apply(variables, x_skel, x_sens)

    ref = RefModel(
        skeleton_input_dim=21, skeleton_output_dim=6, sensor_in_channels=6,
        sensor_out_channels=6, sensor_length=426, shared_out_channels=16,
        backbone_dim=8, num_classes=3, synchronized_loading=True,
    ).eval()
    p = variables["params"]
    load_linear(ref.skel_enc.fc1, p["skel_enc"]["TorchLinear_0"])
    load_ln(ref.skel_enc.ln1, p["skel_enc"]["LayerNorm_0"])
    load_conv(ref.sens_enc.conv1d, p["sens_enc"]["Conv1dSame_0"])
    load_conv(ref.backbone.conv1d, p["backbone"]["Conv1dSame_0"])
    load_linear(ref.head, p["head"])

    with torch.no_grad():
        ref_out = ref(t_(x_skel), t_(x_sens))
    np.testing.assert_allclose(np.asarray(ours_out), ref_out.numpy(),
                               rtol=1e-4, atol=1e-5)
