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
    sys.path.insert(0, str(REF / "train" / "baselines" / "architectures"))

import torch  # noqa: E402

RNG = np.random.default_rng(0)


def t_(x):
    # copy: torch.from_numpy would alias the jax buffer for non-contiguous-
    # free loads (biases, LN params); an in-place torch optimizer step would
    # then silently mutate the flax variables (bit the matched-parity
    # harness in round 4 — see scripts/parity_matched.py::_transplant)
    return torch.from_numpy(np.asarray(x).copy())


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


def test_weargait_three_modal_sync_forward_parity():
    """synchronized=True: ONE shared head on both sides (reference
    weargait_encoders.py:133-136 aliases head_w/head_i/head_m to
    _shared_head; gaitpd names it head_shared). This is the transplant
    recipe scripts/parity_weargait_matched.py relies on."""
    from weargait_encoders import WearGaitThreeModal as RefModel

    from gaitpd.models.multitask import WearGaitThreeModal

    ours = WearGaitThreeModal(synchronized=True)
    xw = jnp.asarray(RNG.normal(size=(4, 64, 2)), jnp.float32)
    xi = jnp.asarray(RNG.normal(size=(4, 64, 13)), jnp.float32)
    xm = jnp.asarray(RNG.normal(size=(4, 64, 24)), jnp.float32)
    variables = ours.init(jax.random.PRNGKey(3), xw, xi, xm)
    ours_out = ours.apply(variables, xw, xi, xm)

    ref = RefModel(synchronized=True).eval()
    p = variables["params"]
    load_conv(ref.enc_w.conv, p["enc_w"]["Conv1dSame_0"])
    load_ln(ref.enc_w.ln, p["enc_w"]["LayerNorm_0"])
    load_conv(ref.enc_i.conv1, p["enc_i"]["Conv1dSame_0"])
    load_conv(ref.enc_i.conv2, p["enc_i"]["Conv1dSame_1"])
    load_conv(ref.enc_i.skip, p["enc_i"]["Conv1dSame_2"])
    load_ln(ref.enc_i.ln2, p["enc_i"]["LayerNorm_0"])
    load_conv(ref.enc_m.conv, p["enc_m"]["Conv1dSame_0"])
    load_ln(ref.enc_m.ln, p["enc_m"]["LayerNorm_0"])
    load_conv(ref.backbone.conv, p["backbone"]["Conv1dSame_0"])
    load_linear(ref._shared_head.fc, p["head_shared"]["TorchLinear_0"])

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


def load_taskhead(mod, p):
    """reference TaskHead/Task_Head (linear variant) <- gaitpd TaskHead."""
    load_linear(mod.fc, p["TorchLinear_0"])


def test_focal_2mod_forward_parity():
    """FOCAL 2-mod (reference focal.py:10-138): shared/private projectors,
    ReLU SharedBackbone, sync mean-fuse + async zero-filled privates — both
    paths, with the focal driver's dims (focal_train.py:100-104)."""
    from feature_encoder import SensorEncoder as _  # noqa: F401 (path check)
    from focal import FOCALSharedLatentBaseline as RefModel

    from gaitpd.models.baselines import FOCALSharedLatent

    kw = dict(skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
              d_shared=16, d_private=8, shared_out_channels=4, backbone_dim=4,
              num_classes=3)
    x_skel = jnp.asarray(RNG.normal(size=(3, 101, 21)), jnp.float32)
    x_sens = jnp.asarray(RNG.normal(size=(3, 426, 6)), jnp.float32)

    for sync in (True, False):
        ours = FOCALSharedLatent(synchronized=sync, **kw)
        variables = ours.init(jax.random.PRNGKey(3), x_skel, x_sens)
        ours_out = ours.apply(variables, x_skel, x_sens)
        p = variables["params"]

        ref = RefModel(
            skeleton_input_dim=21, skeleton_output_dim=6,
            sensor_in_channels=6, sensor_out_channels=6, sensor_length=426,
            d_shared=16, d_private=8, shared_out_channels=4, backbone_dim=4,
            num_classes=3,
        ).eval()
        load_linear(ref.skel_enc.fc1, p["skel_enc"]["TorchLinear_0"])
        load_ln(ref.skel_enc.ln1, p["skel_enc"]["LayerNorm_0"])
        load_conv(ref.sens_enc.conv1d, p["sens_enc"]["Conv1dSame_0"])
        for nm in ("sk_sh", "sk_pr", "im_sh", "im_pr"):
            load_linear(getattr(ref, nm), p[nm])
        load_conv(ref.backbone.conv1d, p["backbone"]["Conv1dSame_0"])
        with torch.no_grad():
            if sync:
                load_taskhead(ref.head_sync, p["head_sync"])
                ref_out, _ = ref(t_(x_skel), t_(x_sens), synced=True)
                np.testing.assert_allclose(
                    np.asarray(ours_out), ref_out.numpy(), rtol=1e-4, atol=1e-5
                )
            else:
                load_taskhead(ref.head_skel, p["head_skel"])
                load_taskhead(ref.head_sensor, p["head_sensor"])
                ref_s, ref_m = ref(t_(x_skel), t_(x_sens), synced=False)
                np.testing.assert_allclose(
                    np.asarray(ours_out[0]), ref_s.numpy(), rtol=1e-4, atol=1e-5
                )
                np.testing.assert_allclose(
                    np.asarray(ours_out[1]), ref_m.numpy(), rtol=1e-4, atol=1e-5
                )


def test_focal_3mod_forward_parity():
    """FOCAL 3-mod (reference focal.py:198-323): raw-window projectors, the
    FOCAL-local GELU backbone, sync one aliased head / async three heads."""
    from focal import FOCALSharedLatent3 as RefModel

    from gaitpd.models.baselines import FOCALSharedLatent3

    xw = jnp.asarray(RNG.normal(size=(3, 64, 2)), jnp.float32)
    xi = jnp.asarray(RNG.normal(size=(3, 64, 13)), jnp.float32)
    xm = jnp.asarray(RNG.normal(size=(3, 64, 24)), jnp.float32)
    kw = dict(d_shared=32, d_private=16, shared_out_ch=8, backbone_dim=4,
              num_classes=2)

    for sync in (True, False):
        ours = FOCALSharedLatent3(synchronized=sync, **kw)
        variables = ours.init(jax.random.PRNGKey(4), xw, xi, xm)
        ours_out = ours.apply(variables, xw, xi, xm)
        p = variables["params"]

        ref = RefModel(
            w_in_dim=2, i_in_dim=13, m_in_dim=24, d_shared=32, d_private=16,
            shared_out_ch=8, backbone_dim=4, num_classes=2, synchronized=sync,
        ).eval()
        for nm in ("w_sh", "w_pr", "i_sh", "i_pr", "m_sh", "m_pr"):
            load_linear(getattr(ref, nm), p[nm])
        load_conv(ref.backbone.conv, p["backbone"]["Conv1dSame_0"])
        with torch.no_grad():
            if sync:
                load_taskhead(ref.head, p["head_shared"])
            else:
                load_taskhead(ref.head_w, p["head_w"])
                load_taskhead(ref.head_i, p["head_i"])
                load_taskhead(ref.head_m, p["head_m"])
            ref_out = ref(t_(xw), t_(xi), t_(xm))
        for a, b in zip(ours_out, ref_out):
            np.testing.assert_allclose(
                np.asarray(a), b.numpy(), rtol=1e-4, atol=1e-5
            )


def test_taca_2mod_forward_parity():
    """TACA 2-mod (reference taca.py:10-171): time-shared tokenizers, the
    gamma/tau-scaled bidirectional cross-attention, sync joint head on the
    averaged pools + async per-modality heads. gamma schedule 'epoch' is
    exercised at epoch_frac=0.25."""
    from taca import TACAWrapper as RefModel

    from gaitpd.models.baselines import TACAWrapper

    ts, ds, te, de = 101, 21, 426, 6
    x_s = jnp.asarray(RNG.normal(size=(3, ts * ds)), jnp.float32)
    x_e = jnp.asarray(RNG.normal(size=(3, te * de)), jnp.float32)
    kw = dict(skel_t=ts, skel_d=ds, sens_t=te, sens_d=de, num_classes=3,
              d_model=32, n_heads=4, n_tok_s=4, n_tok_e=4, tau=1.3, gamma=1.5,
              schedule="epoch", drop=0.0)

    for sync in (True, False):
        ours = TACAWrapper(synchronized=sync, **kw)
        variables = ours.init(jax.random.PRNGKey(5), x_s, x_e)
        ours_out = ours.apply(variables, x_s, x_e, epoch_frac=0.25)
        p = variables["params"]

        ref = RefModel(
            skel_T_frames=ts, skel_D_frame=ds, sens_T_frames=te,
            sens_D_frame=de, num_classes=3, d_model=32, n_heads=4, n_tok_s=4,
            n_tok_e=4, tau=1.3, gamma=1.5, schedule="epoch", dropout=0.0,
        ).eval()
        ref.set_epoch_frac(0.25)
        load_linear(ref.tk_s.frame_proj, p["tk_s"]["frame_proj"])
        load_linear(ref.tk_e.frame_proj, p["tk_e"]["frame_proj"])
        fz = p["fuser"]
        # a=skel, b=sens in gaitpd naming
        for ref_nm, our_nm in [("q_s2e", "q_a2b"), ("k_e", "k_b"),
                               ("v_e", "v_b"), ("o_e", "o_b"),
                               ("q_e2s", "q_b2a"), ("k_s", "k_a"),
                               ("v_s", "v_a"), ("o_s", "o_a")]:
            load_linear(getattr(ref.fuser, ref_nm), fz[our_nm])
        with torch.no_grad():
            if sync:
                load_linear(ref.head_joint, p["head_joint"])
                ref_out, _ = ref(t_(x_s), t_(x_e), synced=True)
                np.testing.assert_allclose(
                    np.asarray(ours_out), ref_out.numpy(), rtol=1e-4, atol=1e-5
                )
            else:
                load_linear(ref.head_skel, p["head_skel"])
                load_linear(ref.head_sens, p["head_sens"])
                ref_s, ref_e = ref(t_(x_s), t_(x_e), synced=False)
                np.testing.assert_allclose(
                    np.asarray(ours_out[0]), ref_s.numpy(), rtol=1e-4, atol=1e-5
                )
                np.testing.assert_allclose(
                    np.asarray(ours_out[1]), ref_e.numpy(), rtol=1e-4, atol=1e-5
                )


def test_deepav_2mod_forward_parity():
    """DeepAV-Lite 2-mod with the deepav driver's tiny config (embed 12,
    depth 1, heads 4, attention bottleneck 8, shared blocks,
    deepav_train.py:40-47): tokenizers + type/pos embeddings, shared
    transformer block, aggregation cross-attn, fusion tokens + CLS, joint
    (sync) and per-branch (async) heads."""
    from deepav import DeepAVLite as RefModel

    from gaitpd.models.baselines import DeepAVLite

    x_s = jnp.asarray(RNG.normal(size=(2, 101, 21)), jnp.float32)
    x_e = jnp.asarray(RNG.normal(size=(2, 426, 6)), jnp.float32)

    for sync in (True, False):
        ours = DeepAVLite(num_classes=3, synchronized=sync)
        variables = ours.init(jax.random.PRNGKey(6), x_s, x_e)
        ours_out = ours.apply(variables, x_s, x_e)
        p = variables["params"]["core"]

        ref = RefModel(
            skel_in_dim=21, sens_in_dim=6, num_classes=3,
            embed_dim=12, depth=1, heads=4, mlp_ratio=0.5,
            skel_patch=1, sens_patch=1, stride=4, drop=0.0,
            n_agg=1, n_fusion=1, use_cls=sync, pool="cls" if sync else "mean",
            share_blocks=True, share_unimodal=True, attn_bottleneck=8,
        ).eval()
        # tokenizers (Conv1d k=1 s=4 + LayerNorm)
        for ref_tk, our_tk in [(ref.tk_s, "tk_skel"), (ref.tk_e, "tk_sens")]:
            c = p[our_tk]["Conv_0"]
            ref_tk.proj.weight.data = t_(c["kernel"]).permute(2, 1, 0).contiguous()
            ref_tk.proj.bias.data = t_(c["bias"])
            load_ln(ref_tk.ln, p[our_tk]["LayerNorm_0"])
        # type embeddings + aggregation queries + fusion tokens
        ref.type_s.data = t_(p["type_skel"])
        ref.type_e.data = t_(p["type_sens"])
        ref.agg_s_q.data = t_(p["agg_q_skel"])
        ref.agg_e_q.data = t_(p["agg_q_sens"])
        ref.fus_tok.data = t_(p["fus_tok"])
        if sync:
            ref.type_c.data = t_(p["type_cls"])

        def load_attn(ref_attn, pa):
            for nm in ("q", "k", "v", "o"):
                load_linear(getattr(ref_attn, nm), pa[nm])

        def load_ffn(ref_mlp, pf):
            load_linear(ref_mlp.fc1, pf["TorchLinear_0"])
            load_linear(ref_mlp.fc2, pf["TorchLinear_1"])

        # the one shared transformer block
        blk = p["blk_shared_0"]
        ref_blk = ref.skel_blocks[0]
        load_ln(ref_blk.ln1, blk["LayerNorm_0"])
        load_attn(ref_blk.sa, blk["Attn_0"])
        load_ln(ref_blk.ln2, blk["LayerNorm_1"])
        load_ffn(ref_blk.ff, blk["FFN_0"])
        # aggregation + fusion attention
        load_attn(ref.xattn_s, p["xattn_skel"])
        load_attn(ref.xattn_e, p["xattn_sens"])
        load_attn(ref.fuse_xattn, p["fuse_xattn"])
        load_ffn(ref.fuse_ff, p["fuse_ff"])
        load_ln(ref.ln_fuse, p["ln_fuse"])
        # flax materializes only the heads each mode actually applies
        if sync:
            load_linear(ref.head_joint, p["head_joint"])
        else:
            load_linear(ref.head_skel, p["head_skel"])
            load_linear(ref.head_sens, p["head_sens"])

        with torch.no_grad():
            if sync:
                ref_out, _ = ref(t_(x_s), t_(x_e), synced=True)
                np.testing.assert_allclose(
                    np.asarray(ours_out), ref_out.numpy(), rtol=1e-4, atol=1e-5
                )
            else:
                ref_s, ref_e = ref(t_(x_s), t_(x_e), synced=False)
                np.testing.assert_allclose(
                    np.asarray(ours_out[0]), ref_s.numpy(), rtol=1e-4, atol=1e-5
                )
                np.testing.assert_allclose(
                    np.asarray(ours_out[1]), ref_e.numpy(), rtol=1e-4, atol=1e-5
                )


def test_focal_2mod_gradient_parity():
    """ONE-STEP GRADIENT parity for the FOCAL async trainer: under weight
    transplant, the summed-CE gradients of every layer match the torch
    reference to ~1e-8 (run while investigating the +6% focal_async
    training-outcome row — proves the per-step semantics are exact, so the
    outcome gap lives in init draws / data order, not the update math)."""
    import torch.nn.functional as F
    from focal import FOCALSharedLatentBaseline as RefModel

    from gaitpd.models.baselines import FOCALSharedLatent

    kw = dict(skeleton_output_dim=6, sensor_out_channels=6, sensor_length=426,
              d_shared=16, d_private=8, shared_out_channels=4, backbone_dim=4,
              num_classes=3)
    rng = np.random.default_rng(0)
    x_skel = jnp.asarray(rng.normal(size=(16, 101, 21)), jnp.float32)
    x_sens = jnp.asarray(rng.normal(size=(16, 426, 6)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 3, size=16))

    ours = FOCALSharedLatent(synchronized=False, **kw)
    variables = ours.init(jax.random.PRNGKey(3), x_skel, x_sens)
    p = variables["params"]

    def loss_fn(params):
        ls, lm = ours.apply({"params": params}, x_skel, x_sens)
        ce = lambda lg: -jnp.mean(  # noqa: E731
            jax.nn.log_softmax(lg)[jnp.arange(16), y]
        )
        return ce(ls) + ce(lm)

    g = jax.grad(loss_fn)(p)

    ref = RefModel(
        skeleton_input_dim=21, skeleton_output_dim=6, sensor_in_channels=6,
        sensor_out_channels=6, sensor_length=426, d_shared=16, d_private=8,
        shared_out_channels=4, backbone_dim=4, num_classes=3,
    )
    load_linear(ref.skel_enc.fc1, p["skel_enc"]["TorchLinear_0"])
    load_ln(ref.skel_enc.ln1, p["skel_enc"]["LayerNorm_0"])
    load_conv(ref.sens_enc.conv1d, p["sens_enc"]["Conv1dSame_0"])
    for nm in ("sk_sh", "sk_pr", "im_sh", "im_pr"):
        load_linear(getattr(ref, nm), p[nm])
    load_conv(ref.backbone.conv1d, p["backbone"]["Conv1dSame_0"])
    load_taskhead(ref.head_skel, p["head_skel"])
    load_taskhead(ref.head_sensor, p["head_sensor"])
    ref.train()
    ls, lm = ref(t_(x_skel), t_(x_sens), synced=False)
    ty = torch.tensor(np.asarray(y)).long()
    loss = F.cross_entropy(ls, ty) + F.cross_entropy(lm, ty)
    loss.backward()

    np.testing.assert_allclose(float(loss_fn(p)), float(loss.detach()),
                               rtol=1e-5)
    checks = [
        (ref.head_skel.fc.weight.grad.numpy().T,
         g["head_skel"]["TorchLinear_0"]["Dense_0"]["kernel"]),
        (ref.sk_sh.weight.grad.numpy().T, g["sk_sh"]["Dense_0"]["kernel"]),
        (ref.skel_enc.fc1.weight.grad.numpy().T,
         g["skel_enc"]["TorchLinear_0"]["Dense_0"]["kernel"]),
        (ref.backbone.conv1d.weight.grad.numpy().transpose(2, 1, 0),
         g["backbone"]["Conv1dSame_0"]["Conv_0"]["kernel"]),
        (ref.sens_enc.conv1d.weight.grad.numpy().transpose(2, 1, 0),
         g["sens_enc"]["Conv1dSame_0"]["Conv_0"]["kernel"]),
    ]
    for r, o in checks:
        np.testing.assert_allclose(r, np.asarray(o), atol=1e-6)
