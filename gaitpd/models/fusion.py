"""Fusion model families: early / late / shared-latent / cheap cross-attention
variants for both the 2-modality FBG/FoG stack and the 3-modality WearGait
stack.

reference: train/feature_encoder.py:347-597 (2-mod ablations) and
data/WearGait/weargait_encoders.py:209-387 (3-mod baselines).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from gaitpd.models.blocks import TaskHead, TorchLinear, flatten_features
from gaitpd.models.encoders import (
    IMUEncoderShallow,
    InsoleEncoderDeep,
    SensorEncoder,
    SharedBackbone,
    SkeletonMLP,
    WalkwayEncoder,
)
from gaitpd.ops.attention import cheap_cross_attention_sym, masked_pairwise_enrichment


# ---------------------------------------------------------------------------
# Two-modality (FBG/FoG) fusion family — reference feature_encoder.py:347-597
# ---------------------------------------------------------------------------


class _TwoModBase(nn.Module):
    skeleton_output_dim: int
    sensor_out_channels: int
    sensor_length: int
    pose_length: int = 101
    shared_out_channels: int = 16
    backbone_dim: int = 8
    num_classes: int = 3
    synchronized_loading: bool = False

    def _encoders(self):
        skel_enc = SkeletonMLP(self.skeleton_output_dim, name="skel_enc")
        sens_enc = SensorEncoder(
            self.sensor_out_channels,
            sensor_length=self.sensor_length,
            output_length=self.pose_length,
            name="sens_enc",
        )
        return skel_enc, sens_enc


class EarlyFusionModel(_TwoModBase):
    """Concat encoded features along channels -> one backbone.
    reference feature_encoder.py:347-396."""

    @nn.compact
    def __call__(self, x_skel, x_sens):
        skel_enc, sens_enc = self._encoders()
        fused_in = jnp.concatenate([skel_enc(x_skel), sens_enc(x_sens)], axis=-1)
        rep = flatten_features(
            SharedBackbone(self.shared_out_channels, self.backbone_dim, name="backbone")(fused_in)
        )
        if self.synchronized_loading:
            return TorchLinear(self.num_classes, name="head")(rep)
        return (
            TorchLinear(self.num_classes, name="head_skel")(rep),
            TorchLinear(self.num_classes, name="head_sens")(rep),
        )


class LateFusionModel(_TwoModBase):
    """Per-branch backbone reprs concatenated before the heads.
    reference feature_encoder.py:399-444."""

    @nn.compact
    def __call__(self, x_skel, x_sens):
        skel_enc, sens_enc = self._encoders()
        backbone = SharedBackbone(self.shared_out_channels, self.backbone_dim, name="backbone")
        sk = flatten_features(backbone(skel_enc(x_skel)))
        se = flatten_features(backbone(sens_enc(x_sens)))
        fused = jnp.concatenate([sk, se], axis=1)
        if self.synchronized_loading:
            return TorchLinear(self.num_classes, name="head")(fused)
        return (
            TorchLinear(self.num_classes, name="head_skel")(fused),
            TorchLinear(self.num_classes, name="head_sens")(fused),
        )


class ShareLatentModel(_TwoModBase):
    """Per-modality linear projection to a common latent; shared backbone and
    one shared head on each stream. reference feature_encoder.py:447-494."""

    @nn.compact
    def __call__(self, x_skel, x_sens):
        skel_enc, sens_enc = self._encoders()
        sk_lat = TorchLinear(self.shared_out_channels, name="proj_skel")(skel_enc(x_skel))
        se_lat = TorchLinear(self.shared_out_channels, name="proj_sens")(sens_enc(x_sens))
        backbone = SharedBackbone(self.shared_out_channels, self.backbone_dim, name="backbone")
        head = TorchLinear(self.num_classes, name="head")
        sk = head(flatten_features(backbone(sk_lat)))
        se = head(flatten_features(backbone(se_lat)))
        return sk, se


class CheapXAttnModel(_TwoModBase):
    """Symmetric zero-parameter cross-attention fusion.
    reference feature_encoder.py:530-597."""

    @nn.compact
    def __call__(self, x_skel, x_sens):
        if self.skeleton_output_dim != self.sensor_out_channels:
            raise ValueError("cross-attention needs equal feature dims")
        skel_enc, sens_enc = self._encoders()
        fused = cheap_cross_attention_sym(skel_enc(x_skel), sens_enc(x_sens))
        rep = flatten_features(
            SharedBackbone(self.shared_out_channels, self.backbone_dim, name="backbone")(fused)
        )
        if self.synchronized_loading:
            return TorchLinear(self.num_classes, name="head")(rep)
        return (
            TorchLinear(self.num_classes, name="head_skel")(rep),
            TorchLinear(self.num_classes, name="head_sens")(rep),
        )


TWO_MOD_FUSIONS = {
    "early": EarlyFusionModel,
    "late": LateFusionModel,
    "share_latent": ShareLatentModel,
    "cheap_xattn": CheapXAttnModel,
}


# ---------------------------------------------------------------------------
# Three-modality (WearGait) fusion baselines — weargait_encoders.py:209-387
# ---------------------------------------------------------------------------


class _ThreeModBase(nn.Module):
    enc_out_ch: int = 12
    backbone_dim: int = 8
    shared_out_ch: int = 16
    num_classes: int = 2
    use_norm: bool = False
    use_cosine: bool = False
    synchronized: bool = True

    def _encoders(self):
        return (
            WalkwayEncoder(self.enc_out_ch, name="enc_w"),
            InsoleEncoderDeep(self.enc_out_ch, name="enc_i"),
            IMUEncoderShallow(self.enc_out_ch, name="enc_m"),
        )

    def _head(self, name):
        return TaskHead(
            self.num_classes, use_norm=self.use_norm, use_cosine=self.use_cosine,
            name=name,
        )


class EarlyFusion3(_ThreeModBase):
    """Channel-concat of the three encoded streams -> one backbone; sync one
    shared head (replicated 3x), async three heads on the SAME fused repr.
    reference weargait_encoders.py:209-245."""

    @nn.compact
    def __call__(self, xw, xi, xm):
        ew, ei, em = self._encoders()
        fused = jnp.concatenate([ew(xw), ei(xi), em(xm)], axis=-1)
        rep = flatten_features(
            SharedBackbone(self.shared_out_ch, self.backbone_dim, name="backbone")(fused)
        )
        if self.synchronized:
            y = self._head("head_shared")(rep)
            return y, y, y
        return (
            self._head("head_w")(rep),
            self._head("head_i")(rep),
            self._head("head_m")(rep),
        )


class LateFusion3(_ThreeModBase):
    """Shared backbone per stream; sync fuses latents by element-wise mean
    into one shared head, async keeps per-stream heads.
    reference weargait_encoders.py:247-282."""

    @nn.compact
    def __call__(self, xw, xi, xm):
        ew, ei, em = self._encoders()
        backbone = SharedBackbone(self.shared_out_ch, self.backbone_dim, name="backbone")
        rw = flatten_features(backbone(ew(xw)))
        ri = flatten_features(backbone(ei(xi)))
        rm = flatten_features(backbone(em(xm)))
        if self.synchronized:
            y = self._head("head_shared")((rw + ri + rm) / 3.0)
            return y, y, y
        return (
            self._head("head_w")(rw),
            self._head("head_i")(ri),
            self._head("head_m")(rm),
        )


class SharedLatent3(_ThreeModBase):
    """Per-stream projection to a shared width; shared backbone per stream;
    per-stream heads (sync aliases one head). reference weargait_encoders.py:284-322."""

    proj_ch: int = 16

    @nn.compact
    def __call__(self, xw, xi, xm):
        ew, ei, em = self._encoders()
        pw = TorchLinear(self.proj_ch, name="proj_w")(ew(xw))
        pi = TorchLinear(self.proj_ch, name="proj_i")(ei(xi))
        pm = TorchLinear(self.proj_ch, name="proj_m")(em(xm))
        backbone = SharedBackbone(self.shared_out_ch, self.backbone_dim, name="backbone")
        rw = flatten_features(backbone(pw))
        ri = flatten_features(backbone(pi))
        rm = flatten_features(backbone(pm))
        if self.synchronized:
            head = self._head("head_shared")
            return head(rw), head(ri), head(rm)
        return (
            self._head("head_w")(rw),
            self._head("head_i")(ri),
            self._head("head_m")(rm),
        )


class CheapXAttn3(_ThreeModBase):
    """Pairwise zero-parameter cross-attention enrichment per stream, then
    shared backbone + heads. reference weargait_encoders.py:338-387.

    ``mask`` (optional traced (3,) bool) switches the pairwise averaging to
    enabled-partners-only — the relaxed-input upgrade (see
    gaitpd.ops.attention.masked_pairwise_enrichment); omitted -> exact
    reference behaviour.
    """

    @nn.compact
    def __call__(self, xw, xi, xm, mask: Optional[jnp.ndarray] = None):
        ew, ei, em = self._encoders()
        enriched = masked_pairwise_enrichment([ew(xw), ei(xi), em(xm)], mask)
        backbone = SharedBackbone(self.shared_out_ch, self.backbone_dim, name="backbone")
        reps = [flatten_features(backbone(e)) for e in enriched]
        if self.synchronized:
            head = self._head("head_shared")
            return tuple(head(r) for r in reps)
        return (
            self._head("head_w")(reps[0]),
            self._head("head_i")(reps[1]),
            self._head("head_m")(reps[2]),
        )
