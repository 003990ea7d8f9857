"""SOTA baseline families: DeepAV-Lite, FOCAL shared/private latents, TACA
temperature-adjusted cross-modal attention — for both the 2-modality FBG/FoG
stack and the 3-modality WearGait stack.

reference: train/baselines/architectures/deepav.py, focal.py, taca.py.
Sync/async is a module attribute (static at trace time) instead of the
reference's forward kwarg, so each configuration compiles once.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from gaitpd.models.blocks import (
    TaskHead,
    TorchLinear,
    flatten_features,
    gelu,
    torch_bias_init,
    torch_kernel_init,
)
from gaitpd.models.encoders import (
    GELUBackbone,
    SensorEncoder,
    SharedBackbone,
    SkeletonMLP,
)
from gaitpd.ops.attention import scaled_cross_attention


def sinusoid_pos_enc(length: int, dim: int) -> np.ndarray:
    """Fixed sinusoidal positions (reference deepav.py:156-164)."""
    pos = np.arange(length, dtype=np.float32)
    idx = np.arange(dim, dtype=np.float32)
    div = np.exp((idx // 2) * (-math.log(10000.0) / max(1, dim // 2)))
    pe = np.zeros((length, dim), np.float32)
    pe[:, 0::2] = np.sin(pos[:, None] * div[0::2])
    pe[:, 1::2] = np.cos(pos[:, None] * div[0::2])
    return pe


# ---------------------------------------------------------------------------
# DeepAV-Lite building blocks (reference deepav.py:10-81)
# ---------------------------------------------------------------------------


class PatchEmbed1D(nn.Module):
    """Strided Conv1d tokenizer + LayerNorm: (B,T,D) -> (B,L,E).

    Init law: by default the conv keeps flax's lecun_normal kernel and ZERO
    bias — deliberately different from torch's Conv1d default
    (kaiming_uniform(a=sqrt(5)) kernel + uniform bias). The zero bias makes a
    zero-filled (masked-out) stream tokenize to exactly 0, which LayerNorm
    maps to its trained bias beta — a benign neutral token — whereas torch's
    random per-channel conv bias is variance-normalized by LN into unit-scale
    garbage tokens that participate in attention. Measured on the WearGait
    relaxed-input protocol this is worth +8..+15 points on 5/6 partial masks
    at identical full-input accuracy (PARITY.md round-5 attribution).
    ``torch_init=True`` reproduces the reference law for parity experiments.
    """

    embed_dim: int
    patch: int = 16
    stride: int = 16
    torch_init: bool = False

    @nn.compact
    def __call__(self, x):
        if self.torch_init:
            fan_in = self.patch * x.shape[-1]
            kernel_init, bias_init = torch_kernel_init, torch_bias_init(fan_in)
        else:
            kernel_init = nn.initializers.lecun_normal()
            bias_init = nn.initializers.zeros
        z = nn.Conv(
            self.embed_dim,
            kernel_size=(self.patch,),
            strides=(self.stride,),
            padding="VALID",
            kernel_init=kernel_init,
            bias_init=bias_init,
        )(x)
        return nn.LayerNorm(epsilon=1e-5)(z)


class FFN(nn.Module):
    dim: int
    ratio: float = 4.0
    drop: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = TorchLinear(int(self.dim * self.ratio))(x)
        h = TorchLinear(self.dim)(gelu(h))
        return nn.Dropout(self.drop, deterministic=not train)(h)


class Attn(nn.Module):
    """Self- or cross-attention with optional bottlenecked head width d_att
    (reference MHSA/XAttn, deepav.py:29-70)."""

    dim: int
    heads: int = 4
    drop: float = 0.0
    d_att: Optional[int] = None

    @nn.compact
    def __call__(self, q_in, kv_in, train: bool = False):
        da = self.d_att or self.dim
        q = TorchLinear(da, use_bias=False, name="q")(q_in)
        k = TorchLinear(da, use_bias=False, name="k")(kv_in)
        v = TorchLinear(da, use_bias=False, name="v")(kv_in)
        z = scaled_cross_attention(q, k, v, self.heads)
        out = TorchLinear(self.dim, use_bias=False, name="o")(z)
        return nn.Dropout(self.drop, deterministic=not train)(out)


class TransformerBlock(nn.Module):
    dim: int
    heads: int = 4
    ratio: float = 4.0
    drop: float = 0.0
    d_att: Optional[int] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.LayerNorm(epsilon=1e-5)(x)
        x = x + Attn(self.dim, self.heads, self.drop, self.d_att)(h, h, train)
        x = x + FFN(self.dim, self.ratio, self.drop)(
            nn.LayerNorm(epsilon=1e-5)(x), train
        )
        return x


class DeepAVCore(nn.Module):
    """Generic N-modality DeepAV-Lite core (reference DeepAVLiteN,
    deepav.py:213-331): per-modality tokenizers + type embeddings + self-attn
    stacks (A), learnable aggregation queries via cross-attn (B), fusion
    tokens attending the concatenated aggregates (C)."""

    modal_dims: Tuple[Tuple[str, int], ...]  # ordered (name, in_dim)
    num_classes: int
    embed_dim: int = 96
    depth: int = 3
    heads: int = 3
    mlp_ratio: float = 2.0
    patch: int = 8
    stride: int = 8
    drop: float = 0.1
    n_agg: int = 4
    n_fusion: int = 4
    use_cls: bool = True
    pool: str = "cls"
    share_blocks: bool = False
    share_unimodal: bool = False
    attn_bottleneck: Optional[int] = None
    synchronized: bool = True
    torch_init: bool = False

    def setup(self):
        names = [m for m, _ in self.modal_dims]
        self.names = names
        e = self.embed_dim
        d_att = self.attn_bottleneck or e
        self.tokenizers = {
            m: PatchEmbed1D(
                e, self.patch, self.stride, self.torch_init, name=f"tk_{m}"
            )
            for m, _ in self.modal_dims
        }
        self.type_embed = {
            m: self.param(f"type_{m}", nn.initializers.normal(0.02), (1, 1, e))
            for m in names
        }
        mk_block = lambda nm: TransformerBlock(  # noqa: E731
            e, self.heads, self.mlp_ratio, self.drop, d_att, name=nm
        )
        if self.share_unimodal:
            base = [mk_block("blk_shared_0")] if self.share_blocks else [
                mk_block(f"blk_shared_{i}") for i in range(self.depth)
            ]
            self.blocks = {m: base for m in names}
        else:
            self.blocks = {
                m: (
                    [mk_block(f"blk_{m}_0")]
                    if self.share_blocks
                    else [mk_block(f"blk_{m}_{i}") for i in range(self.depth)]
                )
                for m in names
            }
        self.agg_q = {
            m: self.param(f"agg_q_{m}", nn.initializers.normal(0.02), (self.n_agg, e))
            for m in names
        }
        self.xattn_a = {
            m: Attn(e, self.heads, self.drop, d_att, name=f"xattn_{m}") for m in names
        }
        n_fus = self.n_fusion + (1 if self.use_cls else 0)
        self.fus_tok = self.param("fus_tok", nn.initializers.normal(0.02), (n_fus, e))
        if self.use_cls:
            self.type_cls = self.param(
                "type_cls", nn.initializers.normal(0.02), (1, 1, e)
            )
        self.fuse_xattn = Attn(e, self.heads, self.drop, d_att, name="fuse_xattn")
        self.fuse_ff = FFN(e, self.mlp_ratio, self.drop, name="fuse_ff")
        self.ln_fuse = nn.LayerNorm(epsilon=1e-5, name="ln_fuse")
        self.head_joint = TorchLinear(self.num_classes, name="head_joint")
        self.heads_mod = {
            m: TorchLinear(self.num_classes, name=f"head_{m}") for m in names
        }

    def forward_feats(self, inputs: Dict[str, jnp.ndarray], train: bool = False):
        b = next(iter(inputs.values())).shape[0]
        e = self.embed_dim
        z = {}
        for m in self.names:
            t = self.tokenizers[m](inputs[m]) + self.type_embed[m]
            z[m] = t + jnp.asarray(sinusoid_pos_enc(t.shape[1], e))[None]

        fus = jnp.tile(self.fus_tok[None], (b, 1, 1))
        if self.use_cls:
            fus = fus.at[:, 0, :].add(self.type_cls[0, 0])

        for li in range(self.depth):
            aggs = []
            for m in self.names:
                blk = self.blocks[m][0] if self.share_blocks else self.blocks[m][li]
                z[m] = blk(z[m], train)
                q = jnp.tile(self.agg_q[m][None], (b, 1, 1))
                aggs.append(self.xattn_a[m](q, z[m], train))
            av = jnp.concatenate(aggs, axis=1)
            fus = fus + self.fuse_xattn(fus, av, train)
            fus = fus + self.fuse_ff(self.ln_fuse(fus), train)

        joint = fus[:, 0, :] if (self.use_cls and self.pool == "cls") else fus.mean(1)
        pools = {m: z[m].mean(1) for m in self.names}
        return joint, pools

    def __call__(self, *xs, train: bool = False):
        inputs = dict(zip(self.names, xs))
        joint, pools = self.forward_feats(inputs, train)
        if self.synchronized:
            y = self.head_joint(joint)
            return tuple(y for _ in self.names)
        return tuple(self.heads_mod[m](pools[m]) for m in self.names)


class DeepAVLite(nn.Module):
    """2-modality wrapper with the fbg/fog driver's tiny config defaults
    (reference deepav_train.py:40-47: embed 12, depth 1, shared blocks,
    attention bottleneck 8, CLS only when synced). Returns one joint logits
    (sync) or (skel, sens) head logits (async, deepav_train.py:92-94)."""

    num_classes: int
    embed_dim: int = 12
    depth: int = 1
    heads: int = 4
    mlp_ratio: float = 0.5
    patch: int = 1
    stride: int = 4
    drop: float = 0.0
    n_agg: int = 1
    n_fusion: int = 1
    attn_bottleneck: Optional[int] = 8
    synchronized: bool = True

    @nn.compact
    def __call__(self, x_skel, x_sens, train: bool = False):
        core = DeepAVCore(
            modal_dims=(("skel", x_skel.shape[-1]), ("sens", x_sens.shape[-1])),
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            depth=self.depth,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            patch=self.patch,
            stride=self.stride,
            drop=self.drop,
            n_agg=self.n_agg,
            n_fusion=self.n_fusion,
            use_cls=self.synchronized,
            pool="cls" if self.synchronized else "mean",
            share_blocks=True,
            share_unimodal=True,
            attn_bottleneck=self.attn_bottleneck,
            synchronized=self.synchronized,
            name="core",
        )
        outs = core(x_skel, x_sens, train=train)
        if self.synchronized:
            return outs[0]
        return outs


class DeepAVLite3(nn.Module):
    """3-modality wrapper (reference DeepAVLite3, deepav.py:334-353)."""

    num_classes: int
    embed_dim: int = 96
    depth: int = 3
    heads: int = 3
    mlp_ratio: float = 2.0
    patch: int = 8
    stride: int = 8
    drop: float = 0.1
    synchronized: bool = True
    torch_init: bool = False

    @nn.compact
    def __call__(self, xw, xi, xm, train: bool = False):
        core = DeepAVCore(
            modal_dims=(("walkway", 2), ("insole", 13), ("imu", 24)),
            num_classes=self.num_classes,
            embed_dim=self.embed_dim,
            depth=self.depth,
            heads=self.heads,
            mlp_ratio=self.mlp_ratio,
            patch=self.patch,
            stride=self.stride,
            drop=self.drop,
            synchronized=self.synchronized,
            torch_init=self.torch_init,
            name="core",
        )
        return core(xw, xi, xm, train=train)


# ---------------------------------------------------------------------------
# FOCAL shared/private latent factorisation (reference focal.py)
# ---------------------------------------------------------------------------


class FOCALSharedLatent(nn.Module):
    """2-modality FOCAL baseline (reference focal.py:10-138): per-modality
    shared+private linear projectors over encoded sequences; sync fuses the
    shared parts by mean and concatenates both privates into one backbone +
    head; async runs each modality with the foreign private zero-filled.
    Returns joint logits (sync) or (skel, sens) logits (async).

    NOTE: the 2-mod variant uses feature_encoder.SharedBackbone (conv->RELU->
    pool, focal.py:68-72); only the 3-mod variant uses the FOCAL-local GELU
    backbone (focal.py:161-173)."""

    skeleton_output_dim: int
    sensor_out_channels: int
    sensor_length: int
    pose_length: int = 101
    d_shared: int = 16
    d_private: int = 8
    shared_out_channels: int = 4
    backbone_dim: int = 4
    num_classes: int = 3
    use_norm_head: bool = False
    use_cosine_head: bool = False
    synchronized: bool = False

    @nn.compact
    def __call__(self, x_skel, x_sensor):
        s = SkeletonMLP(self.skeleton_output_dim, name="skel_enc")(x_skel)
        m = SensorEncoder(
            self.sensor_out_channels,
            sensor_length=self.sensor_length,
            output_length=self.pose_length,
            name="sens_enc",
        )(x_sensor)
        s_sh = TorchLinear(self.d_shared, name="sk_sh")(s)
        s_pr = TorchLinear(self.d_private, name="sk_pr")(s)
        m_sh = TorchLinear(self.d_shared, name="im_sh")(m)
        m_pr = TorchLinear(self.d_private, name="im_pr")(m)
        backbone = SharedBackbone(
            self.shared_out_channels, self.backbone_dim, name="backbone"
        )
        head = lambda nm: TaskHead(  # noqa: E731
            self.num_classes, use_norm=self.use_norm_head,
            use_cosine=self.use_cosine_head, name=nm,
        )
        if self.synchronized:
            fused = jnp.concatenate([0.5 * (s_sh + m_sh), s_pr, m_pr], axis=-1)
            rep = flatten_features(backbone(fused))
            return head("head_sync")(rep)
        zs = jnp.zeros_like(s_pr)
        zm = jnp.zeros_like(m_pr)
        rep_s = flatten_features(
            backbone(jnp.concatenate([s_sh, s_pr, zm], axis=-1))
        )
        rep_m = flatten_features(
            backbone(jnp.concatenate([m_sh, zs, m_pr], axis=-1))
        )
        return head("head_skel")(rep_s), head("head_sensor")(rep_m)


class FOCALSharedLatent3(nn.Module):
    """3-modality FOCAL (reference focal.py:198-323): raw windows projected
    to shared/private per modality; the FOCAL-local GELU backbone; sync one
    head on concat(mean shared, all privates) replicated 3x, async three
    heads with foreign privates zero-filled."""

    d_shared: int = 128
    d_private: int = 64
    shared_out_ch: int = 16
    backbone_dim: int = 8
    num_classes: int = 2
    synchronized: bool = True
    use_norm_head: bool = False
    use_cosine_head: bool = False

    @nn.compact
    def __call__(self, xw, xi, xm):
        sh = [
            TorchLinear(self.d_shared, name=f"{n}_sh")(x)
            for n, x in (("w", xw), ("i", xi), ("m", xm))
        ]
        pr = [
            TorchLinear(self.d_private, name=f"{n}_pr")(x)
            for n, x in (("w", xw), ("i", xi), ("m", xm))
        ]
        backbone = GELUBackbone(self.shared_out_ch, self.backbone_dim, name="backbone")
        head = lambda nm: TaskHead(  # noqa: E731
            self.num_classes, use_norm=self.use_norm_head,
            use_cosine=self.use_cosine_head, name=nm,
        )
        if self.synchronized:
            z_sh = (sh[0] + sh[1] + sh[2]) / 3.0
            fused = jnp.concatenate([z_sh] + pr, axis=-1)
            y = head("head_shared")(flatten_features(backbone(fused)))
            return y, y, y
        outs = []
        names = ("head_w", "head_i", "head_m")
        for t in range(3):
            privs = [pr[t] if j == t else jnp.zeros_like(pr[j]) for j in range(3)]
            fused = jnp.concatenate([sh[t]] + privs, axis=-1)
            outs.append(head(names[t])(flatten_features(backbone(fused))))
        return tuple(outs)


# ---------------------------------------------------------------------------
# TACA (reference taca.py)
# ---------------------------------------------------------------------------


class Tokenizer(nn.Module):
    """Time-shared frame projection + stride subsample to n_tokens
    (reference taca.py:10-34). Input is the flattened (B, T*D) window."""

    t_frames: int
    d_frame: int
    d_model: int
    n_tokens: int
    use_time_shared: bool = True

    @nn.compact
    def __call__(self, x_flat):
        b = x_flat.shape[0]
        if self.use_time_shared:
            x = x_flat.reshape(b, self.t_frames, self.d_frame)
            z = TorchLinear(self.d_model, use_bias=False, name="frame_proj")(x)
            stride = max(1, self.t_frames // self.n_tokens)
            return z[:, ::stride, :][:, : self.n_tokens, :]
        h = TorchLinear(self.d_model * self.n_tokens, use_bias=False)(x_flat)
        h = gelu(nn.LayerNorm(epsilon=1e-5)(h))
        return h.reshape(b, self.n_tokens, self.d_model)


def taca_gamma(gamma0, schedule: str, depth_id: int, num_depths: int, epoch_frac):
    """γ schedule (reference taca.py:65-73)."""
    if schedule == "depth":
        alpha = 1.0 - depth_id / max(1, num_depths - 1)
        return 1.0 + alpha * (gamma0 - 1.0)
    if schedule == "epoch":
        return 1.0 + (1.0 - epoch_frac) * (gamma0 - 1.0)
    return gamma0


class TACACross(nn.Module):
    """Bidirectional temperature-adjusted cross-attention
    (reference taca.py:39-97): softmax((γ/τ)·qkᵀ/√dk)."""

    d_model: int
    n_heads: int = 4
    tau: float = 1.0
    gamma: float = 1.5
    schedule: str = "const"
    depth_id: int = 0
    num_depths: int = 1
    drop: float = 0.0

    @nn.compact
    def __call__(self, z_a, z_b, train: bool = False, epoch_frac=0.0):
        d = self.d_model
        scale = taca_gamma(
            self.gamma, self.schedule, self.depth_id, self.num_depths, epoch_frac
        ) / self.tau
        lin = lambda nm: TorchLinear(d, use_bias=False, name=nm)  # noqa: E731
        # a -> b enhanced (queries from a attend b)
        a2b = scaled_cross_attention(
            lin("q_a2b")(z_a), lin("k_b")(z_b), lin("v_b")(z_b), self.n_heads, scale
        )
        a2b = nn.Dropout(self.drop, deterministic=not train)(lin("o_b")(a2b))
        b2a = scaled_cross_attention(
            lin("q_b2a")(z_b), lin("k_a")(z_a), lin("v_a")(z_a), self.n_heads, scale
        )
        b2a = nn.Dropout(self.drop, deterministic=not train)(lin("o_a")(b2a))
        # (b->a enhanced, a->b enhanced), mirroring reference return order
        return b2a, a2b


class TACAWrapper(nn.Module):
    """2-modality TACA (reference taca.py:102-171): tokenize flattened
    windows, fuse bidirectionally, mean-pool; sync -> joint head on the
    average of both enhanced pools, async -> per-modality heads."""

    skel_t: int
    skel_d: int
    sens_t: int
    sens_d: int
    num_classes: int
    d_model: int = 96
    n_heads: int = 4
    n_tok_s: int = 4
    n_tok_e: int = 4
    tau: float = 1.0
    gamma: float = 1.5
    schedule: str = "const"
    num_depths: int = 1
    drop: float = 0.1
    synchronized: bool = False

    @nn.compact
    def __call__(self, x_skel_flat, x_sens_flat, train: bool = False, epoch_frac=0.0):
        z_s = Tokenizer(self.skel_t, self.skel_d, self.d_model, self.n_tok_s,
                        name="tk_s")(x_skel_flat)
        z_e = Tokenizer(self.sens_t, self.sens_d, self.d_model, self.n_tok_e,
                        name="tk_e")(x_sens_flat)
        fuser = TACACross(
            self.d_model, self.n_heads, self.tau, self.gamma, self.schedule,
            0, self.num_depths, self.drop, name="fuser",
        )
        y_sens, y_skel = fuser(z_s, z_e, train=train, epoch_frac=epoch_frac)
        if self.synchronized:
            z = 0.5 * (y_skel.mean(1) + y_sens.mean(1))
            return TorchLinear(self.num_classes, name="head_joint")(z)
        return (
            TorchLinear(self.num_classes, name="head_skel")(y_skel.mean(1)),
            TorchLinear(self.num_classes, name="head_sens")(y_sens.mean(1)),
        )


class TACA3TriWrapper(nn.Module):
    """3-modality TACA with pairwise fusers W<->I / W<->M / I<->M
    (reference taca.py:175-249). Sync: per-stream enhancements averaged into
    a joint head (replicated 3x); async: per-stream heads, optionally fed by
    the cross-enhanced sequences (allow_async_cross)."""

    win_len: int
    num_classes: int
    d_model: int = 128
    n_heads: int = 4
    n_tok: int = 8
    tau: float = 1.0
    gamma: float = 1.5
    schedule: str = "const"
    drop: float = 0.1
    allow_async_cross: bool = True
    synchronized: bool = True
    walk_d: int = 2
    insole_d: int = 13
    imu_d: int = 24

    @nn.compact
    def __call__(self, xw_flat, xi_flat, xm_flat, train: bool = False, epoch_frac=0.0):
        t = self.win_len
        zw = Tokenizer(t, self.walk_d, self.d_model, self.n_tok, name="tk_w")(xw_flat)
        zi = Tokenizer(t, self.insole_d, self.d_model, self.n_tok, name="tk_i")(xi_flat)
        zm = Tokenizer(t, self.imu_d, self.d_model, self.n_tok, name="tk_m")(xm_flat)
        mk = lambda nm: TACACross(  # noqa: E731
            self.d_model, self.n_heads, self.tau, self.gamma, self.schedule,
            drop=self.drop, name=nm,
        )
        wi, wm, im = mk("wi"), mk("wm"), mk("im")
        if self.synchronized:
            wi_e2w, wi_w2i = wi(zw, zi, train, epoch_frac)
            wm_e2w, wm_w2m = wm(zw, zm, train, epoch_frac)
            im_e2i, im_i2m = im(zi, zm, train, epoch_frac)
            w_enh = 0.5 * (wi_e2w + wm_e2w)
            i_enh = 0.5 * (wi_w2i + im_e2i)
            m_enh = 0.5 * (wm_w2m + im_i2m)
            z = (w_enh.mean(1) + i_enh.mean(1) + m_enh.mean(1)) / 3.0
            y = TorchLinear(self.num_classes, name="head_joint")(z)
            return y, y, y
        if self.allow_async_cross:
            _, wi_w2i = wi(zw, zi, train, epoch_frac)
            _, wm_w2m = wm(zw, zm, train, epoch_frac)
            im(zi, zm, train, epoch_frac)  # params exist; outputs unused (ref :242-244)
            yi_in, ym_in = wi_w2i, wm_w2m
        else:
            yi_in, ym_in = zi, zm
        return (
            TorchLinear(self.num_classes, name="head_w")(zw.mean(1)),
            TorchLinear(self.num_classes, name="head_i")(yi_in.mean(1)),
            TorchLinear(self.num_classes, name="head_m")(ym_in.mean(1)),
        )
