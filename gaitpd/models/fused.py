"""Fused 3-stream WearGait forward: one block-diagonal conv feeds the MXU
instead of three tiny ones.

The reference (data/WearGait/weargait_encoders.py:116-157) — and our
faithful `WearGaitThreeModal` — runs three per-modality encoder convs with
2/13/24 input and 12/24/12 output channels. On TPU each of those pads its
channel dims to the 128-lane MXU tile, wasting >80% of every pass. This
module rebuilds the SAME computation as:

  1. one k5 'SAME' conv over the channel-concatenated input (39 -> 48) with
     a block-diagonal kernel: the walkway/IMU k3 kernels embed in a k5 with
     zero outer taps (zero weights x padding contribute exactly 0, so the
     result is exact), the insole k5 block is used as-is;
  2. the insole residual stage as ONE k3 conv whose center tap carries the
     1x1 skip kernel (conv3(h) + conv1(h) == conv(h, k3 + pad(k1)) by
     linearity);
  3. per-stream LayerNorm applied on a stacked (B, T, 3, 12) tensor (the
     normalisation axis is the per-stream channel axis, so stacking is
     exact);
  4. the shared backbone conv/pool over all three streams at once with the
     streams folded into the batch axis (identical weights, 3x the MXU
     M-dimension per launch);
  5. the heads on a (B, 3, features) tensor (Dense/LayerNorm/cosine act on
     the last axis only).

It consumes the UNFUSED model's parameter pytree verbatim — no new
parameters, no checkpoint migration; `make_fused_weargait_apply(model)`
returns a drop-in replacement for `model.apply` (equivalence pinned by
tests/test_fused.py to ~1e-5; the only non-bit-exact step is the kernel
addition in (2)). Training through it is therefore the same optimization
problem.

MEASURED RESULT (v5e-1, B=32768 CAGrad step): the fused path is ~1.6-1.8x
SLOWER than the stock per-stream forward (f32-HIGHEST 330k vs 521k
windows/s; bf16 432k vs 791k). The model is HBM-bandwidth-bound, and the
fusion's input concat + stream-stack transposes add large materialized
intermediates while the block-diagonal kernel multiplies zero blocks —
the launch-count savings never pay for the extra traffic. Kept as a
tested `--fused` option and as documentation of the experiment (same
finding as the Pallas stream block: XLA's own fusion of the three small
conv chains is already the fastest schedule at these channel widths).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gaitpd.models.blocks import adaptive_avg_pool1d, gelu
from gaitpd.models.multitask import WearGaitThreeModal

_CH = (2, 13, 24)  # walkway, insole, imu input channels


def _conv_nwc(x, kernel, bias):
    """lax 'SAME' NWC conv + bias (what Conv1dSame lowers to)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y + bias


def _layer_norm(x, scale, bias, eps=1e-5):
    mean = x.mean(-1, keepdims=True)
    var = ((x - mean) ** 2).mean(-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def make_fused_weargait_apply(model: WearGaitThreeModal):
    """Returns apply(params, xw, xi, xm) == model.apply on the same params,
    computed through the fused path above. Requires pool_len=None (the
    WearGait training configuration; reference weargait_train.py defaults)."""
    if model.pool_len:
        raise ValueError("fused path assumes pool_len=None (no encoder pool)")
    e = model.enc_out_ch          # 12
    hid = model.enc_out_ch * 2    # 24 (InsoleEncoderDeep hidden)
    n_in = sum(_CH)               # 39
    n_a = e + hid + e             # 48

    def apply(params, xw, xi, xm):
        p = params["params"]

        # ---- stage A: block-diagonal k5 conv over concat channels --------
        kw = p["enc_w"]["Conv1dSame_0"]["Conv_0"]["kernel"]   # (3, 2, e)
        ki = p["enc_i"]["Conv1dSame_0"]["Conv_0"]["kernel"]   # (5, 13, hid)
        km = p["enc_m"]["Conv1dSame_0"]["Conv_0"]["kernel"]   # (3, 24, e)
        ka = jnp.zeros((5, n_in, n_a), kw.dtype)
        ka = ka.at[1:4, 0:2, 0:e].set(kw)
        ka = ka.at[:, 2:15, e:e + hid].set(ki)
        ka = ka.at[1:4, 15:39, e + hid:n_a].set(km)
        ba = jnp.concatenate([
            p["enc_w"]["Conv1dSame_0"]["Conv_0"]["bias"],
            p["enc_i"]["Conv1dSame_0"]["Conv_0"]["bias"],
            p["enc_m"]["Conv1dSame_0"]["Conv_0"]["bias"],
        ])
        x = jnp.concatenate([xw, xi, xm], axis=-1)            # (B, T, 39)
        h = gelu(_conv_nwc(x, ka, ba))                        # (B, T, 48)

        # ---- stage B: insole residual as one k3 conv ---------------------
        k3 = p["enc_i"]["Conv1dSame_1"]["Conv_0"]["kernel"]   # (3, hid, e)
        k1 = p["enc_i"]["Conv1dSame_2"]["Conv_0"]["kernel"]   # (1, hid, e)
        kb = k3.at[1].add(k1[0])
        bb = (p["enc_i"]["Conv1dSame_1"]["Conv_0"]["bias"]
              + p["enc_i"]["Conv1dSame_2"]["Conv_0"]["bias"])
        hi = gelu(_conv_nwc(h[..., e:e + hid], kb, bb))       # (B, T, e)

        # ---- per-stream LayerNorm on the stacked tensor ------------------
        hs = jnp.stack([h[..., :e], hi, h[..., e + hid:]], axis=2)  # (B,T,3,e)
        ln_scale = jnp.stack([p[m]["LayerNorm_0"]["scale"]
                              for m in ("enc_w", "enc_i", "enc_m")])
        ln_bias = jnp.stack([p[m]["LayerNorm_0"]["bias"]
                             for m in ("enc_w", "enc_i", "enc_m")])
        hs = _layer_norm(hs, ln_scale, ln_bias)

        # ---- shared backbone over all streams in one launch --------------
        b, t = hs.shape[0], hs.shape[1]
        z = hs.transpose(0, 2, 1, 3).reshape(b * 3, t, e)
        z = jax.nn.relu(_conv_nwc(
            z,
            p["backbone"]["Conv1dSame_0"]["Conv_0"]["kernel"],
            p["backbone"]["Conv1dSame_0"]["Conv_0"]["bias"],
        ))
        z = adaptive_avg_pool1d(z, model.backbone_dim)        # (3B, bdim, C)
        feats = z.reshape(b, 3, -1)                           # flatten(1)

        # ---- heads (last-axis ops, broadcast over the stream axis) -------
        def head(hp, f):
            if model.use_norm or model.use_cosine:
                f = _layer_norm(f, hp["LayerNorm_0"]["scale"],
                                hp["LayerNorm_0"]["bias"])
            if model.use_cosine:
                w = hp["CosineLinear_0"]["weight"]
                fn = f / jnp.maximum(
                    jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
                wn = w / jnp.maximum(
                    jnp.linalg.norm(w, axis=0, keepdims=True), 1e-8)
                return jnp.clip(fn @ wn, -1.0 + 1e-8, 1.0 - 1e-8)
            d = hp["TorchLinear_0"]["Dense_0"]
            return f @ d["kernel"] + d["bias"]

        if model.synchronized:
            out = head(p["head_shared"], feats)               # (B, 3, cls)
            return out[:, 0], out[:, 1], out[:, 2]
        return (
            head(p["head_w"], feats[:, 0]),
            head(p["head_i"], feats[:, 1]),
            head(p["head_m"], feats[:, 2]),
        )

    return apply
