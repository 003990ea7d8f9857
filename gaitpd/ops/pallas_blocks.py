"""Pallas TPU kernels for the hot encoder ops.

Two kernels cover the framework's compute hot path (SURVEY.md §7 step 3):

* ``stream_block``: the per-stream encoder+backbone fusion
  Conv1d(k) -> activation -> adaptive-avg-pool -> (B, bdim, C_out),
  i.e. the whole SharedBackbone (reference train/feature_encoder.py:80-109)
  and the shallow encoders, executed as shifted matmuls + one pooling matmul
  entirely in VMEM per batch tile — no HBM round-trip for the (B, T, C)
  intermediate.
* ``cheap_xattn_pallas``: the zero-parameter cross-attention
  softmax(A Bᵀ/√d) B (reference feature_encoder.py:497-527) as a
  query-blocked online-softmax (flash-style) kernel, so long windows stay
  memory-linear and win_len sweeps don't blow VMEM.

Both ops are wrapped in ``jax.custom_vjp`` with the backward pass expressed
through the jnp reference implementation (jax.vjp of the mathematically
identical XLA path), so they are drop-in replacements under autodiff; unit
tests assert pallas == jnp to fp32 tolerance (tests/test_pallas.py, run in
interpret mode on CPU, compiled on TPU).

Measured on v5e (B=12288, T=64, C=12->16, f32): XLA's fusion of the same
stream block runs ~4.5x FASTER than this kernel — the 12->128 lane padding
wastes >90% of each MXU pass at these channel widths, and XLA picks better
layouts. The framework therefore keeps the XLA path as the default encoder
compute (gaitpd.models.encoders); these kernels are retained for (a) the
blocked attention's O(T) memory at long window lengths where XLA would
materialise (B,T,T), and (b) as the seam where sequence-parallel attention
would attach (SURVEY.md §5).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaitpd.models.blocks import adaptive_avg_pool_matrix


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Fused stream block: conv1d(k, same) + activation + adaptive pool
# ---------------------------------------------------------------------------


def _stream_block_jnp(x, w, b, pool, act):
    """Reference implementation (identical math, XLA path)."""
    k = w.shape[0]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    t = x.shape[1]
    y = jnp.zeros(x.shape[:2] + (w.shape[-1],), jnp.float32)
    for i in range(k):
        y = y + jnp.einsum(
            "btc,cf->btf", xp[:, i : i + t, :], w[i],
            precision=jax.lax.Precision.HIGHEST,
        )
    y = y + b[None, None, :]
    y = act(y)
    return jnp.einsum("btf,to->bof", y, pool, precision=jax.lax.Precision.HIGHEST)


def _stream_block_kernel(x_ref, w_ref, b_ref, pool_ref, o_ref, *, k, act):
    """One batch tile: conv as k shifted matmuls + bias + act + pool matmul,
    all VMEM-resident."""
    x = x_ref[...]  # (TB, T+2*pad, Cin) — pre-padded on the host side
    t_out = o_ref.shape[1]
    t = x.shape[1] - (k - 1)
    acc = jnp.zeros((x.shape[0], t, w_ref.shape[-1]), jnp.float32)
    for i in range(k):
        acc += jax.lax.dot_general(
            x[:, i : i + t, :],
            w_ref[i],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    acc = act(acc + b_ref[...][None, None, :])
    o_ref[...] = jax.lax.dot_general(
        acc,
        pool_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).transpose(0, 2, 1)


def _vmem_batch_tile(t_padded: int, t: int, t_out: int, budget_mb: float = 6.0) -> int:
    """Pick the largest power-of-two batch tile whose VMEM footprint stays
    under budget. Mosaic pads the minor (channel) dim to 128 lanes, so the
    per-sample cost is dominated by t*128 f32 lanes regardless of C; double
    buffering doubles the in/out tiles."""
    per_sample = 4 * 128 * (2 * t_padded + t + 2 * t_out)  # bytes
    tb = int((budget_mb * 1024 * 1024) // per_sample)
    p = 1
    while p * 2 <= tb:
        p *= 2
    return max(8, p)


def _stream_block_pallas(x, w, b, pool, act, batch_tile=None, interpret=None):
    bsz, t, cin = x.shape
    k, _, cout = w.shape
    t_out = pool.shape[1]
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    if interpret is None:
        interpret = _interpret_default()
    if batch_tile is None:
        batch_tile = _vmem_batch_tile(t + 2 * pad, t, t_out)
    tb = min(batch_tile, bsz)
    grid = (pl.cdiv(bsz, tb),)
    return pl.pallas_call(
        functools.partial(_stream_block_kernel, k=k, act=act),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, t + 2 * pad, cin), lambda i: (i, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((k, cin, cout), lambda i: (0, 0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((t, t_out), lambda i: (0, 0),
                         memory_space=pl.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, t_out, cout), lambda i: (i, 0, 0),
                               memory_space=pl.ANY if interpret else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, t_out, cout), jnp.float32),
        interpret=interpret,
    )(xp, w, b, pool)


def make_stream_block(act_name: str = "relu", t_out: int = 8):
    """Returns stream_block(x, w, b) -> (B, t_out, C_out): the fused
    conv(k)+act+adaptive_pool op with a Pallas forward and jnp-derived VJP.

    x: (B, T, C_in); w: (K, C_in, C_out); b: (C_out,).
    """
    act = {"relu": jax.nn.relu, "gelu": lambda v: jax.nn.gelu(v, approximate=False)}[
        act_name
    ]

    @jax.custom_vjp
    def stream_block(x, w, b):
        pool = jnp.asarray(adaptive_avg_pool_matrix(x.shape[1], t_out))
        return _stream_block_pallas(x, w, b, pool, act)

    def fwd(x, w, b):
        return stream_block(x, w, b), (x, w, b)

    def bwd(res, g):
        x, w, b = res
        pool = jnp.asarray(adaptive_avg_pool_matrix(x.shape[1], t_out))
        _, vjp = jax.vjp(lambda x_, w_, b_: _stream_block_jnp(x_, w_, b_, pool, act), x, w, b)
        return vjp(g)

    stream_block.defvjp(fwd, bwd)
    return stream_block


def stream_block_reference(x, w, b, t_out: int = 8, act_name: str = "relu"):
    """Public jnp reference of the same op (used in tests/benchmarks)."""
    act = {"relu": jax.nn.relu, "gelu": lambda v: jax.nn.gelu(v, approximate=False)}[
        act_name
    ]
    pool = jnp.asarray(adaptive_avg_pool_matrix(x.shape[1], t_out))
    return _stream_block_jnp(x, w, b, pool, act)


# ---------------------------------------------------------------------------
# Blockwise cheap cross-attention (flash-style online softmax)
# ---------------------------------------------------------------------------


def _xattn_kernel(a_ref, b_ref, o_ref, *, kv_tile, scale, tk_valid):
    """Grid: (batch, q_blocks). Online-softmax over kv blocks: for each q
    tile keep running (max, denom, weighted-sum) while streaming kv tiles —
    memory O(Tq_tile * d), never materialising the full (T, T) score map.
    KV positions >= tk_valid are zero padding; their scores are masked to
    -inf so any window length runs with full-size tiles."""
    a = a_ref[0]  # (TQ, d)
    tkv = b_ref.shape[1]
    n_kv = tkv // kv_tile

    def body(j, carry):
        m, l, acc = carry
        bv = b_ref[0, pl.ds(j * kv_tile, kv_tile), :]  # (TK, d)
        s = jax.lax.dot_general(
            a, bv, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) * scale  # (TQ, TK)
        kv_pos = j * kv_tile + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where(kv_pos < tk_valid, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        l_new = l * corr + jnp.sum(p, axis=1)
        acc_new = acc * corr[:, None] + jax.lax.dot_general(
            p, bv, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return m_new, l_new, acc_new

    tq, d = a.shape
    m0 = jnp.full((tq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((tq,), jnp.float32)
    acc0 = jnp.zeros((tq, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_kv, body, (m0, l0, acc0))
    o_ref[0] = acc / l[:, None]


def cheap_xattn_pallas(
    a: jnp.ndarray,
    b: jnp.ndarray,
    q_tile: int = 128,
    kv_tile: int = 128,
    interpret: Optional[bool] = None,
):
    """softmax(A Bᵀ / √d) B with query/kv blocking; A: (B, Tq, d),
    B: (B, Tk, d). Pallas forward + jnp VJP (drop-in for
    gaitpd.ops.attention.cheap_cross_attention)."""
    if interpret is None:
        interpret = _interpret_default()

    @jax.custom_vjp
    def op(a, b):
        bsz, tq, d = a.shape
        tk = b.shape[1]
        qt = min(q_tile, tq)
        kt = min(kv_tile, tk)
        # pad both sequence dims up to tile multiples; padded kv positions
        # are masked to -inf inside the kernel (tk_valid)
        pad_q = (-tq) % qt
        pad_k = (-tk) % kt
        a_p = jnp.pad(a, ((0, 0), (0, pad_q), (0, 0)))
        b_p = jnp.pad(b, ((0, 0), (0, pad_k), (0, 0)))
        scale = 1.0 / np.sqrt(d)
        out = pl.pallas_call(
            functools.partial(_xattn_kernel, kv_tile=kt, scale=scale, tk_valid=tk),
            grid=(bsz, (tq + pad_q) // qt),
            in_specs=[
                pl.BlockSpec((1, qt, d), lambda i, j: (i, j, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
                pl.BlockSpec((1, tk + pad_k, d), lambda i, j: (i, 0, 0),
                             memory_space=pl.ANY if interpret else pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, qt, d), lambda i, j: (i, j, 0),
                                   memory_space=pl.ANY if interpret else pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((bsz, tq + pad_q, d), jnp.float32),
            interpret=interpret,
        )(a_p, b_p)
        return out[:, :tq, :]

    def ref(a, b):
        from gaitpd.ops.attention import cheap_cross_attention

        return cheap_cross_attention(a, b)

    def fwd(a, b):
        return op(a, b), (a, b)

    def bwd(res, g):
        a, b = res
        _, vjp = jax.vjp(ref, a, b)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op(a, b)
