"""Pallas kernels vs their jnp reference implementations (interpret mode on
CPU; compiled on real TPU via bench/graft paths)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gaitpd.ops.attention import cheap_cross_attention  # noqa: E402
from gaitpd.ops.pallas_blocks import (  # noqa: E402
    cheap_xattn_pallas,
    make_stream_block,
    stream_block_reference,
)

RNG = np.random.default_rng(0)


@pytest.mark.parametrize("k,act", [(3, "relu"), (5, "gelu")])
def test_stream_block_matches_reference(k, act):
    x = jnp.asarray(RNG.normal(size=(8, 64, 13)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(k, 13, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(RNG.normal(size=(16,)) * 0.1, jnp.float32)
    op = make_stream_block(act, t_out=8)
    got = np.asarray(op(x, w, b))
    ref = np.asarray(stream_block_reference(x, w, b, t_out=8, act_name=act))
    assert got.shape == (8, 8, 16)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_stream_block_matches_flax_backbone():
    """The fused kernel must equal SharedBackbone (conv k3 + relu + pool)."""
    from gaitpd.models.encoders import SharedBackbone

    x = jnp.asarray(RNG.normal(size=(4, 101, 6)), jnp.float32)
    m = SharedBackbone(16, 8)
    params = m.init(jax.random.PRNGKey(0), x)
    conv = params["params"]["Conv1dSame_0"]["Conv_0"]
    got = np.asarray(make_stream_block("relu", 8)(x, conv["kernel"], conv["bias"]))
    ref = np.asarray(m.apply(params, x))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_stream_block_grads_match():
    x = jnp.asarray(RNG.normal(size=(4, 32, 6)), jnp.float32)
    w = jnp.asarray(RNG.normal(size=(3, 6, 8)) * 0.1, jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    op = make_stream_block("relu", 4)

    g1 = jax.grad(lambda w_: jnp.sum(op(x, w_, b) ** 2))(w)
    g2 = jax.grad(lambda w_: jnp.sum(stream_block_reference(x, w_, b, 4) ** 2))(w)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("tq,tk", [(64, 64), (101, 426), (200, 100)])
def test_cheap_xattn_pallas_matches_jnp(tq, tk):
    a = jnp.asarray(RNG.normal(size=(2, tq, 12)), jnp.float32)
    b = jnp.asarray(RNG.normal(size=(2, tk, 12)), jnp.float32)
    got = np.asarray(cheap_xattn_pallas(a, b, q_tile=64, kv_tile=64))
    ref = np.asarray(cheap_cross_attention(a, b))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


def test_cheap_xattn_grads_match():
    a = jnp.asarray(RNG.normal(size=(2, 32, 8)), jnp.float32)
    b = jnp.asarray(RNG.normal(size=(2, 48, 8)), jnp.float32)
    g1 = jax.grad(lambda a_: jnp.sum(cheap_xattn_pallas(a_, b) ** 2))(a)
    g2 = jax.grad(lambda a_: jnp.sum(cheap_cross_attention(a_, b) ** 2))(a)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
