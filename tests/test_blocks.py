"""Unit tests for the core blocks: adaptive pooling parity with torch,
cosine head, conv layouts, encoder/backbone shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaitpd.models.blocks import (
    CosineLinear,
    TaskHead,
    adaptive_avg_pool1d,
    adaptive_avg_pool_matrix,
    flatten_skel,
)
from gaitpd.models.encoders import (
    IMUEncoderShallow,
    InsoleEncoderDeep,
    SensorEncoder,
    SharedBackbone,
    SkeletonMLP,
    WalkwayEncoder,
)


@pytest.mark.parametrize("t_in,t_out", [(101, 8), (426, 101), (65, 65), (64, 8), (7, 3)])
def test_adaptive_pool_matches_torch(t_in, t_out):
    torch = pytest.importorskip("torch")
    x = np.random.default_rng(0).normal(size=(2, t_in, 5)).astype(np.float32)
    got = np.asarray(adaptive_avg_pool1d(jnp.asarray(x), t_out))
    ref = (
        torch.nn.AdaptiveAvgPool1d(t_out)(torch.from_numpy(x).permute(0, 2, 1))
        .permute(0, 2, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_pool_matrix_rows_sum_to_one():
    p = adaptive_avg_pool_matrix(101, 8)
    np.testing.assert_allclose(p.sum(axis=0), np.ones(8), rtol=1e-6)


def test_cosine_linear_bounded():
    m = CosineLinear(3)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(4, 16)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (4, 3)
    assert np.all(np.abs(np.asarray(out)) < 1.0)


@pytest.mark.parametrize("use_norm,use_cosine", [(False, False), (True, False), (False, True)])
def test_task_head_variants(use_norm, use_cosine):
    m = TaskHead(3, use_norm=use_norm, use_cosine=use_cosine)
    x = jnp.ones((2, 128))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 3)


def test_flatten_skel():
    x = jnp.ones((2, 101, 17, 3))
    assert flatten_skel(x).shape == (2, 101, 51)
    x3 = jnp.ones((2, 101, 51))
    assert flatten_skel(x3).shape == (2, 101, 51)


def test_sensor_encoder_conditional_pooling():
    # FoG config: T=426 pooled to 101 (reference feature_encoder.py:55-56)
    m = SensorEncoder(6, sensor_length=426, output_length=101)
    x = jnp.ones((2, 426, 6))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 101, 6)
    # FBG config: T=65, sensor_length=65 -> pooled to 101? No: reference pools
    # when T == sensor_length; for fbg output_length defaults to 101 but the
    # driver passes 65-long data with sensor_length=65 -> pool to 101.
    m2 = SensorEncoder(3, sensor_length=65, output_length=101)
    x2 = jnp.ones((2, 65, 3))
    p2 = m2.init(jax.random.PRNGKey(0), x2)
    assert m2.apply(p2, x2).shape == (2, 101, 3)
    # mismatched length -> no pooling
    m3 = SensorEncoder(3, sensor_length=65, output_length=101)
    x3 = jnp.ones((2, 50, 3))
    p3 = m3.init(jax.random.PRNGKey(0), x3)
    assert m3.apply(p3, x3).shape == (2, 50, 3)


def test_backbone_and_encoders_shapes():
    key = jax.random.PRNGKey(0)
    bb = SharedBackbone(16, 8)
    x = jnp.ones((4, 101, 6))
    p = bb.init(key, x)
    assert bb.apply(p, x).shape == (4, 8, 16)

    sk = SkeletonMLP(6)
    xs = jnp.ones((4, 101, 21))
    ps = sk.init(key, xs)
    assert sk.apply(ps, xs).shape == (4, 101, 6)

    for enc, ch in [
        (WalkwayEncoder(12), 2),
        (InsoleEncoderDeep(12, hidden_ch=24), 13),
        (IMUEncoderShallow(12), 24),
    ]:
        xw = jnp.ones((4, 64, ch))
        pw = enc.init(key, xw)
        assert enc.apply(pw, xw).shape == (4, 64, 12)
