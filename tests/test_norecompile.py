"""North-star property (BASELINE.json): masked relaxed-input eval across all
7 modality subsets runs through ONE compiled function — the mask is a traced
operand, never a shape."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_masked_eval_does_not_recompile():
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.step import StepSettings, make_apply_adapters, make_eval_step, make_loss_ctx
    from gaitpd.train.weargait_driver import MASK_COMBOS

    model = WearGaitThreeModal(synchronized=True, enc_out_ch=4, shared_out_ch=4)
    xs = tuple(jnp.ones((4, 16, c)) for c in (2, 13, 24))
    params = model.init(jax.random.PRNGKey(0), *xs)
    settings = StepSettings(n_streams=3, wm="ce", synchronized=True)
    ctx = make_loss_ctx(settings, [(3, 3)] * 3)
    _, ea = make_apply_adapters(model.apply, settings)
    eval_step = jax.jit(make_eval_step(ea, settings))
    batch = {
        "xs": xs,
        "ys": tuple(jnp.zeros((4,), jnp.int32) for _ in range(3)),
        "valid": jnp.ones((4,), jnp.float32),
    }
    # warm up once, then all 7 subsets must hit the cache
    out = eval_step(params, batch, ctx, jax.random.PRNGKey(0),
                    jnp.asarray(0, jnp.int32), jnp.asarray([True] * 3))
    jax.block_until_ready(out["losses"])
    misses0 = eval_step._cache_size()
    results = {}
    for name, mask in MASK_COMBOS.items():
        out = eval_step(params, batch, ctx, jax.random.PRNGKey(0),
                        jnp.asarray(0, jnp.int32), jnp.asarray(mask))
        results[name] = float(out["ens_correct"])
    assert eval_step._cache_size() == misses0, "mask value must not recompile"
    # masks actually change the ensemble membership
    assert len(results) == 7


def test_win_len_pallas_xattn_blocks():
    """The blocked attention kernel handles win lengths that are not tile
    multiples (memory-linear padding path)."""
    from gaitpd.ops.pallas_blocks import cheap_xattn_pallas
    from gaitpd.ops.attention import cheap_cross_attention

    rng = np.random.default_rng(0)
    for tq, tk in [(37, 53), (130, 257)]:
        a = jnp.asarray(rng.normal(size=(1, tq, 8)), jnp.float32)
        b = jnp.asarray(rng.normal(size=(1, tk, 8)), jnp.float32)
        got = np.asarray(cheap_xattn_pallas(a, b, q_tile=32, kv_tile=32))
        ref = np.asarray(cheap_cross_attention(a, b))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
