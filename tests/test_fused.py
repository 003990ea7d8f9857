"""Equivalence of the fused block-diagonal WearGait forward
(gaitpd/models/fused.py) with the faithful per-stream WearGaitThreeModal.

The fused path consumes the UNFUSED model's parameter pytree verbatim, so
the tests init the normal model and compare logits (and gradients) through
both applies on the same params/inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gaitpd.models.fused import make_fused_weargait_apply
from gaitpd.models.multitask import WearGaitThreeModal

B, T = 4, 64


def _inputs(seed=0):
    r = np.random.default_rng(seed)
    return (
        jnp.asarray(r.normal(size=(B, T, 2)), jnp.float32),
        jnp.asarray(r.normal(size=(B, T, 13)), jnp.float32),
        jnp.asarray(r.normal(size=(B, T, 24)), jnp.float32),
    )


def _model(sync, use_norm=False, use_cosine=False):
    m = WearGaitThreeModal(
        num_classes=2, use_norm=use_norm, use_cosine=use_cosine,
        synchronized=sync,
    )
    xs = _inputs()
    params = m.init(jax.random.PRNGKey(0), *xs)
    return m, params, xs


@pytest.mark.parametrize("sync", [True, False])
@pytest.mark.parametrize(
    "use_norm,use_cosine",
    [(False, False), (True, False), (True, True)],
    ids=["plain", "norm", "cosine"],
)
def test_fused_matches_unfused_logits(sync, use_norm, use_cosine):
    m, params, xs = _model(sync, use_norm, use_cosine)
    ref = m.apply(params, *xs)
    fused = make_fused_weargait_apply(m)(params, *xs)
    for a, b in zip(ref, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_fused_matches_unfused_gradients():
    """Training through the fused apply is the same optimization problem:
    grads of a CE-style scalar loss match the unfused path."""
    m, params, xs = _model(sync=True, use_norm=True, use_cosine=True)
    y = jnp.asarray(np.random.default_rng(1).integers(0, 2, size=B))

    def loss(apply_fn):
        def f(p):
            lw, li, lm = apply_fn(p, *xs)
            out = 0.0
            for lg in (lw, li, lm):
                out += -jnp.mean(
                    jax.nn.log_softmax(lg * 10.0)[jnp.arange(B), y]
                )
            return out
        return f

    from jax.flatten_util import ravel_pytree

    g_ref = jax.grad(loss(m.apply))(params)
    g_fused = jax.grad(loss(make_fused_weargait_apply(m)))(params)
    flat_r, _ = ravel_pytree(g_ref)
    flat_f, _ = ravel_pytree(g_fused)
    np.testing.assert_allclose(
        np.asarray(flat_r), np.asarray(flat_f), atol=5e-5
    )


def test_fused_rejects_pooled_encoders():
    m = WearGaitThreeModal(pool_len=30)
    with pytest.raises(ValueError):
        make_fused_weargait_apply(m)


def test_fused_driver_matches_unfused():
    """--fused through the full WearGait driver (same seed/fold) reproduces
    the unfused run's metrics: identical init params + a forward equal to
    ~1e-5 keeps a short run's macro/per-mask table numerically aligned."""
    from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

    kw = dict(
        n_folds=2, test_per_class=3, epochs=3, patience=50, synthetic=True,
        verbose=False, seed=0, n_folds_cap=1, wm="gcl", alpha=0.5,
    )
    base = run_cv(WearGaitArgs(**kw))
    fused = run_cv(WearGaitArgs(fused=True, **kw))
    assert fused["macro"][0] == pytest.approx(base["macro"][0], abs=1.0)
    for k in base["masks"]:
        assert fused["masks"][k] == pytest.approx(base["masks"][k], abs=2.0)


def test_fused_vmap_cv_matches_sequential_fused():
    """--fused composes with --vmap_folds: the vmapped fused run reproduces
    the sequential fused run (the general vmap<->sequential equivalence is
    pinned in tests/test_vmap_cv.py; this pins the fused-apply wiring)."""
    from gaitpd.train.vmap_cv import run_cv_vmapped
    from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

    kw = dict(
        n_folds=2, test_per_class=3, epochs=2, patience=50, synthetic=True,
        verbose=False, seed=0, wm="gcl", alpha=0.5, fused=True,
    )
    seq = run_cv(WearGaitArgs(**kw))
    vm = run_cv_vmapped(WearGaitArgs(**kw))
    assert vm["macro"][0] == pytest.approx(seq["macro"][0], abs=1e-6)
