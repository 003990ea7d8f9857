"""Golden-value tests for the in-graph multitask machinery:

* the CAGrad simplex QP matches scipy SLSQP (the reference solves this on
  the host every step, multitask_weighting.py:694-718);
* the Frank-Wolfe min-norm element matches a dense grid search;
* FairGrad / NashMTL solvers satisfy their first-order conditions;
* mtl_grads produces the documented shared/private update semantics on a
  tiny analytic model.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from gaitpd.learning.minnorm import (  # noqa: E402
    cagrad_weights,
    fairgrad_weights,
    min_norm_element,
    nashmtl_weights,
    project_simplex,
)


def random_gram(rng, k, scale=1.0):
    g = rng.normal(size=(k, 6)) * scale
    return g @ g.T + 1e-4 * np.eye(k)


def cagrad_objective(w, gram, c):
    k = gram.shape[0]
    b = np.ones(k) / k
    return float(w @ gram @ b + c * np.sqrt(w @ gram @ w + 1e-8))


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cagrad_weights_match_scipy(k, seed):
    from scipy.optimize import minimize

    rng = np.random.default_rng(seed)
    gram = random_gram(rng, k, scale=1.0 + seed)
    c = 0.5 * np.sqrt(gram.mean() + 1e-8)

    w_ours = np.asarray(cagrad_weights(jnp.asarray(gram, jnp.float32),
                                       jnp.asarray(c, jnp.float32)))
    x0 = np.ones(k) / k
    res = minimize(
        lambda x: cagrad_objective(x, gram, c),
        x0,
        bounds=[(0, 1)] * k,
        constraints={"type": "eq", "fun": lambda x: 1 - x.sum()},
    )
    f_ours = cagrad_objective(w_ours, gram, c)
    f_scipy = cagrad_objective(res.x, gram, c)
    # our in-graph solver must reach (or beat) scipy's objective value
    assert f_ours <= f_scipy + 1e-4, (f_ours, f_scipy, w_ours, res.x)
    np.testing.assert_allclose(w_ours.sum(), 1.0, atol=1e-5)
    assert np.all(w_ours >= -1e-6)


@pytest.mark.parametrize("k", [2, 3])
def test_min_norm_element(k):
    rng = np.random.default_rng(k)
    gram = random_gram(rng, k)
    w = np.asarray(min_norm_element(jnp.asarray(gram, jnp.float32)))
    # brute-force over the simplex
    best = np.inf
    for _ in range(20000):
        v = rng.dirichlet(np.ones(k))
        best = min(best, v @ gram @ v)
    ours = w @ gram @ w
    assert ours <= best * 1.01 + 1e-6


def test_fairgrad_fixed_point():
    rng = np.random.default_rng(0)
    gram = random_gram(rng, 3)
    for alpha in (0.5, 1.0, 2.0):
        w = np.asarray(fairgrad_weights(jnp.asarray(gram, jnp.float32),
                                        jnp.asarray(alpha, jnp.float32)))
        resid = gram @ w - np.power(w, -1.0 / alpha)
        assert np.abs(resid).max() < 1e-2, (alpha, w, resid)


def test_nashmtl_fixed_point():
    rng = np.random.default_rng(1)
    gram = random_gram(rng, 3)
    gram = gram / np.linalg.norm(gram)
    a = np.asarray(nashmtl_weights(jnp.asarray(gram, jnp.float32)))
    resid = gram @ a - 1.0 / a
    assert np.abs(resid).max() < 1e-3, (a, resid)


def test_project_simplex():
    v = jnp.asarray([0.4, 2.0, -1.0])
    p = np.asarray(project_simplex(v))
    np.testing.assert_allclose(p.sum(), 1.0, atol=1e-6)
    assert np.all(p >= 0)
    # already on simplex -> unchanged
    v2 = jnp.asarray([0.2, 0.3, 0.5])
    np.testing.assert_allclose(np.asarray(project_simplex(v2)), np.asarray(v2), atol=1e-6)


def test_mtl_grads_semantics():
    """Analytic check of shared/private combination on a fake 'model':
    params = {'params': {'shared': w_s, 'a': w_a, 'b': w_b}},
    l_0 = w_s^2 + w_a^2, l_1 = 2 w_s^2 + w_b^2 (per-task grads known)."""
    from gaitpd.learning.mtl import build_flat_partition, make_method, mtl_grads

    params = {
        "params": {
            "shared": {"w": jnp.asarray([1.0, 2.0])},
            "a": {"w": jnp.asarray([3.0])},
            "b": {"w": jnp.asarray([4.0])},
        }
    }

    def loss_fn(p):
        ws = p["params"]["shared"]["w"]
        wa = p["params"]["a"]["w"]
        wb = p["params"]["b"]["w"]
        l0 = jnp.sum(ws**2) + jnp.sum(wa**2)
        l1 = 2 * jnp.sum(ws**2) + jnp.sum(wb**2)
        return jnp.stack([l0, l1]), None

    partition = build_flat_partition(params, ["shared"], [["a"], ["b"]])
    # LS with unit weights, no clipping: shared grad = g0+g1, private = own sums
    method = make_method("ls", 2)
    grads, losses, _, _, _ = mtl_grads(
        method, lambda p: loss_fn(p), params, partition, {},
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(losses), [14.0, 26.0], rtol=1e-6)
    # d l0/d ws = 2ws, d l1/d ws = 4ws -> sum = 6*ws
    np.testing.assert_allclose(
        np.asarray(grads["params"]["shared"]["w"]), [6.0, 12.0], rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(grads["params"]["a"]["w"]), [6.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grads["params"]["b"]["w"]), [8.0], rtol=1e-5)

    # sum_plus_own doubles each private grad (weargait semantics,
    # reference weargait_train.py:217-242)
    grads2, *_ = mtl_grads(
        method, lambda p: loss_fn(p), params, partition, {},
        jax.random.PRNGKey(0), private_grads="sum_plus_own",
    )
    np.testing.assert_allclose(np.asarray(grads2["params"]["a"]["w"]), [12.0], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grads2["params"]["shared"]["w"]), [6.0, 12.0], rtol=1e-5
    )


def test_cagrad_collapses_to_scaled_mean_when_equal():
    """With identical per-task gradients the CAGrad direction is the common
    gradient (x K / (1+c^2) x (1 + c)) — sanity of the blending formula."""
    from gaitpd.learning.mtl import CAGrad

    g = np.array([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]], np.float32)
    method = CAGrad(n_tasks=2, c=0.5, max_norm=0.0)
    gram = jnp.asarray(g @ g.T)
    shared, w_priv, _, info = method.combine(
        jnp.asarray([1.0, 1.0]), jnp.asarray(g), gram, {}, jax.random.PRNGKey(0)
    )
    gnorm = np.linalg.norm(g[0])
    expect = g[0] * (1 + 0.5 * gnorm / gnorm) / (1 + 0.25) * 2
    np.testing.assert_allclose(np.asarray(shared), expect, rtol=1e-3)


def test_stl_isolates_other_private_params():
    """STL(main_task=0): only the main task's loss drives updates, so other
    tasks' private parameters receive zero gradient (reference STL,
    multitask_weighting.py:515-528)."""
    from gaitpd.learning.mtl import build_flat_partition, make_method, mtl_grads

    params = {
        "params": {
            "shared": {"w": jnp.asarray([1.0, 2.0])},
            "a": {"w": jnp.asarray([3.0])},
            "b": {"w": jnp.asarray([4.0])},
        }
    }

    def loss_fn(p):
        ws = p["params"]["shared"]["w"]
        l0 = jnp.sum(ws**2) + jnp.sum(p["params"]["a"]["w"] ** 2)
        l1 = jnp.sum(ws**2) + jnp.sum(p["params"]["b"]["w"] ** 2)
        return jnp.stack([l0, l1]), None

    partition = build_flat_partition(params, ["shared"], [["a"], ["b"]])
    grads, *_ = mtl_grads(
        make_method("stl", 2, main_task=0), lambda p: loss_fn(p), params,
        partition, {}, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(grads["params"]["a"]["w"]), [6.0])
    np.testing.assert_allclose(np.asarray(grads["params"]["b"]["w"]), [0.0])
    np.testing.assert_allclose(np.asarray(grads["params"]["shared"]["w"]), [2.0, 4.0])
