"""In-graph min-norm-element and simplex solvers.

Replaces the reference's host-side Sener-Koltun solver
(train/learning/optimizers/min_norm_solver.py) and the per-step
scipy.optimize round-trips inside CAGrad / FairGrad / NashMTL
(train/learning/optimizers/multitask_weighting.py:717,830,196) with
fixed-iteration solvers built from jax.lax loops, so the whole gradient
surgery stays inside one compiled TPU step. All problems here are tiny
(K = 2 or 3 tasks) convex programs over the simplex; fixed iteration counts
are cheap and keep shapes static.
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

EPS = 1e-8


def project_simplex(v: jnp.ndarray) -> jnp.ndarray:
    """Euclidean projection of v onto the probability simplex
    (sort-based algorithm; K is tiny and static)."""
    k = v.shape[0]
    u = jnp.sort(v)[::-1]
    css = jnp.cumsum(u) - 1.0
    ind = jnp.arange(1, k + 1, dtype=v.dtype)
    cond = u - css / ind > 0
    rho = jnp.max(jnp.where(cond, jnp.arange(k), 0))
    theta = css[rho] / (rho + 1.0)
    return jnp.maximum(v - theta, 0.0)


def min_norm_element(gram: jnp.ndarray, iters: int = 250) -> jnp.ndarray:
    """Weights w on the simplex minimising wᵀ G w (G = Gram matrix of the
    per-task gradients): the MGDA min-norm element
    (reference min_norm_solver.py:109-198), via Frank-Wolfe with the exact
    2-point line search."""
    k = gram.shape[0]
    w0 = jnp.ones((k,), gram.dtype) / k

    def body(_, w):
        grad = gram @ w
        t = jnp.argmin(grad)
        e_t = jax.nn.one_hot(t, k, dtype=w.dtype)
        # exact line search between current point w and vertex e_t:
        # gamma* = <w - e_t, G w> / <w - e_t, G (w - e_t)>  (clipped to [0,1])
        d = w - e_t
        num = d @ (gram @ w)
        den = d @ (gram @ d)
        gamma = jnp.clip(num / (den + EPS), 0.0, 1.0)
        return (1.0 - gamma) * w + gamma * e_t

    return jax.lax.fori_loop(0, iters, body, w0)


def cagrad_weights(
    gram: jnp.ndarray, c_coef: jnp.ndarray, iters: int = 60, ls_iters: int = 30
) -> jnp.ndarray:
    """Solve the CAGrad dual:  min_{w in simplex}  wᵀ G w̄ + c √(wᵀ G w)
    with w̄ = 1/K (reference multitask_weighting.py:694-718, which calls
    scipy SLSQP on the host every step). Projected gradient with an exact
    golden-section line search along each projected direction — fixed
    iteration counts, fully in-graph, matches scipy to <1e-4 in objective
    (tests/test_mtl.py)."""
    k = gram.shape[0]
    b = jnp.ones((k,), gram.dtype) / k
    gb = gram @ b
    lips = jnp.linalg.norm(gram) + c_coef + EPS

    def f(w):
        return w @ gb + c_coef * jnp.sqrt(w @ (gram @ w) + EPS)

    invphi = 0.6180339887498949

    def golden(w, d):
        # minimise f(w + g*d) over g in [0, 1]
        def ls_body(_, st):
            lo, hi = st
            m1 = hi - invphi * (hi - lo)
            m2 = lo + invphi * (hi - lo)
            go_right = f(w + m1 * d) > f(w + m2 * d)
            return jnp.where(go_right, m1, lo), jnp.where(go_right, hi, m2)

        lo, hi = jax.lax.fori_loop(
            0, ls_iters, ls_body, (jnp.zeros((), w.dtype), jnp.ones((), w.dtype))
        )
        return 0.5 * (lo + hi)

    def body(_, w):
        quad = w @ (gram @ w)
        grad = gb + c_coef * (gram @ w) / jnp.sqrt(quad + EPS)
        d = project_simplex(w - grad / lips) - w
        w_new = w + golden(w, d) * d
        return jnp.where(f(w_new) < f(w), w_new, w)

    w = jax.lax.fori_loop(0, iters, body, b)

    # SMO-style polish: exact line search along every pairwise mass-transfer
    # direction e_i - e_j (stays on the simplex); nails the last ~1e-4.
    dirs = []
    for i in range(k):
        for j in range(k):
            if i != j:
                e = np.zeros((k,), dtype=np.float32)
                e[i], e[j] = 1.0, -1.0
                dirs.append(e)
    dirs = jnp.asarray(np.stack(dirs))

    def polish(_, w):
        def one(w, e):
            # max step keeping w + g*(e) >= 0: limited by w[j]
            gmax = jnp.sum(jnp.where(e < 0, w, 0.0))
            d = e * gmax
            w_new = w + golden(w, d) * d
            return jnp.where(f(w_new) < f(w), w_new, w), None

        w, _ = jax.lax.scan(one, w, dirs)
        return w

    return jax.lax.fori_loop(0, 4, polish, w)


def fairgrad_weights(
    gram: jnp.ndarray, alpha: jnp.ndarray, iters: int = 100
) -> jnp.ndarray:
    """Solve G w = w^{-1/alpha}, w >= 0 (reference multitask_weighting.py:820-834,
    host scipy.least_squares). Damped Newton on F(w) = G w - w^{-1/alpha} with
    positivity clipping; K x K linear solves are trivial on-device."""
    k = gram.shape[0]
    w0 = jnp.ones((k,), gram.dtype) / k
    inv_a = 1.0 / alpha

    def body(_, w):
        f = gram @ w - jnp.power(w, -inv_a)
        jac = gram + jnp.diag(inv_a * jnp.power(w, -inv_a - 1.0))
        delta = jnp.linalg.solve(jac + EPS * jnp.eye(k, dtype=w.dtype), f)
        return jnp.maximum(w - 0.5 * delta, 1e-6)

    return jax.lax.fori_loop(0, iters, body, w0)


def nashmtl_weights(gram: jnp.ndarray, iters: int = 50) -> jnp.ndarray:
    """Solve the Nash-MTL first-order condition G α = 1/α, α > 0
    (reference multitask_weighting.py:150-243 solves a cvxpy/ECOS sequence on
    the host). Damped Newton on F(α) = G α - 1/α; the Jacobian
    G + diag(1/α²) is positive definite for PSD G."""
    k = gram.shape[0]
    a0 = jnp.ones((k,), gram.dtype)

    def body(_, a):
        f = gram @ a - 1.0 / a
        jac = gram + jnp.diag(1.0 / (a * a))
        delta = jnp.linalg.solve(jac + EPS * jnp.eye(k, dtype=a.dtype), f)
        return jnp.maximum(a - 0.8 * delta, 1e-6)

    return jax.lax.fori_loop(0, iters, body, a0)
