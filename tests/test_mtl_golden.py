"""One-step numerical golden tests for the MTL long tail (VERDICT r1 item 4).

For each of FAMO, DWA, IMTL-G, PCGrad, GradDrop, RLW, UW the reference's
update (train/learning/optimizers/multitask_weighting.py) is implemented
in-test in torch/numpy — real autograd graph, real torch.optim.Adam where the
reference uses one — and the resulting parameter gradients are compared
against gaitpd.learning.mtl on the same losses/gradients. Stochastic methods
(RLW, GradDrop, PCGrad order) are compared conditioned on the same random
draw: the test reproduces the jax-side draw from the PRNG key and feeds it to
the torch-side formula (the randomness source is jax-PRNG by design; the
update math given the draw is what must match).

Solver-backed methods (CAGrad/MGDA/FairGrad/Nash) are covered in test_mtl.py
against scipy; this file covers every remaining METHODS key numerically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gaitpd.learning.mtl import build_flat_partition, make_method, mtl_grads

K, P = 3, 6
RNG = np.random.default_rng(7)
J = RNG.normal(size=(K, P)).astype(np.float32)  # shared-param grad rows
A = np.asarray([0.7, -1.3, 2.1], np.float32)  # private-param grad scales
OFF = np.asarray([2.0, 3.0, 1.5], np.float32)  # keeps losses positive


def jax_setup():
    params = {
        "params": {
            "shared": {"w": jnp.zeros((P,), jnp.float32)},
            "t0": {"q": jnp.zeros((), jnp.float32)},
            "t1": {"q": jnp.zeros((), jnp.float32)},
            "t2": {"q": jnp.zeros((), jnp.float32)},
        }
    }
    jj, aa, off = jnp.asarray(J), jnp.asarray(A), jnp.asarray(OFF)

    def loss_fn(p, extra=None):
        ws = p["params"]["shared"]["w"]
        qs = jnp.stack([p["params"][f"t{k}"]["q"] for k in range(K)])
        ls = jj @ ws + aa * qs + off + (0.0 if extra is None else extra)
        return ls, None

    partition = build_flat_partition(
        params, ["shared"], [["t0"], ["t1"], ["t2"]]
    )
    return params, loss_fn, partition


def torch_setup():
    """Same fake model in torch: losses_k = J_k·w + a_k q_k + off_k."""
    w = torch.zeros(P, requires_grad=True)
    qs = [torch.zeros((), requires_grad=True) for _ in range(K)]
    jj = torch.from_numpy(J)

    def losses(extra=None):
        ls = [
            jj[k] @ w + float(A[k]) * qs[k] + float(OFF[k]) for k in range(K)
        ]
        if extra is not None:
            ls = [l + float(extra[k]) for k, l in enumerate(ls)]
        return torch.stack(ls)

    def zero():
        for t in [w] + qs:
            t.grad = None

    return w, qs, losses, zero


def assert_grads_match(grads, w, qs, rtol=1e-5, atol=1e-6):
    np.testing.assert_allclose(
        np.asarray(grads["params"]["shared"]["w"]),
        w.grad.numpy(),
        rtol=rtol,
        atol=atol,
    )
    for k in range(K):
        np.testing.assert_allclose(
            np.asarray(grads["params"][f"t{k}"]["q"]),
            qs[k].grad.numpy(),
            rtol=rtol,
            atol=atol,
        )


def test_uw_golden():
    """Uncertainty (reference :531-553): loss = Σ 0.5(exp(-s_k) l_k + s_k)
    with log-sigmas frozen at 0 (the drivers never optimize them)."""
    w, qs, losses, zero = torch_setup()
    logsigma = torch.zeros(K, requires_grad=True)
    loss = sum(
        0.5 * (torch.exp(-logsigma[k]) * l + logsigma[k])
        for k, l in enumerate(losses())
    )
    loss.backward()

    params, loss_fn, partition = jax_setup()
    method = make_method("uw", K)  # default lr=0 == reference-frozen
    grads, ls, _, new_state, _ = mtl_grads(
        method, loss_fn, params, partition, method.init_state(),
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(ls), OFF, rtol=1e-6)
    assert_grads_match(grads, w, qs)
    np.testing.assert_allclose(np.asarray(new_state["logsigma"]), np.zeros(K))


def test_rlw_golden():
    """RLW (reference :1101-1112): loss = Σ w_k l_k, w = softmax(N(0,1)).
    Conditioned on the same draw (reproduced from the jax PRNG key)."""
    key = jax.random.PRNGKey(42)
    w_draw = np.asarray(
        jax.nn.softmax(jax.random.normal(key, (K,), jnp.float32))
    )

    w, qs, losses, zero = torch_setup()
    loss = torch.sum(losses() * torch.from_numpy(w_draw))
    loss.backward()

    params, loss_fn, partition = jax_setup()
    grads, _, _, _, info = mtl_grads(
        make_method("rlw", K), loss_fn, params, partition, {}, key
    )
    np.testing.assert_allclose(np.asarray(info["weights"]), w_draw, rtol=1e-6)
    assert_grads_match(grads, w, qs)


def test_dwa_golden_sequence():
    """DWA (reference :1269-1315): FIFO cost buffer, weights switch on after
    `iteration_window` steps, loss = (w·l).mean(). 9 steps with a varying
    loss sequence; per-step gradients and weights must match the reference's
    numpy/torch update."""
    win = 3
    n_steps = 3 * win
    steps = [
        np.sin(np.arange(K, dtype=np.float32) + 0.3 * t) for t in range(n_steps)
    ]

    # --- reference-style torch/numpy implementation --------------------------
    w, qs, losses, zero = torch_setup()
    costs = np.ones((2 * win, K), np.float32)
    weights = np.ones(K, np.float32)
    running = 0
    ref_grads, ref_weights = [], []
    for t in range(n_steps):
        zero()
        ls = losses(steps[t])
        costs[:-1] = costs[1:]
        costs[-1] = ls.detach().numpy()
        if running > win:
            ws = costs[win:].mean(0) / costs[:win].mean(0)
            weights = (K * np.exp(ws / 2.0)) / np.exp(ws / 2.0).sum()
        tw = torch.from_numpy(weights.astype(np.float32))
        (tw * ls).mean().backward()
        running += 1
        ref_grads.append(w.grad.numpy().copy())
        ref_weights.append(weights.copy())

    # --- gaitpd state-threaded sequence --------------------------------------
    params, loss_fn, partition = jax_setup()
    method = make_method("dwa", K, iteration_window=win, temp=2.0)
    state = method.init_state()
    for t in range(n_steps):
        grads, _, _, state, info = mtl_grads(
            method, loss_fn, params, partition, state, jax.random.PRNGKey(t),
            jnp.asarray(steps[t]),
        )
        np.testing.assert_allclose(
            np.asarray(info["weights"]), ref_weights[t], rtol=1e-5,
            err_msg=f"step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(grads["params"]["shared"]["w"]), ref_grads[t],
            rtol=1e-4, atol=1e-6, err_msg=f"step {t}",
        )


def test_famo_golden_sequence():
    """FAMO (reference :109-147): logits adapted by a real torch.optim.Adam
    (lr=0.025, coupled weight_decay=gamma) from step-to-step loss deltas;
    weighted loss 3·Σ z_k log(D_k)/c. The reference protocol is
    backward(L_t) → update(L_{t+1}); gaitpd folds update into the next
    combine. 4 steps compared step-by-step."""
    gamma, w_lr = 1e-5, 0.025
    n_steps = 4
    deltas = [
        0.8 * np.cos(np.arange(K, dtype=np.float32) * 1.7 + t)
        for t in range(n_steps)
    ]

    # --- reference-style torch implementation --------------------------------
    w, qs, losses, zero = torch_setup()
    fw = torch.zeros(K, requires_grad=True)
    opt = torch.optim.Adam([fw], lr=w_lr, weight_decay=gamma)
    min_losses = torch.zeros(K)
    prev_loss = None
    ref_grads, ref_z = [], []
    for t in range(n_steps):
        ls = losses(deltas[t])
        if t > 0:
            delta = (prev_loss - min_losses + 1e-8).log() - (
                ls.detach() - min_losses + 1e-8
            ).log()
            d = torch.autograd.grad(
                F.softmax(fw, -1), fw, grad_outputs=delta, retain_graph=False,
                create_graph=False, allow_unused=False, is_grads_batched=False,
            )[0]
            opt.zero_grad()
            fw.grad = d
            opt.step()
        prev_loss = ls.detach()
        zero()
        z = F.softmax(fw, -1)
        D = ls - min_losses + 1e-8
        c = (z / D).sum().detach()
        (3 * (D.log() * z / c).sum()).backward()
        fw.grad = None  # the reference's update() discards backward's w-grad
        ref_grads.append(w.grad.numpy().copy())
        ref_z.append(z.detach().numpy().copy())

    # --- gaitpd state-threaded sequence --------------------------------------
    params, loss_fn, partition = jax_setup()
    method = make_method("famo", K, gamma=gamma, w_lr=w_lr)
    state = method.init_state()
    for t in range(n_steps):
        grads, _, _, state, info = mtl_grads(
            method, loss_fn, params, partition, state, jax.random.PRNGKey(t),
            jnp.asarray(deltas[t]),
        )
        np.testing.assert_allclose(
            np.asarray(info["weights"]), ref_z[t], rtol=1e-4,
            err_msg=f"step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(grads["params"]["shared"]["w"]), ref_grads[t],
            rtol=1e-4, atol=1e-6, err_msg=f"step {t}",
        )


def test_imtlg_golden():
    """IMTL-G (reference :1115-1189): closed-form impartial alpha from shared
    grads + their normalized rows; loss = Σ alpha_k l_k applied to the whole
    graph (shared AND private)."""
    w, qs, losses, zero = torch_setup()
    ls = losses()
    grads_t, norm_t = [], []
    for k in range(K):
        (g,) = torch.autograd.grad(ls[k], w, retain_graph=True)
        grads_t.append(g)
        norm_t.append(g / torch.norm(g))
    G = torch.stack(grads_t)
    D = G[0] - G[1:]
    U = torch.stack(norm_t)
    U = U[0] - U[1:]
    first = G[0] @ U.t()
    second = torch.inverse(D @ U.t())
    alpha_ = first @ second
    alpha = torch.cat(((1 - alpha_.sum()).unsqueeze(-1), alpha_))
    torch.sum(ls * alpha.detach()).backward()

    params, loss_fn, partition = jax_setup()
    grads, _, _, _, info = mtl_grads(
        make_method("imtl", K), loss_fn, params, partition, {},
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(info["weights"]), alpha.detach().numpy(), rtol=1e-4
    )
    assert_grads_match(grads, w, qs, rtol=1e-4)


def test_pcgrad_golden_two_tasks():
    """PCGrad (reference :556-650) with K=2: the projection outcome is
    shuffle-order independent (self-projections are no-ops by Cauchy-Schwarz),
    so the one-step update is deterministic and comparable exactly. Private
    params get the plain losses.sum() gradient."""
    k2 = 2
    j2 = np.asarray(
        [[1.0, 0.0, 2.0, -1.0], [-1.5, 0.5, -2.5, 0.0]], np.float32
    )  # strongly conflicting: j2[0]·j2[1] < 0
    assert float(j2[0] @ j2[1]) < 0
    a2 = np.asarray([0.9, -0.4], np.float32)
    off2 = np.asarray([1.0, 2.0], np.float32)

    # --- reference-style torch implementation --------------------------------
    w = torch.zeros(4, requires_grad=True)
    qs = [torch.zeros((), requires_grad=True) for _ in range(k2)]
    jt = torch.from_numpy(j2)
    ls = torch.stack(
        [jt[k] @ w + float(a2[k]) * qs[k] + float(off2[k]) for k in range(k2)]
    )
    shared_grads = [torch.autograd.grad(l, w, retain_graph=True)[0] for l in ls]
    pc = [g.clone() for g in shared_grads]
    for gi in pc:
        for gj in shared_grads:
            dot = torch.dot(gi, gj)
            if dot < 0:
                gi -= dot * gj / (torch.norm(gj) ** 2)
    merged = sum(pc)
    priv = torch.autograd.grad(ls.sum(), qs)

    # --- gaitpd ---------------------------------------------------------------
    params = {
        "params": {
            "shared": {"w": jnp.zeros((4,), jnp.float32)},
            "t0": {"q": jnp.zeros((), jnp.float32)},
            "t1": {"q": jnp.zeros((), jnp.float32)},
        }
    }

    def loss_fn(p):
        ws = p["params"]["shared"]["w"]
        qj = jnp.stack([p["params"][f"t{k}"]["q"] for k in range(k2)])
        return jnp.asarray(j2) @ ws + jnp.asarray(a2) * qj + jnp.asarray(off2), None

    partition = build_flat_partition(params, ["shared"], [["t0"], ["t1"]])
    grads, _, _, _, _ = mtl_grads(
        make_method("pcgrad", k2, max_norm=0.0), loss_fn, params, partition,
        {}, jax.random.PRNGKey(3),
    )
    np.testing.assert_allclose(
        np.asarray(grads["params"]["shared"]["w"]), merged.numpy(), rtol=1e-5
    )
    for k in range(k2):
        np.testing.assert_allclose(
            np.asarray(grads["params"][f"t{k}"]["q"]),
            priv[k].numpy(),
            rtol=1e-5,
        )


def test_graddrop_golden():
    """GradDrop (reference :884-972): per-coordinate keep-probability
    P = 0.5(1 + Σg/Σ|g|), sign-consistent mask vs a uniform draw, masked mean
    ×K. Conditioned on the same uniform draw (reproduced from the PRNG key).
    Private params accumulate the plain per-task backward sum."""
    key = jax.random.PRNGKey(11)
    u = np.asarray(jax.random.uniform(key, (P,), jnp.float32))

    # --- reference formula in numpy, given the same draw ----------------------
    g = J  # (K, P) per-task shared grads
    prob = 0.5 * (1.0 + g.sum(0) / (np.abs(g).sum(0) + 1e-8))
    mask = ((prob > u)[None, :] & (g > 0)) | ((prob < u)[None, :] & (g < 0))
    expect_shared = (g * mask).mean(0) * K

    params, loss_fn, partition = jax_setup()
    grads, _, _, _, _ = mtl_grads(
        make_method("graddrop", K, max_norm=0.0), loss_fn, params, partition,
        {}, key,
    )
    np.testing.assert_allclose(
        np.asarray(grads["params"]["shared"]["w"]), expect_shared, rtol=1e-5,
        atol=1e-7,
    )
    for k in range(K):  # private: Σ_k own grads accumulate (backward loop)
        np.testing.assert_allclose(
            np.asarray(grads["params"][f"t{k}"]["q"]), A[k], rtol=1e-5
        )


def test_loss_based_methods_ignore_clip():
    """The reference base backward() clips BEFORE loss.backward() — i.e.
    clipping has no effect for the loss-based methods (UW/RLW/DWA/FAMO/LS/
    IMTL-G); only the grad-writing surgery methods clip after. Regression
    guard on the `clips` flags."""
    for name in ["uw", "rlw", "dwa", "famo", "ls", "imtl", "scaleinvls", "stl"]:
        assert not make_method(name, K).clips, name
    for name in ["pcgrad", "graddrop", "cagrad", "fairgrad"]:
        assert make_method(name, K).clips, name


# ---------------------------------------------------------------------------
# VERDICT r3: NashMTL step sequence + the log_* variants (previously only
# smoke-covered by test_every_mtl_method_one_step)
# ---------------------------------------------------------------------------


def quad_setups():
    """Quadratic variant of the fake model: l_k = (J_k·w + a_k q_k + off_k +
    extra_k)².  Unlike the linear setup, the shared grads 2·base_k·J_k vary
    with `extra`, so a per-step extra sequence exercises gram-matrix CHANGE —
    needed to pin NashMTL's update_weights_every caching."""
    w = torch.zeros(P, requires_grad=True)
    qs = [torch.zeros((), requires_grad=True) for _ in range(K)]
    jj = torch.from_numpy(J)

    def t_losses(extra):
        return torch.stack(
            [
                (jj[k] @ w + float(A[k]) * qs[k] + float(OFF[k])
                 + float(extra[k])) ** 2
                for k in range(K)
            ]
        )

    def t_zero():
        for t in [w] + qs:
            t.grad = None

    params = {
        "params": {
            "shared": {"w": jnp.zeros((P,), jnp.float32)},
            "t0": {"q": jnp.zeros((), jnp.float32)},
            "t1": {"q": jnp.zeros((), jnp.float32)},
            "t2": {"q": jnp.zeros((), jnp.float32)},
        }
    }
    jjx, aa, off = jnp.asarray(J), jnp.asarray(A), jnp.asarray(OFF)

    def j_loss_fn(p, extra):
        ws = p["params"]["shared"]["w"]
        qsx = jnp.stack([p["params"][f"t{k}"]["q"] for k in range(K)])
        base = jjx @ ws + aa * qsx + off + extra
        return base**2, None

    partition = build_flat_partition(
        params, ["shared"], [["t0"], ["t1"], ["t2"]]
    )
    return (w, qs, t_losses, t_zero), (params, j_loss_fn, partition)


def test_nashmtl_golden_sequence():
    """NashMTL (reference :150-300): alpha solves (GGᵀ/||GGᵀ||)·α = 1/α — the
    cvxpy/ECOS sequence's own stop criterion (:177) — recomputed only every
    `update_weights_every` steps (:268-295), cached alpha reused in between
    while the gram matrix keeps changing. 4-step sequence against an in-test
    torch + scipy.fsolve oracle of the reference semantics (cvxpy is not
    installed here; fsolve solves the same first-order condition tighter
    than ECOS's 1e-3 stop)."""
    from scipy.optimize import fsolve

    every, n_steps = 2, 4
    extras = [
        0.6 * np.sin(np.arange(K, dtype=np.float32) * 0.9 + 1.3 * t) + 0.5
        for t in range(n_steps)
    ]

    # --- reference-style torch implementation --------------------------------
    (w, qs, t_losses, t_zero), (params, j_loss_fn, partition) = quad_setups()
    prvs_alpha = np.ones(K, np.float64)
    step = 0
    ref_gw, ref_gq, ref_alpha = [], [], []
    for t in range(n_steps):
        t_zero()
        ls = t_losses(extras[t])
        if step % every == 0:
            grads_t = [
                torch.autograd.grad(ls[k], w, retain_graph=True)[0]
                for k in range(K)
            ]
            G = torch.stack(grads_t)
            GTG = (G @ G.t()).detach().numpy().astype(np.float64)
            gtg_n = GTG / np.linalg.norm(GTG)
            prvs_alpha = fsolve(
                lambda a: gtg_n @ a - 1.0 / a, prvs_alpha, full_output=False
            )
        step += 1
        tw = torch.from_numpy(prvs_alpha.astype(np.float32))
        sum(ls[i] * tw[i] for i in range(K)).backward()
        ref_gw.append(w.grad.numpy().copy())
        ref_gq.append([q.grad.numpy().copy() for q in qs])
        ref_alpha.append(prvs_alpha.astype(np.float32).copy())

    # --- gaitpd state-threaded sequence --------------------------------------
    method = make_method("nashmtl", K, update_weights_every=every)
    state = method.init_state()
    for t in range(n_steps):
        grads, _, _, state, info = mtl_grads(
            method, j_loss_fn, params, partition, state,
            jax.random.PRNGKey(t), jnp.asarray(extras[t]),
        )
        np.testing.assert_allclose(
            np.asarray(info["weights"]), ref_alpha[t], rtol=2e-3,
            err_msg=f"step {t}",
        )
        np.testing.assert_allclose(
            np.asarray(grads["params"]["shared"]["w"]), ref_gw[t], rtol=2e-3,
            atol=1e-5, err_msg=f"step {t}",
        )
        for k in range(K):
            np.testing.assert_allclose(
                np.asarray(grads["params"][f"t{k}"]["q"]), ref_gq[t][k],
                rtol=2e-3, atol=1e-5, err_msg=f"step {t} q{k}",
            )
    # alpha was cached on odd steps (gram changed, weights did not)
    np.testing.assert_allclose(ref_alpha[0], ref_alpha[1])
    assert not np.allclose(ref_alpha[1], ref_alpha[2])


def test_log_mgda_golden():
    """LOG_MGDA (reference :430-512): min-norm solution over grads of
    log-losses; weighted loss Σ sol_k·log(l_k)/c with c = Σ sol_i/l_i
    (:510-511) — backward hits shared AND private params. Conditioned on the
    same min-norm solution (the solver itself is pinned against scipy in
    test_mtl.py)."""
    from gaitpd.learning.minnorm import min_norm_element

    w, qs, losses, zero = torch_setup()
    ls = losses()
    grads_t = [
        torch.autograd.grad((ls[k] + 1e-8).log(), w, retain_graph=True)[0]
        for k in range(K)
    ]
    G = torch.stack(grads_t)
    gram_log = (G @ G.t()).detach().numpy()
    sol = np.asarray(min_norm_element(jnp.asarray(gram_log)))
    c = sum(float(sol[i]) / (ls[i].detach() + 1e-8) for i in range(K))
    zero()
    sum((ls[i] + 1e-8).log() * float(sol[i]) / c for i in range(K)).backward()

    params, loss_fn, partition = jax_setup()
    grads, _, _, _, info = mtl_grads(
        make_method("log_mgda", K), loss_fn, params, partition, {},
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(info["weights"]), sol, rtol=1e-4)
    assert_grads_match(grads, w, qs, rtol=1e-4)


def test_log_cagrad_golden():
    """LOG_CAGrad (reference :975-1098): shared grads overwritten with the
    CAGrad combination of per-task LOG-loss grads, ×K (:1012,:1071), then
    clipped to max_norm=1 on the shared params only (:1096-1097). Private
    params keep the plain accumulation of the log-loss backwards — the
    reference's per-task .backward() loop only zeroes the SHARED grads
    (:1004-1010). Conditioned on the same QP weights (cagrad_weights is
    pinned against scipy SLSQP in test_mtl.py)."""
    from gaitpd.learning.minnorm import cagrad_weights

    alpha_c = 0.4
    w, qs, losses, zero = torch_setup()
    ls = losses()
    grads_t = [
        torch.autograd.grad(ls[k].log(), w, retain_graph=True)[0]
        for k in range(K)
    ]
    G = torch.stack(grads_t)  # (K, P) — reference stores (P, K); same math
    GG = (G @ G.t()).detach()
    g0_norm = float((GG.mean() + 1e-8).sqrt())
    c = alpha_c * g0_norm + 1e-8
    ww = torch.from_numpy(
        np.asarray(cagrad_weights(jnp.asarray(GG.numpy()), c))
    )
    gw = (G * ww[:, None]).sum(0)
    lmbda = c / (float(gw.norm()) + 1e-8)
    g = (G.mean(0) + lmbda * gw) / (1 + alpha_c**2)
    w.grad = (g * K).detach().clone()
    torch.nn.utils.clip_grad_norm_([w], 1.0)
    # private: accumulated backward of log-losses -> (1/l_k)·a_k
    zero_w = w.grad.numpy().copy()
    for k in range(K):
        qs[k].grad = (float(A[k]) / ls[k].detach()).clone()

    params, loss_fn, partition = jax_setup()
    grads, _, _, _, _ = mtl_grads(
        make_method("log_cagrad", K, c=alpha_c), loss_fn, params, partition,
        {}, jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(grads["params"]["shared"]["w"]), zero_w, rtol=1e-4,
        atol=1e-6,
    )
    for k in range(K):
        np.testing.assert_allclose(
            np.asarray(grads["params"][f"t{k}"]["q"]), qs[k].grad.numpy(),
            rtol=1e-4, atol=1e-6,
        )


def test_log_imtl_golden():
    """LOG_IMTLG (reference :1192-1266): the closed-form impartial alpha
    computed from LOG-loss grads; loss = Σ alpha_k·log(l_k + eps) applied to
    the whole graph (shared AND private)."""
    w, qs, losses, zero = torch_setup()
    ls = losses()
    grads_t, norm_t = [], []
    for k in range(K):
        (g,) = torch.autograd.grad((ls[k] + 1e-8).log(), w, retain_graph=True)
        grads_t.append(g)
        norm_t.append(g / torch.norm(g))
    G = torch.stack(grads_t)
    D = G[0] - G[1:]
    U = torch.stack(norm_t)
    U = U[0] - U[1:]
    alpha_ = (G[0] @ U.t()) @ torch.inverse(D @ U.t())
    alpha = torch.cat(((1 - alpha_.sum()).unsqueeze(-1), alpha_))
    zero()
    sum((ls[i] + 1e-8).log() * alpha.detach()[i] for i in range(K)).backward()

    params, loss_fn, partition = jax_setup()
    grads, _, _, _, info = mtl_grads(
        make_method("log_imtl", K), loss_fn, params, partition, {},
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(
        np.asarray(info["weights"]), alpha.detach().numpy(), rtol=1e-4
    )
    assert_grads_match(grads, w, qs, rtol=1e-4)
