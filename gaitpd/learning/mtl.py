"""Multitask gradient-weighting library — all 17 reference methods, in-graph.

Re-design of train/learning/optimizers/multitask_weighting.py (1361 lines of
stateful torch + host scipy/cvxpy) as pure functions over a *per-task gradient
matrix*:

* The caller computes per-task gradients once (``jax.jacrev`` of the stacked
  (K,) loss vector — K cotangent passes of one VJP, the functional analogue of
  the reference's K ``backward(retain_graph=True)`` calls at
  multitask_weighting.py:680-688).
* Gradients are flattened to a (K, P) matrix J; shared / task-private
  parameters are flat boolean masks derived from module names
  (gaitpd.models.multitask.module_mask).
* Every method maps (losses, J_shared, state, rng) -> (combined shared flat
  gradient, private task weights, new state). The tiny simplex programs
  (CAGrad / MGDA / FairGrad / NashMTL) run as fixed-iteration lax loops
  (gaitpd.learning.minnorm) instead of per-step host scipy round-trips
  (multitask_weighting.py:717,830,196) — removing the reference's
  GPU->CPU sync from the inner loop entirely.

Effective update semantics are matched to what the reference *actually does*
(see each method's docstring), including the xK "overwrite" scaling
(multitask_weighting.py:749) and the fact that clip-to-max-norm only has
effect for the surgery methods that write grads before clipping
(CAGrad/FairGrad/GradDrop/PCGrad backward(), e.g. :761-776).

State (for FAMO / DWA / NashMTL / Uncertainty) is an explicit array pytree
threaded through the training scan, so a single jitted step covers the whole
run.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from gaitpd.learning.minnorm import (
    cagrad_weights,
    fairgrad_weights,
    min_norm_element,
    nashmtl_weights,
)

EPS = 1e-8


# ---------------------------------------------------------------------------
# Flat partition of the parameter vector
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class FlatPartition:
    """Flat views of the model's parameter partition.

    shared: (P,) bool — leaves belonging to shared modules
            (reference get_shared_parameters, feature_encoder.py:256-265).
    task_id: (P,) int32 — owning task index for private leaves, -1 for shared
            (reference {walkway,insole,imu}_parameters, weargait_encoders.py:159-183).
    """

    shared: jnp.ndarray
    task_id: jnp.ndarray
    n_tasks: int


def build_flat_partition(
    params, shared_modules: Sequence[str], task_modules: Sequence[Sequence[str]]
) -> FlatPartition:
    """Derive the flat partition from top-level module names of a flax
    variables dict ({'params': {module: ...}})."""
    from gaitpd.models.multitask import module_mask

    def flat_bool(names):
        tree = module_mask(params, names)
        mask_tree = jax.tree_util.tree_map(
            lambda leaf, m: jnp.full(jnp.shape(leaf), m, dtype=bool), params, tree
        )
        return ravel_pytree(mask_tree)[0]

    shared = flat_bool(shared_modules)
    task_id = jnp.full(shared.shape, -1, dtype=jnp.int32)
    for t, names in enumerate(task_modules):
        task_id = jnp.where(flat_bool(names), t, task_id)
    return FlatPartition(shared=shared, task_id=task_id, n_tasks=len(task_modules))


def per_task_grad_matrix(loss_fn: Callable, params, *args) -> Tuple[jnp.ndarray, Callable, jnp.ndarray, Any]:
    """Compute (J, unravel, losses, aux): J is the (K, P) per-task gradient
    matrix of loss_fn(params, *args) -> ((K,) losses, aux)."""
    flat0, unravel = ravel_pytree(params)

    def flat_loss(flat_params):
        # non-parameter operands are closed over: they are not differentiated
        return loss_fn(unravel(flat_params), *args)

    losses, jac, aux = jax.vjp(flat_loss, flat0, has_aux=True)
    k = losses.shape[0]
    eye = jnp.eye(k, dtype=losses.dtype)
    # K cotangent applications of ONE vjp (the reference instead re-runs
    # loss.backward(retain_graph=True) K times, multitask_weighting.py:680).
    # Measured on v5e: the unrolled loop beats a vmapped batched backward
    # (~7.4ms vs ~8.6ms per B=1024 step) — XLA overlaps the K passes well.
    rows = [jac(eye[i])[0] for i in range(k)]
    return jnp.stack(rows), unravel, losses, aux


def _clip_flat(g: jnp.ndarray, max_norm: float) -> jnp.ndarray:
    """torch.nn.utils.clip_grad_norm_ semantics on a flat vector."""
    norm = jnp.linalg.norm(g)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return g * scale


# ---------------------------------------------------------------------------
# Method implementations
# ---------------------------------------------------------------------------
#
# Each method is a small frozen dataclass with:
#   init_state() -> pytree of arrays
#   combine(losses, J_shared, gram, state, rng)
#       -> (shared_flat, private_weights (K,), new_state, info)
# ``J_shared`` is J with non-shared columns zeroed; ``gram`` its Gram matrix.


@dataclasses.dataclass(frozen=True)
class _Base:
    n_tasks: int
    max_norm: float = 1.0
    clips: bool = False  # whether clipping has effect (see module docstring)

    def init_state(self):
        return {}


@dataclasses.dataclass(frozen=True)
class LinearScalarization(_Base):
    """L = Σ w_k l_k (reference multitask_weighting.py:303-322)."""

    task_weights: Optional[Tuple[float, ...]] = None

    def combine(self, losses, j_shared, gram, state, rng):
        w = jnp.asarray(
            self.task_weights or (1.0,) * self.n_tasks, dtype=losses.dtype
        )
        return w @ j_shared, w, state, {"weights": w}


@dataclasses.dataclass(frozen=True)
class ScaleInvariantLS(_Base):
    """L = Σ w_k log l_k (reference :325-344)."""

    task_weights: Optional[Tuple[float, ...]] = None

    def combine(self, losses, j_shared, gram, state, rng):
        base = jnp.asarray(
            self.task_weights or (1.0,) * self.n_tasks, dtype=losses.dtype
        )
        w = base / jnp.maximum(losses, EPS)
        return w @ j_shared, w, state, {"weights": base}


@dataclasses.dataclass(frozen=True)
class STL(_Base):
    """Single-task learning (reference :515-528)."""

    main_task: int = 0

    def combine(self, losses, j_shared, gram, state, rng):
        w = jax.nn.one_hot(self.main_task, self.n_tasks, dtype=losses.dtype)
        return w @ j_shared, w, state, {"weights": w}


@dataclasses.dataclass(frozen=True)
class RLW(_Base):
    """Random loss weighting, w = softmax(N(0,1)) per step (reference :1101-1112)."""

    def combine(self, losses, j_shared, gram, state, rng):
        w = jax.nn.softmax(jax.random.normal(rng, (self.n_tasks,), losses.dtype))
        return w @ j_shared, w, state, {"weights": w}


@dataclasses.dataclass(frozen=True)
class Uncertainty(_Base):
    """Kendall-Gal uncertainty weighting (reference :531-553). L = Σ 0.5
    (exp(-s_k) l_k + s_k); the log-sigmas are state updated with an internal
    SGD step. The reference exposes them via .parameters() but its drivers
    never add them to an optimizer, so they stay frozen — the default lr=0
    reproduces that; pass lr>0 to opt in to adaptive log-sigmas."""

    lr: float = 0.0

    def init_state(self):
        return {"logsigma": jnp.zeros((self.n_tasks,), jnp.float32)}

    def combine(self, losses, j_shared, gram, state, rng):
        logs = state["logsigma"]
        w = 0.5 * jnp.exp(-logs)
        # d/d s_k [0.5(exp(-s) l + s)] = 0.5 (1 - exp(-s) l)
        gs = 0.5 * (1.0 - jnp.exp(-logs) * jax.lax.stop_gradient(losses))
        new_state = {"logsigma": logs - self.lr * gs}
        return w @ j_shared, w, new_state, {"weights": jnp.exp(-logs)}


@dataclasses.dataclass(frozen=True)
class DynamicWeightAverage(_Base):
    """DWA (reference :1269-1315): weights from the ratio of recent to older
    window-averaged losses; final loss is (w*l).mean() -> effective per-task
    weight w_k / K."""

    iteration_window: int = 25
    temp: float = 2.0

    def init_state(self):
        return {
            "costs": jnp.ones((2 * self.iteration_window, self.n_tasks), jnp.float32),
            "iter": jnp.zeros((), jnp.int32),
        }

    def combine(self, losses, j_shared, gram, state, rng):
        costs = jnp.concatenate(
            [state["costs"][1:], jax.lax.stop_gradient(losses)[None, :]], axis=0
        )
        it = state["iter"] + 1
        win = self.iteration_window
        ws = costs[win:].mean(0) / jnp.maximum(costs[:win].mean(0), EPS)
        ez = jnp.exp(ws / self.temp)
        w_new = self.n_tasks * ez / jnp.sum(ez)
        w = jnp.where(state["iter"] > win, w_new, jnp.ones_like(w_new))
        w_eff = w / self.n_tasks  # .mean() reduction
        return (
            w_eff @ j_shared,
            w_eff,
            {"costs": costs, "iter": it},
            {"weights": w},
        )


@dataclasses.dataclass(frozen=True)
class FAMO(_Base):
    """Fast adaptive multitask optimisation (reference :109-147). The logits
    w are adapted from step-to-step loss deltas with an internal Adam,
    folding the reference's separate ``update(curr_loss)`` call into the next
    step's state transition."""

    gamma: float = 1e-5
    w_lr: float = 0.025

    def init_state(self):
        # distinct arrays per leaf: aliased leaves break buffer donation in
        # the jitted train step (same buffer donated twice)
        def z():
            return jnp.zeros((self.n_tasks,), jnp.float32)

        return {
            "w": z(),
            "m": z(),
            "v": z(),
            "t": jnp.zeros((), jnp.int32),
            "prev_loss": z(),
            "has_prev": jnp.zeros((), jnp.bool_),
            "min_losses": z(),
        }

    def combine(self, losses, j_shared, gram, state, rng):
        ldet = jax.lax.stop_gradient(losses)
        w_logits = state["w"]

        # --- deferred update from the previous step's losses ---------------
        def adam_update(s):
            z = jax.nn.softmax(s["w"])
            delta = jnp.log(s["prev_loss"] - s["min_losses"] + EPS) - jnp.log(
                ldet - s["min_losses"] + EPS
            )
            d = z * (delta - jnp.dot(z, delta))  # J_softmax^T delta
            # torch.optim.Adam(weight_decay=gamma) couples the decay into the
            # gradient BEFORE the moment updates (not AdamW-style), and the
            # reference constructs exactly that optimizer (:127).
            d = d + self.gamma * s["w"]
            t = s["t"] + 1
            m = 0.9 * s["m"] + 0.1 * d
            v = 0.999 * s["v"] + 0.001 * d * d
            mhat = m / (1 - 0.9 ** t.astype(jnp.float32))
            vhat = v / (1 - 0.999 ** t.astype(jnp.float32))
            w = s["w"] - self.w_lr * mhat / (jnp.sqrt(vhat) + EPS)
            return w, m, v, t

        w_upd, m, v, t = adam_update(state)
        w_logits = jnp.where(state["has_prev"], w_upd, w_logits)
        m = jnp.where(state["has_prev"], m, state["m"])
        v = jnp.where(state["has_prev"], v, state["v"])
        t = jnp.where(state["has_prev"], t, state["t"])

        # --- weighted loss gradient: L = 3 Σ log(D_k) z_k / c --------------
        z = jax.nn.softmax(w_logits)
        d_gap = ldet - state["min_losses"] + EPS
        c = jnp.sum(z / d_gap)
        w_eff = 3.0 * z / (c * d_gap)
        new_state = {
            "w": w_logits,
            "m": m,
            "v": v,
            "t": t,
            "prev_loss": ldet,
            "has_prev": jnp.ones((), jnp.bool_),
            "min_losses": state["min_losses"],
        }
        return w_eff @ j_shared, w_eff, new_state, {"weights": z}


@dataclasses.dataclass(frozen=True)
class MGDA(_Base):
    """Min-norm-element weighting (reference :347-427); the solution is scaled
    by K (:424) and applied to shared + private alike via the weighted loss."""

    log_space: bool = False

    def combine(self, losses, j_shared, gram, state, rng):
        inv_l = 1.0 / jnp.maximum(losses, EPS)
        if self.log_space:
            # grads of log losses: scale rows (and the Gram bilinearly)
            j_shared = j_shared * inv_l[:, None]
            gram = gram * inv_l[:, None] * inv_l[None, :]
        sol = min_norm_element(gram)
        if self.log_space:
            # reference LOG_MGDA (:506-511): L = Σ sol_k log(l_k) / c with
            # c = Σ sol_i / l_i  -> per-(log-)task weight sol_k / c.
            c = jnp.maximum(jnp.sum(sol * inv_l), EPS)
            w_log = sol / c
            # private weights act on raw-loss grads: sol_k / (c l_k)
            return w_log @ j_shared, w_log * inv_l, state, {"weights": sol}
        w_eff = sol * self.n_tasks  # reference MGDA scales sol by K (:424)
        return w_eff @ j_shared, w_eff, state, {"weights": sol}


@dataclasses.dataclass(frozen=True)
class IMTLG(_Base):
    """Impartial MTL, closed-form alpha (reference :1115-1189)."""

    log_space: bool = False

    def combine(self, losses, j_shared, gram, state, rng):
        scale = (
            1.0 / jnp.maximum(losses, EPS)
            if self.log_space
            else jnp.ones_like(losses)
        )
        g = j_shared * scale[:, None]
        norms = jnp.linalg.norm(g, axis=1, keepdims=True)
        u = g / jnp.maximum(norms, EPS)
        d = g[0] - g[1:]
        ut = u[0] - u[1:]
        first = (g[0] @ ut.T)  # (K-1,)
        mat = d @ ut.T  # (K-1, K-1)
        inv = jnp.linalg.inv(mat + EPS * jnp.eye(mat.shape[0], dtype=mat.dtype))
        alpha_rest = first @ inv
        alpha = jnp.concatenate([(1.0 - alpha_rest.sum())[None], alpha_rest])
        w_eff = alpha * scale
        return w_eff @ j_shared, w_eff, state, {"weights": alpha}


@dataclasses.dataclass(frozen=True)
class NashMTL(_Base):
    """Nash bargaining weights (reference :150-300); α solves G α = 1/α on the
    normalised Gram matrix, recomputed every ``update_weights_every`` steps."""

    update_weights_every: int = 1

    def init_state(self):
        return {
            "prev_alpha": jnp.ones((self.n_tasks,), jnp.float32),
            "step": jnp.zeros((), jnp.int32),
        }

    def combine(self, losses, j_shared, gram, state, rng):
        norm_factor = jnp.maximum(jnp.linalg.norm(gram), EPS)
        alpha_new = nashmtl_weights(gram / norm_factor)
        recompute = (state["step"] % self.update_weights_every) == 0
        alpha = jnp.where(recompute, alpha_new, state["prev_alpha"])
        new_state = {"prev_alpha": alpha, "step": state["step"] + 1}
        return alpha @ j_shared, alpha, new_state, {"weights": alpha}


@dataclasses.dataclass(frozen=True)
class CAGrad(_Base):
    """Conflict-averse gradient descent — the method the reference drivers
    actually train with (fbg_fog_train.py:289, weargait_train.py:151).

    reference multitask_weighting.py:653-776: per-task grads -> dual weights w
    on the simplex -> g = ḡ + (c·||ḡ||_G / ||g_w||)·g_w, rescaled by
    1/(1+α²), written back scaled by K, then clipped to max_norm. Private
    parameters keep the plain per-task gradient accumulation (:680-688).
    """

    c: float = 0.4
    clips: bool = True
    log_space: bool = False  # LOG_CAGrad (reference :975-1098)

    def combine(self, losses, j_shared, gram, state, rng):
        # c defaults to the static dataclass field but may ride in mtl_state
        # (a per-instance operand) — that is what lets the HP-vmap runner
        # (train/hp_search.py) sweep the CAGrad strength in one program
        c = state.get("cagrad_c", self.c) if isinstance(state, dict) else self.c
        if self.log_space:
            inv_l = 1.0 / jnp.maximum(losses, EPS)
            j_shared = j_shared * inv_l[:, None]
            gram = gram * inv_l[:, None] * inv_l[None, :]
        g0_norm = jnp.sqrt(gram.mean() + EPS)
        c_coef = c * g0_norm + EPS
        w = cagrad_weights(gram, c_coef)
        gw = w @ j_shared
        gw_norm = jnp.sqrt(w @ gram @ w + EPS)
        lmbda = c_coef / (gw_norm + EPS)
        g = j_shared.mean(0) + lmbda * gw
        g = g / (1.0 + c**2)
        shared_flat = g * self.n_tasks
        # private params: plain accumulation of per-task grads (of the raw or
        # log losses respectively)
        w_priv = (
            1.0 / jnp.maximum(losses, EPS)
            if self.log_space
            else jnp.ones((self.n_tasks,), losses.dtype)
        )
        return shared_flat, w_priv, state, {"weights": w, "GTG": gram}


@dataclasses.dataclass(frozen=True)
class FairGrad(_Base):
    """α-fair gradient weights from G w = w^{-1/α} (reference :779-881)."""

    alpha: float = 1.0
    clips: bool = True

    def combine(self, losses, j_shared, gram, state, rng):
        w = fairgrad_weights(gram, jnp.asarray(self.alpha, losses.dtype))
        shared_flat = (w @ j_shared) * self.n_tasks
        w_priv = jnp.ones((self.n_tasks,), losses.dtype)
        return shared_flat, w_priv, state, {"weights": w, "GTG": gram}


@dataclasses.dataclass(frozen=True)
class PCGrad(_Base):
    """Project conflicting gradients pairwise (reference :556-650). Task order
    for the projections is randomly shuffled per step (:613); private params
    get the plain sum (losses.sum() autograd, :601-608)."""

    reduction: str = "sum"
    clips: bool = True

    def combine(self, losses, j_shared, gram, state, rng):
        k = self.n_tasks
        perm = jax.random.permutation(rng, k)

        def project_one(gi):
            def body(carry, j):
                gi = carry
                gj = j_shared[perm[j]]
                dot = gi @ gj
                denom = jnp.maximum(gj @ gj, EPS)
                gi = jnp.where(dot < 0, gi - dot / denom * gj, gi)
                return gi, None

            gi, _ = jax.lax.scan(body, gi, jnp.arange(k))
            return gi

        pc = jax.vmap(project_one)(j_shared)
        merged = pc.sum(0)
        if self.reduction == "mean":
            merged = merged / k
        w_priv = jnp.ones((k,), losses.dtype)
        return merged, w_priv, state, {}


@dataclasses.dataclass(frozen=True)
class GradDrop(_Base):
    """Sign-based stochastic gradient masking (reference :884-972)."""

    clips: bool = True

    def combine(self, losses, j_shared, gram, state, rng):
        p = 0.5 * (1.0 + j_shared.sum(0) / (jnp.abs(j_shared).sum(0) + EPS))
        u = jax.random.uniform(rng, p.shape, p.dtype)
        mask = ((p > u)[None, :] & (j_shared > 0)) | ((p < u)[None, :] & (j_shared < 0))
        g = (j_shared * mask).mean(0) * self.n_tasks
        w_priv = jnp.ones((self.n_tasks,), losses.dtype)
        return g, w_priv, state, {}


METHODS: Dict[str, Any] = {
    "stl": STL,
    "ls": LinearScalarization,
    "uw": Uncertainty,
    "scaleinvls": ScaleInvariantLS,
    "rlw": RLW,
    "dwa": DynamicWeightAverage,
    "pcgrad": PCGrad,
    "mgda": MGDA,
    "graddrop": GradDrop,
    "log_mgda": lambda **kw: MGDA(log_space=True, **kw),
    "cagrad": CAGrad,
    "log_cagrad": lambda **kw: CAGrad(log_space=True, **kw),
    "imtl": IMTLG,
    "log_imtl": lambda **kw: IMTLG(log_space=True, **kw),
    "nashmtl": NashMTL,
    "famo": FAMO,
    "fairgrad": FairGrad,
}


def make_method(name: str, n_tasks: int, **kwargs):
    """Facade mirroring reference WeightMethods (:1318-1339)."""
    if name not in METHODS:
        raise ValueError(f"unknown method {name}.")
    return METHODS[name](n_tasks=n_tasks, **kwargs)


# ---------------------------------------------------------------------------
# Top-level entry: losses -> final gradient pytree
# ---------------------------------------------------------------------------


def mtl_grads(
    method,
    loss_fn: Callable,
    params,
    partition: FlatPartition,
    state,
    rng: jax.Array,
    *args,
    private_grads: str = "sum",
):
    """Compute the final gradient pytree for one step of multitask training.

    loss_fn(params, *args) -> ((K,) losses, aux).

    private_grads:
      "sum"          — private leaves get Σ_k w_priv_k g_k (fbg driver
                       semantics, multitask_weighting.py:680-688);
      "sum_plus_own" — additionally adds each stream's own-task gradient once
                       more (weargait step_cagrad_three semantics,
                       weargait_train.py:217-242, where autograd.grad adds on
                       top of the grads CAGrad's backward loop already left).
    Returns (grads_pytree, losses, aux, new_state, info).
    """
    jmat, unravel, losses, aux = per_task_grad_matrix(loss_fn, params, *args)
    shared = partition.shared
    j_shared = jnp.where(shared[None, :], jmat, 0.0)
    gram = j_shared @ j_shared.T

    shared_flat, w_priv, new_state, info = method.combine(
        losses, j_shared, gram, state, rng
    )
    if method.clips and method.max_norm > 0:
        shared_flat = _clip_flat(shared_flat, method.max_norm)

    priv_flat = w_priv @ jmat
    if private_grads == "sum_plus_own":
        own = jnp.zeros_like(priv_flat)
        for t in range(partition.n_tasks):
            own = own + jnp.where(partition.task_id == t, jmat[t], 0.0)
        priv_flat = priv_flat + own

    final_flat = jnp.where(shared, shared_flat, priv_flat)
    return unravel(final_flat), losses, aux, new_state, info
