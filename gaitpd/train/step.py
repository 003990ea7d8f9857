"""Jit-compiled train / eval steps for N-stream multitask models.

One step function covers every mode of the reference drivers:

* loss selection (ce / class_wt / ldam / gcl) is static config; the per-fold
  class statistics (margins, weights, DRW schedule) are *array operands* so
  folds and DRW epochs reuse one compiled step
  (vs. reference train/utilities.py:155-202 rebuilding torch loss modules);
* multitask weighting runs in-graph via gaitpd.learning.mtl (the reference's
  CAGrad does two-to-three full backwards + a scipy solve on the host per
  step, train/fbg_fog_train.py:146-152, weargait_train.py:187-248);
* the relaxed-input modality mask is a traced (K,) bool operand: zero-fill
  disabled streams and ensemble only enabled heads, so all 7 WearGait subsets
  (weargait_train.py:49-57,355-433) share one compiled eval.

Batches carry a ``valid`` mask so static-shape padded batches are exact.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gaitpd.learning import losses as L
from gaitpd.learning.mtl import FlatPartition, mtl_grads


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    mtl_state: Any
    epoch: jnp.ndarray  # scalar int32, drives the DRW schedule in-graph


@dataclasses.dataclass(frozen=True)
class StepSettings:
    """Static (trace-time) configuration of a step.

    n_streams counts OUTPUT heads; models may take a different number of
    inputs (e.g. the sync fusion baselines: 2 inputs -> 1 joint head,
    reference fusion_train.py:235-237). The head->input label mapping lives
    in the epoch runner (head_inputs).
    """

    n_streams: int
    wm: str = "gcl"  # ce | class_wt | ldam | gcl
    synchronized: bool = False
    ldam_s: float = 30.0
    gcl_m: float = 0.2
    gcl_s: float = 25.0
    noise_mul: float = 0.0
    drw_warmup: int = 0
    consistency_lambda: float = 0.0  # >0 adds symmetric-KL in sync gcl mode
    private_grads: str = "sum"  # see gaitpd.learning.mtl.mtl_grads
    loss_reduction: str = "mean"  # combined scalar: mean|sum of branch losses
    dropout: bool = False  # thread a dropout rng through train applies
    # relaxed-input TRAINING: zero-fill each input stream with this
    # probability per batch (at least one stream always stays on) — the
    # train-time counterpart of the masked eval (BASELINE.json config 4)
    modality_dropout: float = 0.0
    # rematerialisation policy for the forward pass inside the K cotangent
    # pullbacks: "none" stores forward intermediates in HBM and re-reads
    # them K times (one per per-task backward); "dots" (jax.checkpoint with
    # dots_saveable) keeps only matmul outputs; "nothing" (nothing_saveable)
    # recomputes the whole forward per pullback. The step is HBM-bound with
    # ~80x FLOP headroom (RESULTS.md cost-model analysis), so recompute is
    # nearly free — measured via scripts/bench_step.py --remat.
    remat: str = "none"  # none | dots | nothing
    # on-device train-time augmentation: one AugmentSpec (or None) per INPUT
    # stream (gaitpd/data/augment.py::augment_stream), applied inside the
    # epoch scan with per-step PRNG keys. Only the STRUCTURE is static;
    # strengths are ctx operands (make_loss_ctx aug_params), so sweeping
    # them never recompiles. The reference ships these transforms
    # (common.py:93-273) but no driver ever applies them — this stage is
    # the TPU-first wiring (VERDICT r4 item 5).
    augment: Optional[Tuple[Any, ...]] = None


def make_apply_adapters(apply_fn, settings: "StepSettings"):
    """Standard adapters: train_apply(vars, xs, rng, epoch) -> logits tuple,
    eval_apply(vars, xs, epoch) -> logits tuple."""
    if settings.dropout:
        def train_apply(v, xs, rng, epoch):
            return apply_fn(v, *xs, train=True, rngs={"dropout": rng})

        def eval_apply(v, xs, epoch):
            return apply_fn(v, *xs, train=False)

    else:
        def train_apply(v, xs, rng, epoch):
            return apply_fn(v, *xs)

        def eval_apply(v, xs, epoch):
            return apply_fn(v, *xs)

    return train_apply, eval_apply


def branch_loss(
    settings: StepSettings,
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    ctx: Dict[str, jnp.ndarray],
    rng: jax.Array,
    valid: Optional[jnp.ndarray],
) -> jnp.ndarray:
    """One modality's classification loss (reference
    train/fbg_fog_train.py:97-144, weargait_train.py:111-130)."""
    if settings.wm == "ce":
        return L.cross_entropy(logits, labels, None, valid)
    if settings.wm == "class_wt":
        return L.cross_entropy(logits, labels, ctx["cls_w"], valid)
    if settings.wm == "ldam":
        return L.ldam_loss(
            logits, labels, ctx["ldam_m"], s=settings.ldam_s, weight=ctx["cls_w"], valid=valid
        )
    if settings.wm == "gcl":
        # the m/s scalars default to the static settings but may be
        # OVERRIDDEN by per-instance ctx entries — that is what lets the
        # HP-vmap runner (train/hp_search.py) train a grid of gcl_m/gcl_s
        # values in one compiled program (the scalars become operands on
        # the stacked instance axis instead of trace-time constants)
        return L.gcl_loss(
            logits,
            labels,
            ctx["gcl_m"],
            rng,
            m=ctx.get("gcl_m_scale", settings.gcl_m),
            s=ctx.get("gcl_s_scale", settings.gcl_s),
            noise_mul=settings.noise_mul,
            weight=ctx["drw_w"],
            valid=valid,
        )
    raise ValueError(settings.wm)


def make_loss_ctx(
    settings: StepSettings,
    counts: Sequence[Sequence[int]],
    ldam_max_m: float = 0.5,
    aug_params: Optional[Sequence[Dict[str, Any]]] = None,
) -> Tuple[Dict[str, jnp.ndarray], ...]:
    """Per-stream loss-context arrays from training class counts.

    The DRW weight slot starts as ones; the step swaps in the inverse-
    frequency weights once state.epoch >= drw_warmup (in-graph analogue of
    reference train/utilities.py:197-202).

    aug_params: per-INPUT-stream dicts of traced augmentation strengths
    (gaitpd.data.augment.make_aug_params); they ride in ctx[0]["aug"] so
    strength sweeps reuse one compiled step."""
    out = []
    for c in counts:
        out.append(
            {
                "cls_w": L.inv_freq_weights(c),
                "ldam_m": L.ldam_margins(c, max_m=ldam_max_m),
                "gcl_m": L.gcl_margins(c),
                "drw_base": L.inv_freq_weights(c),
            }
        )
    if aug_params is not None:
        out[0]["aug"] = tuple(
            {k: jnp.asarray(v, jnp.float32) for k, v in p.items()}
            for p in aug_params
        )
    return tuple(out)


def _resolve_drw(settings: StepSettings, ctx, epoch):
    """Apply the DRW schedule: ones before warmup, inv-freq after."""
    resolved = []
    for c in ctx:
        use_w = epoch >= settings.drw_warmup
        drw = jnp.where(use_w, c["drw_base"], jnp.ones_like(c["drw_base"]))
        resolved.append({**c, "drw_w": drw})
    return tuple(resolved)


def make_multitask_loss_fn(
    train_apply: Callable, settings: StepSettings
) -> Callable:
    """loss_fn(params, xs, ys, valid, ctx, rng, epoch) -> ((K,) losses, logits).

    train_apply(variables, xs, rng, epoch) -> logits tuple (one per head)."""
    if settings.remat != "none":
        policy = {
            "dots": jax.checkpoint_policies.dots_saveable,
            "nothing": jax.checkpoint_policies.nothing_saveable,
        }[settings.remat]
        train_apply = jax.checkpoint(
            train_apply, policy=policy, static_argnums=()
        )

    def loss_fn(params, xs, ys, valid, ctx, rng, epoch):
        if settings.augment is not None:
            from gaitpd.data.augment import augment_stream

            k_aug = jax.random.fold_in(rng, 333)
            xs = tuple(
                augment_stream(
                    x, jax.random.fold_in(k_aug, i), spec, ctx[0]["aug"][i]
                )
                if spec is not None
                else x
                for i, (x, spec) in enumerate(zip(xs, settings.augment))
            )
        if settings.modality_dropout > 0:
            n_in = len(xs)
            k_drop, k_force = jax.random.split(jax.random.fold_in(rng, 555))
            keep = jax.random.bernoulli(
                k_drop, 1.0 - settings.modality_dropout, (n_in,)
            )
            forced = jax.nn.one_hot(
                jax.random.randint(k_force, (), 0, n_in), n_in, dtype=bool
            )
            keep = jnp.where(jnp.any(keep), keep, forced)
            xs = tuple(jnp.where(keep[i], x, jnp.zeros_like(x)) for i, x in enumerate(xs))
        logits = train_apply(params, xs, jax.random.fold_in(rng, 777), epoch)
        if not isinstance(logits, (tuple, list)):
            logits = (logits,)
        ctx_r = _resolve_drw(settings, ctx, epoch)
        rngs = jax.random.split(rng, settings.n_streams)
        ls = [
            branch_loss(settings, logits[k], ys[k], ctx_r[k], rngs[k], valid)
            for k in range(settings.n_streams)
        ]
        if (
            settings.synchronized
            and settings.consistency_lambda > 0
            and settings.n_streams == 2
            and settings.wm == "gcl"
        ):
            # symmetric-KL prediction consistency, added half to each branch
            # (reference train/fbg_fog_train.py:80-89,121-124)
            cons = L.symmetric_kl_consistency(logits[0], logits[1], valid)
            lam = settings.consistency_lambda
            ls = [l + 0.5 * lam * cons for l in ls]
        return jnp.stack(ls), tuple(logits)

    return loss_fn


def _batch_metrics(logits, ys, valid, losses):
    """Per-stream correct counts + batch sizes (reference accuracy
    accounting: fbg_fog_train.py:154-156, weargait_train.py:312-317)."""
    v = valid.astype(jnp.float32)
    n = jnp.sum(v)
    corr = [
        jnp.sum((jnp.argmax(lg, axis=-1) == y) * v) for lg, y in zip(logits, ys)
    ]
    return {
        "losses": losses,
        "correct": jnp.stack(corr),
        "n": n,
    }


def make_train_step(
    train_apply: Callable,
    tx,
    settings: StepSettings,
    mtl_method,
    partition: Optional[FlatPartition],
):
    """Build the jittable multitask train step.

    When ``mtl_method`` is None the combined scalar is the mean (or sum, per
    settings.loss_reduction) of the branch losses (reference non-CAGrad
    paths: fbg_fog_train.py:151, weargait_train.py:244-247, the baseline
    drivers' summed CE). Otherwise gradients come from
    gaitpd.learning.mtl.mtl_grads.
    """
    loss_fn = make_multitask_loss_fn(train_apply, settings)
    reduce = jnp.mean if settings.loss_reduction == "mean" else jnp.sum

    def train_step(state: TrainState, batch, rng, ctx):
        xs, ys, valid = batch["xs"], batch["ys"], batch["valid"]
        if mtl_method is None:
            def scalar_loss(params):
                ls, logits = loss_fn(params, xs, ys, valid, ctx, rng, state.epoch)
                return reduce(ls), (ls, logits)

            grads, (ls, logits) = jax.grad(scalar_loss, has_aux=True)(state.params)
            new_mtl_state = state.mtl_state
        else:
            grads, ls, logits, new_mtl_state, _info = mtl_grads(
                mtl_method,
                lambda p, *a: loss_fn(p, *a),
                state.params,
                partition,
                state.mtl_state,
                rng,
                xs,
                ys,
                valid,
                ctx,
                rng,
                state.epoch,
                private_grads=settings.private_grads,
            )
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # fully-padded batches (quantized epoch tails) must be exact no-ops:
        # weight decay/momentum would otherwise still move the parameters
        has_valid = jnp.sum(valid) > 0
        pick = lambda new, old: jax.tree_util.tree_map(  # noqa: E731
            lambda a, b: jnp.where(has_valid, a, b), new, old
        )
        metrics = _batch_metrics(logits, ys, valid, ls)
        return (
            state.replace(
                params=pick(new_params, state.params),
                opt_state=pick(new_opt_state, state.opt_state),
                mtl_state=pick(new_mtl_state, state.mtl_state),
            ),
            metrics,
        )

    return train_step


def make_eval_step(eval_apply: Callable, settings: StepSettings):
    """Masked relaxed-input eval step.

    mask: bool operand, one entry per model INPUT. Disabled streams are
    zero-filled before the forward pass (the model still runs all branches,
    shape-stable by design — reference weargait_train.py:355-382) and the
    corresponding heads are excluded from the softmax ensemble
    (weargait_train.py:397-415; when heads != inputs the leading K=n_streams
    mask entries select ensemble members).
    Returns logits, per-stream correct counts, ensemble correct count, n.
    """

    def eval_step(params, batch, ctx, rng, epoch, mask):
        xs = tuple(
            jnp.where(mask[k], x, jnp.zeros_like(x)) for k, x in enumerate(batch["xs"])
        )
        ys, valid = batch["ys"], batch["valid"]
        logits = eval_apply(params, xs, epoch)
        if not isinstance(logits, (tuple, list)):
            logits = (logits,)
        ctx_r = _resolve_drw(settings, ctx, epoch)
        rngs = jax.random.split(rng, settings.n_streams)
        ls = jnp.stack(
            [
                branch_loss(settings, logits[k], ys[k], ctx_r[k], rngs[k], valid)
                for k in range(settings.n_streams)
            ]
        )
        v = valid.astype(jnp.float32)
        corr = jnp.stack(
            [jnp.sum((jnp.argmax(lg, -1) == y) * v) for lg, y in zip(logits, ys)]
        )
        # masked softmax ensemble over enabled heads
        probs = jnp.stack([jax.nn.softmax(lg, axis=-1) for lg in logits])  # (K,B,C)
        mk = mask[: len(logits)].astype(probs.dtype)[:, None, None]
        p_ens = jnp.sum(probs * mk, 0) / jnp.maximum(jnp.sum(mk), 1.0)
        pred_ens = jnp.argmax(p_ens, -1)
        ens_correct = jnp.sum((pred_ens == ys[0]) * v)
        preds = jnp.stack([jnp.argmax(lg, -1) for lg in logits])
        return {
            "losses": ls,
            "correct": corr,
            "ens_correct": ens_correct,
            "n": jnp.sum(v),
            "preds": preds,
            "pred_ens": pred_ens,
            "logits": jnp.stack(logits),
        }

    return eval_step
