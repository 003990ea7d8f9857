"""Fold/epoch training driver: on-device epoch scans, early stopping,
best-state snapshots, masked relaxed-input evaluation.

The reference's per-batch Python loop with per-batch host->device copies
(train/fbg_fog_train.py:170-263, weargait_train.py:300-352) becomes: the
whole fold's arrays live on device once; every epoch is ONE jitted lax.scan
over a (n_batches, B, K) gather-index matrix. Per-epoch host work is limited
to building the next index permutation and reading back a few scalars.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from gaitpd.data.sampler import batch_index_matrix
from gaitpd.learning.mtl import FlatPartition, build_flat_partition, make_method
from gaitpd.train.step import (
    StepSettings,
    TrainState,
    make_eval_step,
    make_train_step,
)


@dataclasses.dataclass
class DeviceFoldData:
    """One fold resident on device: per-stream arrays + index pools."""

    xs: Tuple[jnp.ndarray, ...]  # per stream: (N_k, T_k, C_k)
    ys: Tuple[jnp.ndarray, ...]  # per stream: (N_k,)
    train_pool: np.ndarray  # (N_tr, K) int32 rows of per-stream indices
    eval_pool: np.ndarray  # (N_ev, K)
    eval_xs: Optional[Tuple[jnp.ndarray, ...]] = None  # if eval arrays differ
    eval_ys: Optional[Tuple[jnp.ndarray, ...]] = None

    @property
    def exs(self):
        return self.eval_xs if self.eval_xs is not None else self.xs

    @property
    def eys(self):
        return self.eval_ys if self.eval_ys is not None else self.ys


def _gather_batch(xs, ys, idx, valid, head_inputs):
    """idx: (B, n_inputs) -> batch dict; head i's labels come from input
    head_inputs[i] (identity for the symmetric N-stream models; e.g. (0,)
    for sync fusion baselines whose single joint head carries the pose/shared
    label, reference fusion_train.py:235-237)."""
    return {
        "xs": tuple(xs[i][idx[:, i]] for i in range(len(xs))),
        "ys": tuple(ys[i][idx[:, i]] for i in head_inputs),
        "valid": valid,
    }


class EpochRunner:
    """Compiles and caches the train/eval epoch scans for one model config."""

    def __init__(
        self,
        apply_fn: Callable,
        tx,
        settings: StepSettings,
        mtl_method=None,
        partition: Optional[FlatPartition] = None,
        mesh=None,
        train_apply: Optional[Callable] = None,
        eval_apply: Optional[Callable] = None,
        head_inputs: Optional[Tuple[int, ...]] = None,
    ):
        from gaitpd.train.step import make_apply_adapters

        self.settings = settings
        self.tx = tx
        self.mesh = mesh
        if train_apply is None or eval_apply is None:
            ta, ea = make_apply_adapters(apply_fn, settings)
            train_apply = train_apply or ta
            eval_apply = eval_apply or ea
        head_inputs = tuple(head_inputs or range(settings.n_streams))
        self.head_inputs = head_inputs
        train_step = make_train_step(train_apply, tx, settings, mtl_method, partition)
        eval_step = make_eval_step(eval_apply, settings)
        k = settings.n_streams

        def shard(x):
            if mesh is None:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data")))

        def train_epoch(state, xs, ys, idx, valid, rngs, ctx):
            def body(carry, inp):
                idx_b, valid_b, rng_b = inp
                batch = _gather_batch(xs, ys, idx_b, valid_b, head_inputs)
                batch = {
                    "xs": tuple(shard(x) for x in batch["xs"]),
                    "ys": tuple(shard(y) for y in batch["ys"]),
                    "valid": shard(batch["valid"]),
                }
                new_state, metrics = train_step(carry, batch, rng_b, ctx)
                return new_state, metrics

            return jax.lax.scan(body, state, (idx, valid, rngs))

        def eval_epoch(params, xs, ys, idx, valid, rngs, ctx, epoch, mask):
            def body(_, inp):
                idx_b, valid_b, rng_b = inp
                batch = _gather_batch(xs, ys, idx_b, valid_b, head_inputs)
                out = eval_step(params, batch, ctx, rng_b, epoch, mask)
                return None, out

            _, outs = jax.lax.scan(body, None, (idx, valid, rngs))
            return outs

        # raw (un-jitted) epoch fns, reused by the vmapped-CV runner which
        # wraps them in jax.vmap over a leading fold axis (train/vmap_cv.py)
        self.train_epoch_fn = train_epoch
        self.eval_epoch_fn = eval_epoch
        self.train_epoch = jax.jit(train_epoch, donate_argnums=(0,))
        self.eval_epoch = jax.jit(eval_epoch)


@dataclasses.dataclass
class EpochResult:
    loss: np.ndarray  # (K,) mean per-stream loss over batches
    acc: np.ndarray  # (K,) accuracy
    acc_batchmean: np.ndarray  # (K,) mean of per-batch accs (weargait style)
    ens_acc: Optional[float] = None
    trues: Optional[List[np.ndarray]] = None
    preds: Optional[List[np.ndarray]] = None
    preds_ens: Optional[np.ndarray] = None
    logits: Optional[np.ndarray] = None


def run_train_epoch(
    runner: EpochRunner,
    state: TrainState,
    data: DeviceFoldData,
    order: np.ndarray,
    batch_size: int,
    rng: jax.Array,
    ctx,
) -> Tuple[TrainState, EpochResult]:
    idx_flat, valid_flat = batch_index_matrix(order, batch_size)
    n_batches = idx_flat.shape[0]
    idx = jnp.asarray(data.train_pool[idx_flat.reshape(-1)].reshape(n_batches, batch_size, -1))
    valid = jnp.asarray(valid_flat)
    rngs = jax.random.split(rng, n_batches)
    state, metrics = runner.train_epoch(
        state, data.xs, data.ys, idx, valid, rngs, ctx
    )
    res = _aggregate(metrics)
    return state, res


def _aggregate(metrics) -> "EpochResult":
    """Aggregate per-batch metrics, excluding fully-padded (n==0) batches
    introduced by power-of-two epoch quantization."""
    losses = np.asarray(metrics["losses"])  # (n_batches, K)
    correct = np.asarray(metrics["correct"])  # (n_batches, K)
    n = np.asarray(metrics["n"])  # (n_batches,)
    real = n > 0
    n_real = max(1, int(real.sum()))
    return EpochResult(
        loss=losses[real].sum(0) / n_real,
        acc=correct.sum(0) / max(1.0, n.sum()) * 100.0,
        acc_batchmean=(correct[real] / np.maximum(n[real, None], 1.0)).sum(0)
        / n_real * 100.0,
    )


def run_eval_epoch(
    runner: EpochRunner,
    state: TrainState,
    data: DeviceFoldData,
    batch_size: int,
    rng: jax.Array,
    ctx,
    mask: Optional[np.ndarray] = None,
    collect: bool = False,
) -> EpochResult:
    k = runner.settings.n_streams
    order = np.arange(len(data.eval_pool))
    idx_flat, valid_flat = batch_index_matrix(order, batch_size)
    n_batches = idx_flat.shape[0]
    idx = jnp.asarray(
        data.eval_pool[idx_flat.reshape(-1)].reshape(n_batches, batch_size, -1)
    )
    valid = jnp.asarray(valid_flat)
    rngs = jax.random.split(rng, n_batches)
    if mask is None:
        mask = np.ones(len(data.exs), bool)
    outs = runner.eval_epoch(
        state.params, data.exs, data.eys, idx, valid, rngs, ctx, state.epoch,
        jnp.asarray(mask),
    )
    n = np.asarray(outs["n"])
    ens_correct = np.asarray(outs["ens_correct"])
    res = _aggregate(outs)
    res.ens_acc = float(ens_correct.sum() / max(1.0, n.sum()) * 100.0)
    if collect:
        vmask = valid_flat.reshape(-1) > 0
        preds = np.asarray(outs["preds"])  # (n_batches, K, B)
        res.preds = [
            preds[:, i, :].reshape(-1)[vmask] for i in range(k)
        ]
        pool = data.eval_pool[idx_flat.reshape(-1)][vmask]
        res.trues = [
            np.asarray(data.eys[src])[pool[:, src]] for src in runner.head_inputs
        ]
        res.preds_ens = np.asarray(outs["pred_ens"]).reshape(-1)[vmask]
    return res


def init_train_state(
    model, tx, mtl_method, sample_xs: Sequence[jnp.ndarray], seed: int = 0
) -> Tuple[TrainState, Optional[FlatPartition]]:
    params = model.init(jax.random.PRNGKey(seed), *sample_xs)
    opt_state = tx.init(params)
    mtl_state = mtl_method.init_state() if mtl_method is not None else {}
    partition = None
    if mtl_method is not None:
        bound = model.bind(params)
        partition = build_flat_partition(
            params, bound.shared_modules, bound.task_modules
        )
    state = TrainState(
        params=params,
        opt_state=opt_state,
        mtl_state=mtl_state,
        epoch=jnp.zeros((), jnp.int32),
    )
    return state, partition


class EarlyStopper:
    """Best-metric tracking with patience (reference fbg_fog_train.py:297-361,
    weargait_train.py:567-610)."""

    def __init__(self, patience: int):
        self.patience = patience
        self.best = 0.0
        self.no_improve = 0
        self.best_payload = None

    def update(self, metric: float, payload=None) -> bool:
        """Returns True if improved; sets .stop when patience exhausted."""
        if metric > self.best:
            self.best = metric
            self.best_payload = payload
            self.no_improve = 0
            return True
        self.no_improve += 1
        return False

    @property
    def stop(self) -> bool:
        return self.no_improve >= self.patience
