"""Vmapped cross-validation: train ALL folds simultaneously on one chip.

TPU-native redesign of the reference's sequential fold loop
(train/weargait_train.py:533-645): the K-fold models are tiny (1e4-1e5
params) and the folds are independent, so the fold index becomes a leading
batch axis — one `jax.vmap` of the epoch scan trains every fold's model in a
single compiled program. This

* removes the per-fold retrace/compile (the dominant cost of sequential CV
  under this container's minutes-long remote TPU compiles),
* keeps the chip busy (a single fold's B=64 step leaves the VPU/MXU mostly
  idle; F folds stack into an effective F*B batch), and
* maps onto multi-chip naturally: with a mesh, the FOLD axis is sharded over
  the `data` axis (embarrassingly parallel — no cross-fold collectives), so
  an 8-chip slice trains 8 folds at once.

Fold datasets differ in size; arrays are zero-padded to the max fold size
and index pools stay fold-local, so padded rows are never gathered. Batch
counts are padded to the max across folds with fully-invalid batches, which
the step treats as exact no-ops (the same mechanism as the power-of-two
epoch quantization in gaitpd.data.sampler.batch_index_matrix).

RNG streams are IDENTICAL to the sequential driver's per-fold streams
whenever the folds' batch counts agree (the per-fold key chains are built
the same way), so vmapped CV reproduces sequential CV numerically — tested
in tests/test_vmap_cv.py.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaitpd.data import weargait as WG
from gaitpd.data.sampler import batch_index_matrix
from gaitpd.train.loop import DeviceFoldData, EarlyStopper, EpochRunner
from gaitpd.train.step import TrainState


# ---------------------------------------------------------------------------
# Stacking fold data
# ---------------------------------------------------------------------------


def _pad_stack(arrays: List[np.ndarray]) -> jnp.ndarray:
    """Zero-pad a list of (N_f, ...) arrays on axis 0 to max N and stack to
    (F, N_max, ...)."""
    n_max = max(a.shape[0] for a in arrays)
    out = np.zeros((len(arrays), n_max) + arrays[0].shape[1:], arrays[0].dtype)
    for f, a in enumerate(arrays):
        out[f, : a.shape[0]] = a
    return jnp.asarray(out)


@dataclasses.dataclass
class StackedFoldData:
    """All folds resident on device with a leading fold axis."""

    xs: Tuple[jnp.ndarray, ...]  # per stream: (F, N_max, T, C)
    ys: Tuple[jnp.ndarray, ...]
    eval_xs: Tuple[jnp.ndarray, ...]
    eval_ys: Tuple[jnp.ndarray, ...]
    train_pools: List[np.ndarray]  # per fold (host): (N_tr_f, K)
    eval_pools: List[np.ndarray]

    @property
    def n_folds(self) -> int:
        return len(self.train_pools)


def stack_folds(datas: List[DeviceFoldData]) -> StackedFoldData:
    k = len(datas[0].xs)
    return StackedFoldData(
        xs=tuple(_pad_stack([np.asarray(d.xs[i]) for d in datas]) for i in range(k)),
        ys=tuple(_pad_stack([np.asarray(d.ys[i]) for d in datas]) for i in range(k)),
        eval_xs=tuple(
            _pad_stack([np.asarray(d.exs[i]) for d in datas]) for i in range(k)
        ),
        eval_ys=tuple(
            _pad_stack([np.asarray(d.eys[i]) for d in datas]) for i in range(k)
        ),
        train_pools=[d.train_pool for d in datas],
        eval_pools=[d.eval_pool for d in datas],
    )


def stack_index_batches(
    pools: List[np.ndarray], orders: List[np.ndarray], batch_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-fold sample orders -> stacked (F, n_b_max, B, K) gather indices +
    (F, n_b_max, B) validity; shorter folds padded with no-op batches."""
    idxs, valids = [], []
    for pool, order in zip(pools, orders):
        idx_flat, valid_flat = batch_index_matrix(order, batch_size)
        nb, b = idx_flat.shape
        idxs.append(pool[idx_flat.reshape(-1)].reshape(nb, b, -1))
        valids.append(valid_flat)
    nb_max = max(i.shape[0] for i in idxs)
    f = len(idxs)
    b = idxs[0].shape[1]
    k = idxs[0].shape[2]
    idx = np.zeros((f, nb_max, b, k), np.int32)
    valid = np.zeros((f, nb_max, b), np.float32)
    for i, (ix, va) in enumerate(zip(idxs, valids)):
        idx[i, : ix.shape[0]] = ix
        valid[i, : va.shape[0]] = va
    return jnp.asarray(idx), jnp.asarray(valid)


def stack_epoch_rngs(keys: List[jax.Array], n_batches: int) -> jax.Array:
    """Per-fold epoch keys -> (F, n_b, key) batch keys, matching the
    sequential driver's jax.random.split(key, n_batches) per fold."""
    return jnp.stack([jax.random.split(k, n_batches) for k in keys])


# ---------------------------------------------------------------------------
# Vmapped runner
# ---------------------------------------------------------------------------


class VmapEpochRunner:
    """jax.vmap of EpochRunner's epoch scans over a leading fold axis.

    With a mesh, the vmapped scans are additionally shard_map-ped so each
    device runs ONLY its local folds (fold-parallel CV, zero cross-device
    collectives). Plain vmap + sharding constraints would not work here:
    vmap over per-fold conv kernels lowers to feature_group_count=F grouped
    convolutions, which the SPMD partitioner refuses to split on the fold
    axis; shard_map sidesteps that because each shard traces with its local
    fold count."""

    def __init__(self, runner: EpochRunner, mesh=None):
        self.runner = runner
        self.mesh = mesh
        vm_train = jax.vmap(runner.train_epoch_fn)
        # mask is shared across folds (in_axes None); epoch is a shared scalar
        vm_eval = jax.vmap(
            runner.eval_epoch_fn, in_axes=(0, 0, 0, 0, 0, 0, 0, None, None)
        )
        if mesh is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            fold = P("data")
            vm_train = shard_map(
                vm_train, mesh=mesh,
                in_specs=(fold,) * 7, out_specs=fold, check_rep=False,
            )
            vm_eval = shard_map(
                vm_eval, mesh=mesh,
                in_specs=(fold,) * 7 + (P(), P()), out_specs=fold,
                check_rep=False,
            )
        self.train_epoch = jax.jit(vm_train, donate_argnums=(0,))
        self.eval_epoch = jax.jit(vm_eval)

    def shard_folds(self, tree):
        """Shard the leading fold axis over the mesh's data axis (fold-
        parallel CV); replicate when the fold count doesn't divide."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = self.mesh.devices.size

        def put(x):
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n_dev == 0:
                return jax.device_put(x, NamedSharding(self.mesh, P("data")))
            return jax.device_put(x, NamedSharding(self.mesh, P()))

        return jax.tree_util.tree_map(put, tree)


def init_stacked_state(model, tx, mtl_method, sample_xs, seeds: List[int]):
    """Per-fold init (vmapped over seeds) -> TrainState with leading F axis.
    The sequential driver inits every fold from the same seed
    (weargait_driver.run_fold uses args.seed), so passing identical seeds
    reproduces it exactly."""
    from gaitpd.learning.mtl import build_flat_partition

    def one(seed):
        params = model.init(jax.random.PRNGKey(seed), *sample_xs)
        return TrainState(
            params=params,
            opt_state=tx.init(params),
            mtl_state=mtl_method.init_state() if mtl_method is not None else {},
            epoch=jnp.zeros((), jnp.int32),
        )

    states = jax.vmap(lambda s: one(s))(jnp.asarray(seeds))
    partition = None
    if mtl_method is not None:
        params0 = model.init(jax.random.PRNGKey(int(seeds[0])), *sample_xs)
        bound = model.bind(params0)
        partition = build_flat_partition(
            params0, bound.shared_modules, bound.task_modules
        )
    return states, partition


def stack_ctx(ctxs: List[Tuple[Dict[str, jnp.ndarray], ...]]):
    """Per-fold loss contexts -> leading F axis on every leaf."""
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *ctxs)


def aggregate_folds(metrics) -> Dict[str, np.ndarray]:
    """Vectorized gaitpd.train.loop._aggregate over the leading fold axis.
    metrics leaves: losses (F, n_b, K), correct (F, n_b, K), n (F, n_b)."""
    losses = np.asarray(metrics["losses"])
    correct = np.asarray(metrics["correct"])
    n = np.asarray(metrics["n"])
    real = n > 0  # (F, n_b)
    n_real = np.maximum(1, real.sum(axis=1))  # (F,)
    loss = (losses * real[..., None]).sum(1) / n_real[:, None]
    acc = correct.sum(1) / np.maximum(1.0, n.sum(1))[:, None] * 100.0
    per_batch_acc = correct / np.maximum(n[..., None], 1.0)
    acc_bm = (per_batch_acc * real[..., None]).sum(1) / n_real[:, None] * 100.0
    out = {"loss": loss, "acc": acc, "acc_batchmean": acc_bm}
    if "ens_correct" in metrics:
        ens = np.asarray(metrics["ens_correct"])
        out["ens_acc"] = ens.sum(1) / np.maximum(1.0, n.sum(1)) * 100.0
    return out


# ---------------------------------------------------------------------------
# The WearGait vmapped CV driver
# ---------------------------------------------------------------------------


def run_cv_vmapped(args):
    """Drop-in replacement for weargait_driver.run_cv that trains all folds
    at once. Same summary dict; per-fold RNG streams match the sequential
    driver whenever fold batch counts agree. Checkpoint/resume persists ONE
    stacked snapshot covering every fold (--ckpt_dir/--resume). Covers the
    flagship 3-stream model and every --baseline (fusion family,
    deepav_lite, focal, taca via _baseline_adapters)."""
    from gaitpd.learning.mtl import make_method
    from gaitpd.train.cv import build_subj2label, make_fixed_balanced_folds_no_overlap
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_loss_ctx
    from gaitpd.train.weargait_driver import (
        MASK_COMBOS,
        _baseline_adapters,
        build_model,
        flagship_apply,
        get_streams,
        split_to_device,
        weargait_aug_config,
    )

    if args.single_mod is not None:
        return _weargait_single_mod_vmapped(args)

    async_mode = args.async_loading
    sync_flag = not async_mode

    streams, pd_ids, hc_ids = get_streams(args)
    subj2label = build_subj2label(pd_ids, hc_ids)
    folds = make_fixed_balanced_folds_no_overlap(
        pd_ids, hc_ids, n_folds=args.n_folds, per_class=args.test_per_class,
        seed=args.seed,
    )
    if args.n_folds_cap:
        folds = folds[: args.n_folds_cap]
    f = len(folds)

    splits = [
        WG.prepare_split(streams, tr, te, subj2label, win=args.win_len,
                         hop=args.hop_len)
        for tr, te in folds
    ]
    datas = [split_to_device(s, async_mode, args.seed) for s in splits]
    stacked = stack_folds(datas)

    aug_specs, aug_params = weargait_aug_config(args)
    settings = StepSettings(
        n_streams=3, wm=args.wm, synchronized=sync_flag, gcl_m=args.gcl_m,
        gcl_s=args.gcl_s, noise_mul=args.noise_mul, drw_warmup=args.drw_warmup,
        consistency_lambda=0.0, private_grads="sum_plus_own",
        modality_dropout=args.modality_dropout,
        augment=aug_specs,
    )
    ctxs = []
    for d in datas:
        counts = [
            np.bincount(np.asarray(d.ys[k])[d.train_pool[:, k]],
                        minlength=args.num_classes)
            for k in range(3)
        ]
        ctxs.append(make_loss_ctx(settings, counts, aug_params=aug_params))
    ctx = stack_ctx(ctxs)

    model = build_model(args, sync_flag)
    tx = sgd_torch(args.lr, 0.9, 1e-4)
    # CAGrad only for the flagship model (reference weargait_train.py:146-152)
    use_cagrad = args.baseline is None and args.alpha > 0
    mtl = None
    if use_cagrad:
        kwargs = (
            {"c": args.alpha}
            if args.mtl_method in ("cagrad", "log_cagrad")
            else {}
        )
        mtl = make_method(args.mtl_method, 3, **kwargs)
    if args.baseline in ("deepav_lite", "taca"):
        import dataclasses as _dc

        settings = _dc.replace(settings, dropout=True)
    train_apply, eval_apply, sample_tf = _baseline_adapters(model, args)

    sample_xs = sample_tf(tuple(np.asarray(x[0, :2]) for x in stacked.xs))
    states, partition = init_stacked_state(
        model, tx, mtl, sample_xs, [args.seed] * f
    )
    mesh = args.mesh
    if mesh is not None and f % mesh.devices.size != 0:
        print(
            f"[vmap-cv] {f} folds not divisible by {mesh.devices.size} "
            "devices; running single-device"
        )
        mesh = None
    runner = EpochRunner(
        flagship_apply(model, args), tx, settings, mtl, partition,
        train_apply=train_apply, eval_apply=eval_apply,
    )
    vrunner = VmapEpochRunner(runner, mesh=mesh)
    states = vrunner.shard_folds(states)
    stacked_dev = vrunner.shard_folds(
        {"xs": stacked.xs, "ys": stacked.ys, "exs": stacked.eval_xs,
         "eys": stacked.eval_ys}
    )

    # per-fold host/device RNG streams, matching the sequential driver
    host_rngs = [np.random.default_rng(args.seed + 1000 * fi) for fi in
                 range(1, f + 1)]
    keys = [jax.random.PRNGKey(args.seed + fi) for fi in range(1, f + 1)]
    stoppers = [EarlyStopper(patience=args.patience) for _ in range(f)]
    best_params_host = jax.device_get(states.params)
    best_per_mod = np.zeros((f, 3))

    start_epoch = 1
    if args.ckpt_dir and args.resume:
        restored = restore_vmap_checkpoint(
            args.ckpt_dir, states,
            {"best_params": best_params_host, "best_per_mod": best_per_mod},
        )
        if restored is not None:
            st_host, extras, meta = restored
            best_params_host = extras["best_params"]
            best_per_mod = extras["best_per_mod"]
            states = vrunner.shard_folds(jax.device_put(st_host))
            for st, b, ni in zip(stoppers, meta["best"], meta["no_improve"]):
                st.best = float(b)
                st.no_improve = int(ni)
            start_epoch = meta["epoch"] + 1
            # fast-forward the host/device RNG streams so a resumed run sees
            # the same per-fold epoch orders/keys as an uninterrupted one
            for _ in range(1, start_epoch):
                for r, pl in zip(host_rngs, stacked.train_pools):
                    r.permutation(len(pl))
                for i in range(f):
                    keys[i], _, _ = jax.random.split(keys[i], 3)
            print(f"[vmap-cv] resumed from epoch {start_epoch}")

    # eval index batches are fixed across epochs
    eval_idx, eval_valid = stack_index_batches(
        stacked.eval_pools,
        [np.arange(len(p)) for p in stacked.eval_pools],
        args.batch_size,
    )

    for ep in range(start_epoch, args.epochs + 1):
        states = states.replace(
            epoch=jnp.full((f,), ep - 1, jnp.int32)
        )
        train_pools = stacked.train_pools
        if async_mode:
            train_pools = [
                WG.async_pool(s.train, np.random.default_rng(args.seed + ep))
                for s in splits
            ]
        orders = [r.permutation(len(p)) for r, p in zip(host_rngs, train_pools)]
        idx, valid = stack_index_batches(train_pools, orders, args.batch_size)
        k_trs, k_evs = [], []
        for i in range(f):
            keys[i], k_tr, k_ev = jax.random.split(keys[i], 3)
            k_trs.append(k_tr)
            k_evs.append(k_ev)
        rngs_tr = stack_epoch_rngs(k_trs, idx.shape[1])
        states, metrics = vrunner.train_epoch(
            states, stacked_dev["xs"], stacked_dev["ys"], idx, valid, rngs_tr, ctx
        )
        tr = aggregate_folds(metrics)

        rngs_ev = stack_epoch_rngs(k_evs, eval_idx.shape[1])
        outs = vrunner.eval_epoch(
            states.params, stacked_dev["exs"], stacked_dev["eys"], eval_idx,
            eval_valid, rngs_ev, ctx, jnp.asarray(ep - 1, jnp.int32),
            jnp.ones((3,), bool),
        )
        ev = aggregate_folds(outs)
        macros = (
            ev["acc_batchmean"].mean(axis=1) if async_mode else ev["ens_acc"]
        )
        # a fold that has exhausted its patience is FROZEN (the
        # sequential driver breaks out of its loop there; training the
        # stacked weights further is harmless but its best snapshot
        # must not keep improving)
        improved = [(not st.stop) and st.update(float(v))
                    for st, v in zip(stoppers, macros)]
        if any(improved):
            ph = jax.device_get(states.params)
            for i, imp in enumerate(improved):
                if imp:
                    best_per_mod[i] = ev["acc_batchmean"][i]
                    best_params_host = jax.tree_util.tree_map(
                        lambda b, new: _set_row(b, new, i), best_params_host, ph
                    )
        if args.ckpt_dir:
            save_vmap_checkpoint(
                args.ckpt_dir, states, stoppers,
                {"best_params": best_params_host,
                 "best_per_mod": np.asarray(best_per_mod)},
                ep,
            )
        if args.verbose:
            live = sum(not st.stop for st in stoppers)
            print(
                f"[vmap-cv] Ep {ep:03d} | macro="
                f"{np.array2string(np.asarray(macros), precision=1)} "
                f"best={np.array2string(np.asarray([s.best for s in stoppers]), precision=1)} "
                f"live_folds={live}"
            )
        if all(st.stop for st in stoppers):
            print(f"[vmap-cv] all folds early-stopped at epoch {ep}")
            break

    # --- masked relaxed-input eval at each fold's best params --------------
    best_states = states.replace(params=jax.device_put(best_params_host))
    mask_fold_scores: Dict[str, List[float]] = {}
    for mk, tup in MASK_COMBOS.items():
        k_evs = []
        for i in range(f):
            keys[i], k_ev = jax.random.split(keys[i])
            k_evs.append(k_ev)
        rngs_ev = stack_epoch_rngs(k_evs, eval_idx.shape[1])
        outs = vrunner.eval_epoch(
            best_states.params, stacked_dev["exs"], stacked_dev["eys"],
            eval_idx, eval_valid, rngs_ev, ctx,
            jnp.asarray(args.epochs, jnp.int32), jnp.asarray(tup, bool),
        )
        r = aggregate_folds(outs)
        if async_mode:
            on = np.asarray(tup, bool)
            scores = r["acc_batchmean"][:, on].mean(axis=1)
        else:
            scores = r["ens_acc"]
        mask_fold_scores[mk] = [float(s) for s in scores]

    fold_macro = [st.best for st in stoppers]
    print("\n=== Summary (vmapped CV) ===")
    print(
        f"Macro acc mean ± std: {np.mean(fold_macro):.2f}% ± "
        f"{np.std(fold_macro):.2f}%"
    )
    print("\n=== Masked accuracy at best epoch (avg across folds) ===")
    for mk, arr in mask_fold_scores.items():
        a = np.asarray(arr, float)
        print(f"[{mk:5}] {a.mean():5.2f}% ± {a.std():4.2f}%  over {len(a)} folds")
    return {
        "macro": (float(np.mean(fold_macro)), float(np.std(fold_macro))),
        "per_fold_macro": [float(x) for x in fold_macro],
        "per_mod": {
            "walkway": float(best_per_mod[:, 0].mean()),
            "insole": float(best_per_mod[:, 1].mean()),
            "imu": float(best_per_mod[:, 2].mean()),
        },
        "masks": {k: float(np.mean(v)) for k, v in mask_fold_scores.items()},
    }


def _weargait_single_mod_vmapped(args):
    """Vmapped analogue of weargait_driver.run_single_mod_fold (reference
    weargait_train.py:250-297, 579-588): the chosen stream runs through the
    shared backbone + its head via forward_single, all folds stacked on a
    vmap axis. Per-fold RNG streams match the sequential sub-driver, so the
    per-fold best accuracies reproduce it exactly (tests/test_vmap_cv.py).
    Checkpoint/resume uses the same stacked snapshot as the 3-stream path."""
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.cv import build_subj2label, make_fixed_balanced_folds_no_overlap
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_loss_ctx
    from gaitpd.train.weargait_driver import (
        MODALITIES,
        build_model,
        get_streams,
        split_to_device,
        weargait_aug_config,
    )

    async_mode = args.async_loading
    mod_idx = MODALITIES.index(args.single_mod)
    streams, pd_ids, hc_ids = get_streams(args)
    subj2label = build_subj2label(pd_ids, hc_ids)
    folds = make_fixed_balanced_folds_no_overlap(
        pd_ids, hc_ids, n_folds=args.n_folds, per_class=args.test_per_class,
        seed=args.seed,
    )
    if args.n_folds_cap:
        folds = folds[: args.n_folds_cap]
    f = len(folds)

    splits = [
        WG.prepare_split(streams, tr, te, subj2label, win=args.win_len,
                         hop=args.hop_len)
        for tr, te in folds
    ]
    datas3 = [split_to_device(s, async_mode, args.seed) for s in splits]
    datas = [
        DeviceFoldData(
            xs=(d.xs[mod_idx],), ys=(d.ys[mod_idx],),
            train_pool=d.train_pool[:, mod_idx: mod_idx + 1],
            eval_pool=d.eval_pool[:, mod_idx: mod_idx + 1],
            eval_xs=(d.exs[mod_idx],), eval_ys=(d.eys[mod_idx],),
        )
        for d in datas3
    ]
    stacked = stack_folds(datas)

    counts_per_fold = [
        [np.bincount(np.asarray(d.ys[0])[d.train_pool[:, 0]],
                     minlength=args.num_classes)]
        for d in datas
    ]
    aug_specs, aug_params = weargait_aug_config(args, n_streams=1)
    settings = StepSettings(
        n_streams=1, wm=args.wm, synchronized=False,
        gcl_m=args.gcl_m, gcl_s=args.gcl_s, noise_mul=args.noise_mul,
        drw_warmup=args.drw_warmup, augment=aug_specs,
    )
    ctx = stack_ctx([make_loss_ctx(settings, c, aug_params=aug_params)
                     for c in counts_per_fold])

    model = build_model(args, not async_mode)
    apply_single = lambda v, x: model.apply(  # noqa: E731
        v, x, args.single_mod, method=WearGaitThreeModal.forward_single
    )
    tx = sgd_torch(args.lr, 0.9, 1e-4)
    # init needs all 3 streams (the full model's params are built, only the
    # chosen branch runs forward) — same as the sequential sub-driver
    sample_xs = tuple(np.asarray(x[0, :2]) for x in
                      stack_folds(datas3).xs)
    states, _ = init_stacked_state(model, tx, None, sample_xs, [args.seed] * f)
    # fresh SGD per epoch, mirroring the sequential sub-driver (the
    # reference re-creates its optimizer inside train_one_epoch_single,
    # weargait_train.py:273-276); host copy survives buffer donation
    opt_state0 = jax.device_get(states.opt_state)
    mesh = args.mesh
    if mesh is not None and f % mesh.devices.size != 0:
        print(
            f"[vmap-cv] {f} folds not divisible by {mesh.devices.size} "
            "devices; running single-device"
        )
        mesh = None
    runner = EpochRunner(apply_single, tx, settings, None, None)
    vrunner = VmapEpochRunner(runner, mesh=mesh)
    states = vrunner.shard_folds(states)
    dev = vrunner.shard_folds(
        {"xs": stacked.xs, "ys": stacked.ys, "exs": stacked.eval_xs,
         "eys": stacked.eval_ys}
    )

    host_rngs = [np.random.default_rng(args.seed + 1000 * fi)
                 for fi in range(1, f + 1)]
    keys = [jax.random.PRNGKey(args.seed + fi) for fi in range(1, f + 1)]
    stoppers = [EarlyStopper(patience=args.patience) for _ in range(f)]

    start_epoch = 1
    if args.ckpt_dir and args.resume:
        restored = restore_vmap_checkpoint(args.ckpt_dir, states, {})
        if restored is not None:
            st_host, _extras, meta = restored
            states = vrunner.shard_folds(jax.device_put(st_host))
            for st, bb, ni in zip(stoppers, meta["best"], meta["no_improve"]):
                st.best = float(bb)
                st.no_improve = int(ni)
            start_epoch = meta["epoch"] + 1
            for _ in range(1, start_epoch):
                for r, d in zip(host_rngs, datas):
                    r.permutation(len(d.train_pool))
                for i in range(f):
                    keys[i], _, _ = jax.random.split(keys[i], 3)
            print(f"[vmap-cv] resumed from epoch {start_epoch}")

    eval_idx, eval_valid = stack_index_batches(
        stacked.eval_pools,
        [np.arange(len(p)) for p in stacked.eval_pools],
        args.batch_size,
    )

    for ep in range(start_epoch, args.epochs + 1):
        states = states.replace(
            epoch=jnp.full((f,), ep - 1, jnp.int32),
            opt_state=vrunner.shard_folds(jax.device_put(opt_state0)),
        )
        train_pools = stacked.train_pools
        if async_mode:
            train_pools = [
                WG.async_pool(s.train, np.random.default_rng(args.seed + ep))
                [:, mod_idx: mod_idx + 1]
                for s in splits
            ]
        orders = [r.permutation(len(p)) for r, p in zip(host_rngs, train_pools)]
        idx, valid = stack_index_batches(train_pools, orders, args.batch_size)
        k_trs, k_evs = [], []
        for i in range(f):
            keys[i], k_tr, k_ev = jax.random.split(keys[i], 3)
            k_trs.append(k_tr)
            k_evs.append(k_ev)
        states, _metrics = vrunner.train_epoch(
            states, dev["xs"], dev["ys"], idx, valid,
            stack_epoch_rngs(k_trs, idx.shape[1]), ctx,
        )
        outs = vrunner.eval_epoch(
            states.params, dev["exs"], dev["eys"], eval_idx, eval_valid,
            stack_epoch_rngs(k_evs, eval_idx.shape[1]), ctx,
            jnp.asarray(ep - 1, jnp.int32), jnp.ones((1,), bool),
        )
        ev = aggregate_folds(outs)
        # pooled accuracy (weargait_train.py:292-296), like the sequential
        # single-mod sub-driver
        vas = ev["acc"][:, 0]
        for st, v in zip(stoppers, vas):
            if not st.stop:
                st.update(float(v))
        if args.ckpt_dir:
            save_vmap_checkpoint(args.ckpt_dir, states, stoppers, {}, ep)
        if args.verbose:
            print(
                f"[vmap-cv] Ep {ep:03d} | {args.single_mod} val="
                f"{np.array2string(np.asarray(vas), precision=1)} "
                f"best={np.array2string(np.asarray([s.best for s in stoppers]), precision=1)}"
            )
        if all(st.stop for st in stoppers):
            print(f"[vmap-cv] all folds early-stopped at epoch {ep}")
            break

    fold_macro = [st.best for st in stoppers]
    per_mod = {
        m: (float(np.mean(fold_macro)) if m == args.single_mod else 0.0)
        for m in MODALITIES
    }
    print("\n=== Summary (vmapped CV, single_mod) ===")
    print(
        f"Macro acc mean ± std: {np.mean(fold_macro):.2f}% ± "
        f"{np.std(fold_macro):.2f}%"
    )
    return {
        "macro": (float(np.mean(fold_macro)), float(np.std(fold_macro))),
        "per_fold_macro": [float(x) for x in fold_macro],
        "per_mod": per_mod,
        "masks": {},
    }


def _set_row(best_leaf, new_leaf, i):
    out = np.asarray(best_leaf).copy()
    out[i] = np.asarray(new_leaf)[i]
    return out


# ---------------------------------------------------------------------------
# Stacked checkpoint / resume (all folds in one snapshot)
# ---------------------------------------------------------------------------


def save_vmap_checkpoint(root, states, stoppers, extras: dict, epoch: int):
    """One orbax snapshot holds every fold: the stacked TrainState, the
    per-fold early-stop counters and any driver-specific `extras` arrays
    (the weargait path stores the stacked best params; the fbg_fog path the
    best collected predictions)."""
    import json
    from pathlib import Path

    import orbax.checkpoint as ocp

    path = Path(root) / "vmap" / "latest"
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "state": jax.device_get(states),
        "extras": extras,
        # the epoch/stopper meta lives INSIDE the snapshot so a kill can
        # never pair a new-epoch state with a stale meta file (the old
        # two-file write had that window); latest.json stays as a
        # human-readable mirror only
        "epoch": np.asarray(epoch, np.int32),
        "best": np.asarray([s.best for s in stoppers], np.float64),
        "no_improve": np.asarray([s.no_improve for s in stoppers], np.int32),
    }
    ocp.PyTreeCheckpointer().save(path.resolve(), payload, force=True)
    meta = {
        "epoch": int(epoch),
        "best": [float(s.best) for s in stoppers],
        "no_improve": [int(s.no_improve) for s in stoppers],
    }
    tmp = path.parent / "latest.json.tmp"
    tmp.write_text(json.dumps(meta))
    tmp.rename(path.parent / "latest.json")


def restore_vmap_checkpoint(root, states_template, extras_template: dict):
    """Returns (states, extras, meta) or None."""
    from pathlib import Path

    import orbax.checkpoint as ocp

    path = Path(root) / "vmap" / "latest"
    if not path.exists():
        return None
    n_folds = int(
        jax.tree_util.tree_leaves(jax.device_get(states_template))[0].shape[0]
    )
    template = {
        "state": jax.device_get(states_template),
        "extras": extras_template,
        "epoch": np.zeros((), np.int32),
        "best": np.zeros((n_folds,), np.float64),
        "no_improve": np.zeros((n_folds,), np.int32),
    }
    payload = ocp.PyTreeCheckpointer().restore(path.resolve(), item=template)
    # meta comes from the snapshot itself, never from latest.json (which is
    # only a human-readable mirror and could lag behind after a kill)
    meta = {
        "epoch": int(payload["epoch"]),
        "best": [float(b) for b in payload["best"]],
        "no_improve": [int(n) for n in payload["no_improve"]],
    }
    return payload["state"], payload["extras"], meta


# ---------------------------------------------------------------------------
# The FBG/FoG vmapped CV driver
# ---------------------------------------------------------------------------


def run_fbg_fog_vmapped(args):
    """Drop-in replacement for fbg_fog_driver.main that trains all
    class-stratified folds of each modality simultaneously (reference
    sequential loop: fbg_fog_train.py:410-436). Same summary dict; per-fold
    RNG streams match the sequential driver whenever fold batch counts
    agree. Checkpoint/resume persists one stacked snapshot per modality
    under --ckpt_dir/<modality> (--resume restores it)."""
    import dataclasses as _dc

    from gaitpd.config import FBG_FOG_DIMS, FBG_FOG_TRAIN, normalize_dataset_name
    from gaitpd.train.fbg_fog_driver import get_reader
    from gaitpd.train.cv import (
        fbg_label_dict,
        fog_label_dict,
        generate_class_stratified_folds,
    )

    dataset = normalize_dataset_name(args.dataset)
    reader = get_reader(args)
    rng = np.random.default_rng(args.seed)
    label_dict = fbg_label_dict(reader) if dataset == "fbg" else fog_label_dict(reader)
    folds = generate_class_stratified_folds(label_dict, rng)
    if args.n_folds_cap:
        folds = folds[: args.n_folds_cap]

    if args.modality == "all":
        modes = ["skeleton", "sensor", "multimodal"]
    elif args.modality == "both":
        modes = ["skeleton", "sensor"]
    else:
        modes = [args.modality]

    summary = {}
    for mod in modes:
        ck = str(Path(args.ckpt_dir) / mod) if args.ckpt_dir else None
        margs = _dc.replace(args, modality=mod, ckpt_dir=ck)
        print(f"\n>>> MODE: {mod.upper()} (vmapped folds) <<<")
        results = _fbg_fog_folds_vmapped(reader, folds, margs)
        arr = np.asarray(results)
        mean_sk, mean_se, mean_av = arr.mean(axis=0)
        if mod == "multimodal" and args.synchronized_loading:
            print(f"mean Ensemble Acc: {mean_av:.2f}%")
        else:
            print(f"mean skel={mean_sk:.2f}%, sensor={mean_se:.2f}%, avg={mean_av:.2f}%")
        summary[mod] = dict(skel=mean_sk, sensor=mean_se, avg=mean_av)
    return summary


def _fbg_fog_folds_vmapped(reader, folds, args):
    """All folds of one modality at once. Returns [(sk, se, avg)] per fold,
    mirroring fbg_fog_driver.train_one_fold's best-epoch selection and
    collected-prediction accuracies."""
    from gaitpd import train as _t  # noqa: F401
    from gaitpd.config import FBG_FOG_DIMS, FBG_FOG_TRAIN, normalize_dataset_name
    from gaitpd.data.fbg_fog import build_fusion_fold
    from gaitpd.learning.mtl import make_method
    from gaitpd.train import metrics as M
    from gaitpd.train.fbg_fog_driver import choose_model, fold_to_device
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import StepSettings, make_loss_ctx

    dataset = normalize_dataset_name(args.dataset)
    dims = FBG_FOG_DIMS[dataset]
    tp = FBG_FOG_TRAIN[dataset]
    epochs = args.epochs or tp.epochs
    batch_size = args.batch_size or tp.batch_size
    multimodal = args.modality == "multimodal"
    n_streams = 2 if multimodal else 1
    f = len(folds)

    datas = []
    for train_subj, eval_subj in folds:
        fold = build_fusion_fold(
            dataset, reader, train_subj, eval_subj,
            synchronized=args.synchronized_loading, seed=args.seed,
            pad_skel=dims.pose_length, pad_sens=dims.sensor_length,
            modality=args.modality,
        )
        datas.append(fold_to_device(fold, args.modality))
    stacked = stack_folds(datas)

    from gaitpd.train.fbg_fog_driver import augment_config

    aug_specs, aug_params = augment_config(
        args, dims.skeleton_input_dim, args.modality
    )
    settings = StepSettings(
        n_streams=n_streams, wm=args.wm, synchronized=args.synchronized_loading,
        ldam_s=args.ldam_s, gcl_m=args.gcl_m, gcl_s=args.gcl_s,
        noise_mul=args.noise_mul, drw_warmup=args.drw_warmup,
        consistency_lambda=args.consistency_lambda if multimodal else 0.0,
        private_grads="sum",
        augment=aug_specs,
    )
    ctxs = []
    for d in datas:
        counts = [
            np.bincount(np.asarray(d.ys[k])[d.train_pool[:, k]],
                        minlength=dims.num_classes)
            for k in range(n_streams)
        ]
        ctxs.append(make_loss_ctx(settings, counts, ldam_max_m=args.ldam_m,
                                  aug_params=aug_params))
    ctx = stack_ctx(ctxs)

    model = choose_model(args, dims)
    tx = sgd_torch(tp.learning_rate, tp.momentum, tp.weight_decay)
    mtl = None
    if multimodal and args.alpha > 0:
        kwargs = (
            {"c": args.alpha, "max_norm": args.max_norm}
            if args.mtl_method in ("cagrad", "log_cagrad")
            else {}
        )
        mtl = make_method(args.mtl_method, n_streams, **kwargs)

    sample_xs = tuple(np.asarray(x[0, :2]) for x in stacked.xs)
    states, partition = init_stacked_state(
        model, tx, mtl, sample_xs, [args.seed] * f
    )
    mesh = args.mesh
    if mesh is not None and f % mesh.devices.size != 0:
        print(
            f"[vmap-cv] {f} folds not divisible by {mesh.devices.size} "
            "devices; running single-device"
        )
        mesh = None
    runner = EpochRunner(model.apply, tx, settings, mtl, partition)
    vrunner = VmapEpochRunner(runner, mesh=mesh)
    states = vrunner.shard_folds(states)
    dev = vrunner.shard_folds(
        {"xs": stacked.xs, "ys": stacked.ys, "exs": stacked.eval_xs,
         "eys": stacked.eval_ys}
    )

    host_rngs = [np.random.default_rng(args.seed + 1000 * fi)
                 for fi in range(1, f + 1)]
    keys = [jax.random.PRNGKey(args.seed + fi) for fi in range(1, f + 1)]
    stoppers = [EarlyStopper(patience=tp.patience) for _ in range(f)]

    eval_orders = [np.arange(len(p)) for p in stacked.eval_pools]
    eval_idx, eval_valid = stack_index_batches(
        stacked.eval_pools, eval_orders, batch_size
    )
    # per-fold flattened validity masks for collected predictions
    eval_vmasks = []
    for p in stacked.eval_pools:
        ixf, vaf = batch_index_matrix(np.arange(len(p)), batch_size)
        pad = np.zeros(
            (eval_idx.shape[1] - ixf.shape[0], ixf.shape[1]), np.float32
        )
        eval_vmasks.append(np.concatenate([vaf, pad], 0).reshape(-1) > 0)

    # best collected predictions as FIXED-SHAPE per-fold stacks (so they can
    # live in the stacked checkpoint); ragged extraction happens once at the
    # end under eval_vmasks
    n_b, b_sz = eval_idx.shape[1], eval_idx.shape[2]
    best_preds = np.zeros((f, n_b, n_streams, b_sz), np.int32)
    best_pred_ens = np.zeros((f, n_b, b_sz), np.int32)
    has_best = np.zeros((f,), np.int32)

    start_ep = 0
    if args.ckpt_dir and args.resume:
        restored = restore_vmap_checkpoint(
            args.ckpt_dir, states,
            {"best_preds": best_preds, "best_pred_ens": best_pred_ens,
             "has_best": has_best},
        )
        if restored is not None:
            st_host, extras, meta = restored
            best_preds = np.asarray(extras["best_preds"])
            best_pred_ens = np.asarray(extras["best_pred_ens"])
            has_best = np.asarray(extras["has_best"])
            states = vrunner.shard_folds(jax.device_put(st_host))
            for st, bb, ni in zip(stoppers, meta["best"], meta["no_improve"]):
                st.best = float(bb)
                st.no_improve = int(ni)
            start_ep = meta["epoch"]
            # fast-forward the host/device RNG streams so a resumed run sees
            # the same per-fold epoch orders/keys as an uninterrupted one
            for _ in range(start_ep):
                for r, p in zip(host_rngs, stacked.train_pools):
                    r.permutation(len(p))
                for i in range(f):
                    keys[i], _, _ = jax.random.split(keys[i], 3)
            print(f"[vmap-cv] resumed from epoch {start_ep + 1}")

    mask = jnp.ones((n_streams,), bool)
    for ep in range(start_ep, epochs):
        states = states.replace(epoch=jnp.full((f,), ep, jnp.int32))
        orders = [r.permutation(len(p)) for r, p in
                  zip(host_rngs, stacked.train_pools)]
        idx, valid = stack_index_batches(stacked.train_pools, orders, batch_size)
        k_trs, k_evs = [], []
        for i in range(f):
            keys[i], k_tr, k_ev = jax.random.split(keys[i], 3)
            k_trs.append(k_tr)
            k_evs.append(k_ev)
        states, metrics = vrunner.train_epoch(
            states, dev["xs"], dev["ys"], idx, valid,
            stack_epoch_rngs(k_trs, idx.shape[1]), ctx,
        )
        outs = vrunner.eval_epoch(
            states.params, dev["exs"], dev["eys"], eval_idx, eval_valid,
            stack_epoch_rngs(k_evs, eval_idx.shape[1]), ctx,
            jnp.asarray(ep, jnp.int32), mask,
        )
        ev = aggregate_folds(outs)
        if multimodal and args.synchronized_loading:
            avgs = ev["ens_acc"]
        elif multimodal:
            avgs = ev["acc"].mean(axis=1)
        else:
            avgs = ev["acc"][:, 0]

        # a fold that has exhausted its patience is FROZEN (the
        # sequential driver breaks out of its loop there; training the
        # stacked weights further is harmless but its best snapshot
        # must not keep improving)
        improved = [(not st.stop) and st.update(float(v))
                    for st, v in zip(stoppers, avgs)]
        if any(improved):
            preds = np.asarray(outs["preds"])  # (F, n_b, K, B)
            preds_ens = np.asarray(outs["pred_ens"])  # (F, n_b, B)
            for i, imp in enumerate(improved):
                if not imp:
                    continue
                best_preds[i] = preds[i]
                best_pred_ens[i] = preds_ens[i]
                has_best[i] = 1
        if args.ckpt_dir:
            save_vmap_checkpoint(
                args.ckpt_dir, states, stoppers,
                {"best_preds": best_preds, "best_pred_ens": best_pred_ens,
                 "has_best": has_best},
                ep + 1,
            )
        if args.verbose:
            print(
                f"[vmap-cv] Ep {ep + 1:03d}/{epochs} | avg="
                f"{np.array2string(np.asarray(avgs), precision=1)} "
                f"best={np.array2string(np.asarray([s.best for s in stoppers]), precision=1)}"
            )
        if all(st.stop for st in stoppers):
            print(f"[vmap-cv] all folds early-stopped at epoch {ep + 1}")
            break

    results = []
    for i in range(f):
        p = None
        if has_best[i]:
            vm = eval_vmasks[i]
            pool = stacked.eval_pools[i]
            ixf, _ = batch_index_matrix(np.arange(len(pool)), batch_size)
            n_flat = ixf.shape[0] * ixf.shape[1]
            flat_pool = np.zeros((len(vm), pool.shape[1]), pool.dtype)
            flat_pool[:n_flat] = pool[ixf.reshape(-1)]
            rows = flat_pool[vm]
            p = {
                "preds": [
                    best_preds[i, :, k, :].reshape(-1)[vm]
                    for k in range(n_streams)
                ],
                "trues": [
                    np.asarray(stacked.eval_ys[src][i])[rows[:, src]]
                    for src in range(n_streams)
                ],
                "preds_ens": best_pred_ens[i].reshape(-1)[vm],
            }
        if p is None:
            results.append((0.0, 0.0, 0.0))
            continue
        if args.modality == "skeleton":
            sk, se = M.accuracy(p["preds"][0], p["trues"][0]), 0.0
        elif args.modality == "sensor":
            sk, se = 0.0, M.accuracy(p["preds"][0], p["trues"][0])
        else:
            sk = M.accuracy(p["preds"][0], p["trues"][0])
            se = M.accuracy(p["preds"][1], p["trues"][1])
        results.append((sk, se, stoppers[i].best))
        if args.verbose:
            if multimodal and args.synchronized_loading:
                M.print_report(p["trues"][0], p["preds_ens"],
                               f"Fold {i + 1} Best Ensemble")
            else:
                M.print_report(p["trues"][0], p["preds"][0],
                               f"Fold {i + 1} Best Stream0")
    return results


# ---------------------------------------------------------------------------
# Vmapped fusion sweep: all (seed x fold) instances of one fusion config at
# once — the TPU-native replacement for the reference's run_all.sh job farm
# axis (fusion_type x seeds round-robined over GPUs, run_all.sh:9-31).
# ---------------------------------------------------------------------------


def run_fusion_seeds_vmapped(dataset, fusion_type, seeds, **kw):
    """Back-compat alias: vmapped (seed x fold) sweep of one fusion type."""
    return run_baseline_seeds_vmapped(dataset, "fusion", fusion_type, seeds, **kw)


def run_baseline_seeds_vmapped(
    dataset: str,
    kind: str,
    variant: str,
    seeds: List[int],
    *,
    synced: bool = False,
    wm: str = "ce",
    epochs: Optional[int] = None,
    batch_size: Optional[int] = None,
    n_folds_cap: Optional[int] = None,
    synthetic: bool = False,
    verbose: bool = False,
):
    """Train every (seed, fold) instance of one baseline configuration
    (kind in {fusion, deepav, focal, taca}; variant names the fusion type)
    in a single vmapped program. Seeds vary BOTH the data sampling (reader /
    folds / oversampling, like the reference sweep) and the model init.
    Returns {seed: {"skel","sensor","avg"}} with the sequential driver's
    best-epoch collected accuracies."""
    from gaitpd.config import FBG_FOG_DIMS, normalize_dataset_name
    from gaitpd.data.fbg_fog import build_fusion_fold
    from gaitpd.train import metrics as M
    from gaitpd.train.baseline_drivers import (
        BaselineArgs,
        _adapters,
        _build_model,
        _hp,
    )
    from gaitpd.train.cv import (
        fbg_label_dict,
        fog_label_dict,
        generate_class_stratified_folds,
        FOG_EXCLUDED_SUBJECTS,
    )
    from gaitpd.train.fbg_fog_driver import fold_to_device
    from gaitpd.train.optim import adam_torch, adamw_torch
    from gaitpd.train.step import StepSettings, make_loss_ctx

    dataset = normalize_dataset_name(dataset)
    dims = FBG_FOG_DIMS[dataset]
    bargs = BaselineArgs(
        kind=kind, dataset=dataset, fusion_type=variant, synced=synced,
        wm=wm, epochs=epochs, batch_size=batch_size, synthetic=synthetic,
    )
    hp = _hp(bargs, dataset)
    # reference head rule (baseline_drivers.train_fold / fusion_train.py:168-173)
    two_heads = (not synced) or (kind == "fusion" and variant == "share_latent")
    n_heads = 2 if two_heads else 1
    head_inputs = (0, 1) if two_heads else (0,)

    # --- build every (seed, fold) instance ---------------------------------
    instances = []  # (seed, fold_idx, DeviceFoldData)
    for seed in seeds:
        if synthetic:
            from gaitpd.data import synthetic as SYN

            reader = (
                SYN.make_fbg_reader(seed=seed)
                if dataset == "fbg"
                else SYN.make_fog_reader(seed=seed)
            )
        else:
            from gaitpd.data.cache import load_reader

            reader = load_reader(dataset)
        rng = np.random.default_rng(seed)
        # baseline_drivers.main passes the FoG exclusions for fbg too
        # (reference focal_train.py:155, deepav_train.py:162)
        label_dict = (
            fbg_label_dict(reader, exclude=FOG_EXCLUDED_SUBJECTS)
            if dataset == "fbg"
            else fog_label_dict(reader)
        )
        folds = generate_class_stratified_folds(label_dict, rng)
        if n_folds_cap:
            folds = folds[:n_folds_cap]
        for fi, (tr, te) in enumerate(folds, 1):
            fold = build_fusion_fold(
                dataset, reader, tr, te, synchronized=synced, seed=seed,
                pad_skel=dims.pose_length, pad_sens=hp["sensor_length"],
                modality="multimodal",
            )
            instances.append((seed, fi, fold_to_device(fold, "multimodal")))

    f = len(instances)
    datas = [d for _, _, d in instances]
    stacked = stack_folds(datas)

    settings = StepSettings(
        n_streams=n_heads, wm=wm if wm in ("ce", "class_wt") else "ce",
        synchronized=synced,
        # fusion async averages the two CE losses (fusion_train.py:242);
        # the SOTA drivers SUM them (deepav_train.py:94, focal_train.py:43-46)
        loss_reduction="mean" if kind == "fusion" else "sum",
    )
    ctxs = []
    for d in datas:
        counts = [
            np.bincount(np.asarray(d.ys[i])[d.train_pool[:, i]],
                        minlength=dims.num_classes)
            for i in head_inputs
        ]
        ctxs.append(make_loss_ctx(settings, counts))
    ctx = stack_ctx(ctxs)

    model = _build_model(bargs, dims, hp, synced)
    if kind == "fusion":
        tx = adam_torch(hp["lr"])  # reference fusion_train.py:202, no clip
    else:
        tx = adamw_torch(hp["lr"], weight_decay=1e-4, grad_clip=1.0)
    train_apply, eval_apply, sample_tf = _adapters(bargs, model, hp)
    sample_xs = sample_tf(tuple(np.asarray(x[0, :2]) for x in stacked.xs))
    states, _ = init_stacked_state(
        model, tx, None, sample_xs, [s for s, _, _ in instances]
    )
    runner = EpochRunner(
        model.apply, tx, settings, None, None, head_inputs=head_inputs,
        train_apply=train_apply, eval_apply=eval_apply,
    )
    vrunner = VmapEpochRunner(runner)

    host_rngs = [
        np.random.default_rng(seed + 1000 * fi) for seed, fi, _ in instances
    ]
    keys = [jax.random.PRNGKey(seed + fi) for seed, fi, _ in instances]
    stoppers = [EarlyStopper(patience=hp["patience"]) for _ in range(f)]
    best_payload = [None] * f

    eval_idx, eval_valid = stack_index_batches(
        stacked.eval_pools,
        [np.arange(len(p)) for p in stacked.eval_pools],
        hp["batch"],
    )
    eval_vmasks = []
    for p in stacked.eval_pools:
        ixf, vaf = batch_index_matrix(np.arange(len(p)), hp["batch"])
        pad = np.zeros((eval_idx.shape[1] - ixf.shape[0], ixf.shape[1]), np.float32)
        eval_vmasks.append(np.concatenate([vaf, pad], 0).reshape(-1) > 0)

    mask = jnp.ones((n_heads,), bool)
    for ep in range(1, hp["epochs"] + 1):
        states = states.replace(epoch=jnp.full((f,), ep - 1, jnp.int32))
        orders = [r.permutation(len(p)) for r, p in
                  zip(host_rngs, stacked.train_pools)]
        idx, valid = stack_index_batches(stacked.train_pools, orders, hp["batch"])
        k_trs, k_evs = [], []
        for i in range(f):
            keys[i], k_tr, k_ev = jax.random.split(keys[i], 3)
            k_trs.append(k_tr)
            k_evs.append(k_ev)
        states, _m = vrunner.train_epoch(
            states, stacked.xs, stacked.ys, idx, valid,
            stack_epoch_rngs(k_trs, idx.shape[1]), ctx,
        )
        outs = vrunner.eval_epoch(
            states.params, stacked.eval_xs, stacked.eval_ys, eval_idx,
            eval_valid, stack_epoch_rngs(k_evs, eval_idx.shape[1]), ctx,
            jnp.asarray(ep - 1, jnp.int32), mask,
        )
        ev = aggregate_folds(outs)
        scores = ev["acc"][:, 0] if n_heads == 1 else ev["acc"].mean(axis=1)
        # a fold that has exhausted its patience is FROZEN (the
        # sequential driver breaks out of its loop there; training the
        # stacked weights further is harmless but its best snapshot
        # must not keep improving)
        improved = [(not st.stop) and st.update(float(v))
                    for st, v in zip(stoppers, scores)]
        if any(improved):
            preds = np.asarray(outs["preds"])
            for i, imp in enumerate(improved):
                if not imp:
                    continue
                vm = eval_vmasks[i]
                pool = stacked.eval_pools[i]
                ixf, _ = batch_index_matrix(np.arange(len(pool)), hp["batch"])
                n_flat = ixf.shape[0] * ixf.shape[1]
                flat_pool = np.zeros((len(vm), pool.shape[1]), pool.dtype)
                flat_pool[:n_flat] = pool[ixf.reshape(-1)]
                rows = flat_pool[vm]
                best_payload[i] = {
                    "preds": [preds[i, :, k, :].reshape(-1)[vm]
                              for k in range(n_heads)],
                    "trues": [np.asarray(stacked.eval_ys[src][i])[rows[:, src]]
                              for src in head_inputs],
                }
        if verbose:
            print(
                f"[vmap-sweep {kind}:{variant}] Ep {ep:03d}/{hp['epochs']} best="
                f"{np.array2string(np.asarray([s.best for s in stoppers]), precision=1)}"
            )
        if all(st.stop for st in stoppers):
            break

    # --- per-instance accs -> per-seed means --------------------------------
    per_seed: Dict[int, List[Tuple[float, float, float]]] = {}
    for i, (seed, fi, _) in enumerate(instances):
        p = best_payload[i]
        if p is None:
            per_seed.setdefault(seed, []).append((0.0, 0.0, 0.0))
            continue
        if n_heads == 1:
            acc = M.accuracy(p["preds"][0], p["trues"][0])
            per_seed.setdefault(seed, []).append((acc, 0.0, acc))
        else:
            sk = M.accuracy(p["preds"][0], p["trues"][0])
            se = M.accuracy(p["preds"][1], p["trues"][1])
            per_seed.setdefault(seed, []).append((sk, se, 0.5 * (sk + se)))
    out = {}
    for seed, rows in per_seed.items():
        arr = np.asarray(rows)
        out[seed] = {
            "skel": float(arr[:, 0].mean()),
            "sensor": float(arr[:, 1].mean()),
            "avg": float(arr[:, 2].mean()),
        }
    return out
