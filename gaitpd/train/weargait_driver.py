"""WearGait three-stream experiment driver with relaxed-input evaluation.

Equivalent of reference train/weargait_train.py (run_cv :533-645,
train/eval epochs :300-352, masked eval :355-433, CLI :648-691) on the
epoch-scan runtime: the 7 modality-subset evaluations share ONE compiled
eval (the mask is a traced (3,) operand), and CAGrad-with-private-grads runs
in-graph (vs. the reference's 3 full + 3 partial backward passes per step,
weargait_train.py:187-248).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaitpd.data import weargait as WG
from gaitpd.learning.mtl import make_method
from gaitpd.models.multitask import WearGaitThreeModal
from gaitpd.train.cv import build_subj2label, make_fixed_balanced_folds_no_overlap
from gaitpd.train.loop import (
    DeviceFoldData,
    EarlyStopper,
    EpochRunner,
    init_train_state,
    run_eval_epoch,
    run_train_epoch,
)
from gaitpd.train.optim import sgd_torch
from gaitpd.train.step import StepSettings, make_loss_ctx

# reference weargait_train.py:49-57
MASK_COMBOS = {
    "W": (True, False, False),
    "I": (False, True, False),
    "M": (False, False, True),
    "W+I": (True, True, False),
    "W+M": (True, False, True),
    "I+M": (False, True, True),
    "W+I+M": (True, True, True),
}

MODALITIES = ("walkway", "insole", "imu")


def weargait_aug_config(args, n_streams: int = 3):
    """Per-stream (AugmentSpec, params) for the WearGait sensor streams.

    Only noise + axis-mask apply here (the spatial mirror/rotation
    transforms are skeleton-only; the CLI warns them away for this
    driver). Shared by the sequential fold runner, the vmapped CV
    (vmap_cv.py) and the HP-vmap (hp_search.py) so the three paths can't
    diverge; ``n_streams=1`` covers the --single_mod sub-drivers.
    Returns (None, None) when every strength is zero."""
    noise = getattr(args, "aug_noise_std", 0.0)
    axis = getattr(args, "aug_axis_p", 0.0)
    if noise <= 0 and axis <= 0:
        return None, None
    from gaitpd.data.augment import AugmentSpec, make_aug_params

    specs = (AugmentSpec(noise=noise > 0, axis_mask=axis > 0),) * n_streams
    params = tuple(
        make_aug_params(noise_std=noise, axis_p=axis)
        for _ in range(n_streams)
    )
    return specs, params


@dataclasses.dataclass
class WearGaitArgs:
    """CLI surface of the reference driver (weargait_train.py:648-691)."""

    n_folds: int = 10
    test_per_class: int = 8
    win_len: int = 64
    hop_len: int = 64
    batch_size: int = 64
    epochs: int = 50
    patience: int = 50
    num_classes: int = 2
    lr: float = 1e-3
    seed: int = 43
    async_loading: bool = False
    single_mod: Optional[str] = None
    proj_ch: int = 16
    enc_out_ch: int = 12
    backbone_dim: int = 8
    shared_out_ch: int = 16
    use_norm: bool = False
    use_cosine: bool = False
    baseline: Optional[str] = None
    # parity experiments: torch-law init for the DeepAV patch-embed conv
    # (kaiming_uniform kernel + uniform bias instead of lecun_normal + zero
    # bias — see models/baselines.py::PatchEmbed1D for why the default is
    # better under relaxed-input masks)
    baseline_torch_init: bool = False
    wm: str = "gcl"
    gcl_m: float = 0.2
    gcl_s: float = 25.0
    noise_mul: float = 0.0
    drw_warmup: int = 0
    alpha: float = 0.5
    synthetic: bool = False
    data_dir: Optional[str] = None
    n_folds_cap: Optional[int] = None
    verbose: bool = True
    mesh: object = None
    mtl_method: str = "cagrad"  # any gaitpd.learning.mtl.METHODS key
    ckpt_dir: Optional[str] = None
    resume: bool = False
    modality_dropout: float = 0.0  # relaxed-input training (see step.py)
    fused: bool = False  # block-diagonal fused forward (models/fused.py)
    # on-device train-time augmentation (sensor streams: noise + channel
    # mask; strengths are traced operands — no recompiles across sweeps)
    aug_noise_std: float = 0.0
    aug_axis_p: float = 0.0


def build_model(args: WearGaitArgs, sync_flag: bool):
    """reference weargait_train.py:458-524 (baselines added via
    gaitpd.models.fusion / baselines)."""
    if args.baseline is None:
        return WearGaitThreeModal(
            enc_out_ch=args.enc_out_ch,
            backbone_dim=args.backbone_dim,
            shared_out_ch=args.shared_out_ch,
            num_classes=args.num_classes,
            use_norm=args.use_norm,
            use_cosine=args.use_cosine,
            synchronized=sync_flag,
        )
    from gaitpd.models import baselines as B
    from gaitpd.models import fusion as F

    common = dict(
        enc_out_ch=args.enc_out_ch,
        backbone_dim=args.backbone_dim,
        shared_out_ch=args.shared_out_ch,
        num_classes=args.num_classes,
        synchronized=sync_flag,
    )
    if args.baseline == "early_fusion":
        return F.EarlyFusion3(**common)
    if args.baseline == "late_fusion":
        return F.LateFusion3(**common)
    if args.baseline == "cheap_xattn":
        return F.CheapXAttn3(**common)
    if args.baseline == "shared_latent":
        return F.SharedLatent3(proj_ch=args.proj_ch, **common)
    if args.baseline == "deepav_lite":
        return B.DeepAVLite3(
            num_classes=args.num_classes,
            synchronized=sync_flag,
            torch_init=args.baseline_torch_init,
        )
    if args.baseline == "focal":
        return B.FOCALSharedLatent3(num_classes=args.num_classes, synchronized=sync_flag)
    if args.baseline == "taca":
        return B.TACA3TriWrapper(
            win_len=args.win_len, num_classes=args.num_classes, synchronized=sync_flag
        )
    raise ValueError(args.baseline)


def get_streams(args: WearGaitArgs):
    if args.synthetic:
        from gaitpd.data.synthetic import make_weargait_streams

        n = args.n_folds * args.test_per_class + 4
        return make_weargait_streams(n_pd=n, n_hc=n, seed=args.seed)
    data_dir = Path(args.data_dir or "data/WearGait/WearGait_preproc_SPmT_30Hz")
    from gaitpd.data.readers import discover_weargait_subjects

    pd_ids, hc_ids = discover_weargait_subjects(data_dir)
    streams = WG.load_pkl_streams(data_dir, pd_ids + hc_ids)
    return streams, pd_ids, hc_ids


def split_to_device(split: WG.WearGaitSplit, async_mode: bool, seed: int) -> DeviceFoldData:
    tr = [split.train[m] for m in MODALITIES]
    te = [split.test[m] for m in MODALITIES]
    if async_mode:
        train_pool = WG.async_pool(split.train, np.random.default_rng(seed))
        eval_pool = WG.async_pool(split.test, np.random.default_rng(seed + 1))
    else:
        train_pool, eval_pool = split.train_sync, split.test_sync
    return DeviceFoldData(
        xs=tuple(jnp.asarray(s.x) for s in tr),
        ys=tuple(jnp.asarray(s.y) for s in tr),
        train_pool=train_pool,
        eval_pool=eval_pool,
        eval_xs=tuple(jnp.asarray(s.x) for s in te),
        eval_ys=tuple(jnp.asarray(s.y) for s in te),
    )


def _baseline_adapters(model, args: WearGaitArgs):
    """Per-baseline apply adapters: TACA consumes flattened windows with an
    epoch-fraction operand for its γ schedule (reference
    weargait_train.py:176-181, taca_train.py:143); DeepAV-Lite threads a
    dropout rng. Returns (train_apply, eval_apply, sample_transform) —
    train_apply/eval_apply None means default adapters."""
    if args.baseline == "taca":
        flat = lambda xs: tuple(x.reshape(x.shape[0], -1) for x in xs)  # noqa: E731

        def train_apply(v, xs, rng, epoch):
            ef = epoch.astype(jnp.float32) / max(1, args.epochs)
            return model.apply(
                v, *flat(xs), train=True, epoch_frac=ef, rngs={"dropout": rng}
            )

        def eval_apply(v, xs, epoch):
            ef = epoch.astype(jnp.float32) / max(1, args.epochs)
            return model.apply(v, *flat(xs), train=False, epoch_frac=ef)

        return train_apply, eval_apply, flat
    if args.baseline == "deepav_lite":
        def train_apply(v, xs, rng, epoch):
            return model.apply(v, *xs, train=True, rngs={"dropout": rng})

        def eval_apply(v, xs, epoch):
            return model.apply(v, *xs, train=False)

        return train_apply, eval_apply, (lambda xs: xs)
    return None, None, (lambda xs: xs)


def flagship_apply(model, args: "WearGaitArgs"):
    """The forward handed to EpochRunner: `model.apply`, or — under
    `--fused`, flagship 3-stream config only — the block-diagonal fused
    forward (gaitpd/models/fused.py) that consumes the same parameter
    pytree (equivalence pinned by tests/test_fused.py)."""
    if (
        getattr(args, "fused", False)
        and args.baseline is None
        and args.single_mod is None
    ):
        from gaitpd.models.fused import make_fused_weargait_apply

        return make_fused_weargait_apply(model)
    return model.apply


def run_fold(
    fi: int,
    split: WG.WearGaitSplit,
    args: WearGaitArgs,
) -> Tuple[float, Tuple[float, float, float], Dict[str, float]]:
    """Train one fold; returns (best_macro, per-mod accs, per-mask scores)."""
    async_mode = args.async_loading
    sync_flag = not async_mode
    data = split_to_device(split, async_mode, args.seed)

    counts = [
        np.bincount(np.asarray(data.ys[k])[data.train_pool[:, k]],
                    minlength=args.num_classes)
        for k in range(3)
    ]

    aug_specs, aug_params = weargait_aug_config(args)
    settings = StepSettings(
        n_streams=3,
        wm=args.wm,
        synchronized=sync_flag,
        gcl_m=args.gcl_m,
        gcl_s=args.gcl_s,
        noise_mul=args.noise_mul,
        drw_warmup=args.drw_warmup,
        consistency_lambda=0.0,
        private_grads="sum_plus_own",
        modality_dropout=args.modality_dropout,
        augment=aug_specs,
    )
    ctx = make_loss_ctx(settings, counts, aug_params=aug_params)

    model = build_model(args, sync_flag)
    tx = sgd_torch(args.lr, 0.9, 1e-4)
    use_cagrad = args.baseline is None and args.single_mod is None and args.alpha > 0
    mtl = None
    if use_cagrad:
        kwargs = (
            {"c": args.alpha}
            if args.mtl_method in ("cagrad", "log_cagrad")
            else {}
        )
        mtl = make_method(args.mtl_method, 3, **kwargs)
    if args.baseline in ("deepav_lite", "taca"):
        settings = dataclasses.replace(settings, dropout=True)
    train_apply, eval_apply, sample_tf = _baseline_adapters(model, args)
    sample_xs = sample_tf(tuple(x[:2] for x in data.xs))
    state, partition = init_train_state(model, tx, mtl, sample_xs, seed=args.seed)
    runner = EpochRunner(
        flagship_apply(model, args), tx, settings, mtl, partition,
        mesh=args.mesh, train_apply=train_apply, eval_apply=eval_apply,
    )

    rng = np.random.default_rng(args.seed + 1000 * fi)
    key = jax.random.PRNGKey(args.seed + fi)
    stopper = EarlyStopper(patience=args.patience)
    best_params = None
    best_w = best_i = best_m = 0.0

    start_epoch = 1
    if args.ckpt_dir and args.resume:
        from gaitpd.train.checkpoint import restore_fold_checkpoint

        restored = restore_fold_checkpoint(args.ckpt_dir, fi, state)
        if restored is not None:
            state, meta = restored
            start_epoch = meta["epoch"] + 2  # stored 0-based epoch
            stopper.best = meta["best_metric"]
            stopper.no_improve = meta["no_improve"]
            best_restored = restore_fold_checkpoint(args.ckpt_dir, fi, state, "best")
            if best_restored is not None:
                best_params = jax.device_get(best_restored[0].params)
            # fast-forward the host/device RNG streams so a resumed run sees
            # the same epoch orders/noise as an uninterrupted one
            for _ in range(1, start_epoch):
                rng.permutation(len(data.train_pool))
                key, _, _ = jax.random.split(key, 3)
            print(f"[Fold {fi}] resumed from epoch {start_epoch}")

    for ep in range(start_epoch, args.epochs + 1):
        state = state.replace(epoch=jnp.asarray(ep - 1, jnp.int32))
        if async_mode:
            # per-epoch reseed of the modality permutations
            # (reference weargait_train.py:573-574)
            data.train_pool = WG.async_pool(
                split.train, np.random.default_rng(args.seed + ep)
            )
        order = rng.permutation(len(data.train_pool))
        key, k_tr, k_ev = jax.random.split(key, 3)
        state, tr = run_train_epoch(
            runner, state, data, order, args.batch_size, k_tr, ctx
        )
        ev = run_eval_epoch(runner, state, data, args.batch_size, k_ev, ctx)
        vaw, vai, vam = ev.acc_batchmean
        macro = float((vaw + vai + vam) / 3.0) if async_mode else float(ev.ens_acc)
        improved = stopper.update(macro)
        if improved:
            best_w, best_i, best_m = float(vaw), float(vai), float(vam)
            best_params = jax.device_get(state.params)
        if args.ckpt_dir:
            from gaitpd.train.checkpoint import save_fold_checkpoint

            save_fold_checkpoint(
                args.ckpt_dir, fi, state,
                best_metric=stopper.best, no_improve=stopper.no_improve,
            )
            if improved:
                save_fold_checkpoint(
                    args.ckpt_dir, fi, state, best_metric=stopper.best, latest=False
                )
        if args.verbose:
            taw, tai, tam = tr.acc_batchmean
            tail = f"macro={macro:5.1f}" if async_mode else f"ens={macro:5.1f}"
            print(
                f"[Fold {fi}] Ep {ep:03d} | "
                f"L=[{tr.loss[0]:.3f},{tr.loss[1]:.3f},{tr.loss[2]:.3f}] "
                f"acc=[{taw:5.1f},{tai:5.1f},{tam:5.1f}] | "
                f"L=[{ev.loss[0]:.3f},{ev.loss[1]:.3f},{ev.loss[2]:.3f}] "
                f"acc=[{vaw:5.1f},{vai:5.1f},{vam:5.1f}] | {tail} "
                f"best={stopper.best:5.1f}"
            )
        if stopper.stop:
            print(f"[Fold {fi}] Early stop at epoch {ep}")
            break

    # --- masked relaxed-input eval at the best epoch (reference :612-622) ---
    mask_scores: Dict[str, float] = {}
    if best_params is not None and args.single_mod is None:
        best_state = state.replace(params=jax.device_put(best_params))
        for mk, tup in MASK_COMBOS.items():
            key, k_ev = jax.random.split(key)
            r = run_eval_epoch(
                runner, best_state, data, args.batch_size, k_ev, ctx,
                mask=np.asarray(tup, bool),
            )
            if async_mode:
                enabled = [a for a, on in zip(r.acc_batchmean, tup) if on]
                score = float(np.mean(enabled)) if enabled else 0.0
            else:
                score = float(r.ens_acc)
            mask_scores[mk] = score
            if args.verbose:
                mode = "ASYNC" if async_mode else "SYNC"
                print(f"[{mode}][mask={mk}] acc={score:5.2f}%")

    print(
        f"[Fold {fi}] Best macro acc: {stopper.best:.2f}% "
        f"(W={best_w:.2f} I={best_i:.2f} M={best_m:.2f})"
    )
    return float(stopper.best), (best_w, best_i, best_m), mask_scores


def run_single_mod_fold(fi: int, split: WG.WearGaitSplit, args: WearGaitArgs):
    """Single-modality sub-driver (reference weargait_train.py:250-297,
    579-588): run only that branch through the shared backbone + its head."""
    async_mode = args.async_loading
    mod_idx = MODALITIES.index(args.single_mod)
    data3 = split_to_device(split, async_mode, args.seed)
    data = DeviceFoldData(
        xs=(data3.xs[mod_idx],),
        ys=(data3.ys[mod_idx],),
        train_pool=data3.train_pool[:, mod_idx : mod_idx + 1],
        eval_pool=data3.eval_pool[:, mod_idx : mod_idx + 1],
        eval_xs=(data3.eval_xs[mod_idx],),
        eval_ys=(data3.eval_ys[mod_idx],),
    )
    counts = [
        np.bincount(np.asarray(data.ys[0])[data.train_pool[:, 0]],
                    minlength=args.num_classes)
    ]
    aug_specs, aug_params = weargait_aug_config(args, n_streams=1)
    settings = StepSettings(
        n_streams=1, wm=args.wm, synchronized=False,
        gcl_m=args.gcl_m, gcl_s=args.gcl_s, noise_mul=args.noise_mul,
        drw_warmup=args.drw_warmup, augment=aug_specs,
    )
    ctx = make_loss_ctx(settings, counts, aug_params=aug_params)
    model = build_model(args, not async_mode)
    apply_single = lambda v, x: model.apply(  # noqa: E731
        v, x, args.single_mod, method=WearGaitThreeModal.forward_single
    )
    tx = sgd_torch(args.lr, 0.9, 1e-4)
    params = model.init(jax.random.PRNGKey(args.seed), *(x[:2] for x in data3.xs))
    import optax

    from gaitpd.train.step import TrainState

    state = TrainState(params=params, opt_state=tx.init(params), mtl_state={},
                       epoch=jnp.zeros((), jnp.int32))
    # the reference constructs a FRESH SGD optimizer inside
    # train_one_epoch_single (weargait_train.py:273-276) — momentum buffers
    # reset at every epoch; keep the pristine opt state on host (the device
    # copy is invalidated by the train step's buffer donation)
    opt_state0 = jax.device_get(state.opt_state)
    runner = EpochRunner(apply_single, tx, settings, None, None, mesh=args.mesh)
    rng = np.random.default_rng(args.seed + 1000 * fi)
    key = jax.random.PRNGKey(args.seed + fi)
    stopper = EarlyStopper(patience=args.patience)
    for ep in range(1, args.epochs + 1):
        state = state.replace(
            epoch=jnp.asarray(ep - 1, jnp.int32),
            opt_state=jax.device_put(opt_state0),
        )
        if async_mode:
            data.train_pool = WG.async_pool(
                split.train, np.random.default_rng(args.seed + ep)
            )[:, mod_idx : mod_idx + 1]
        order = rng.permutation(len(data.train_pool))
        key, k_tr, k_ev = jax.random.split(key, 3)
        state, tr = run_train_epoch(runner, state, data, order, args.batch_size, k_tr, ctx)
        ev = run_eval_epoch(runner, state, data, args.batch_size, k_ev, ctx)
        # pooled accuracy: the single-mod sub-loops divide total correct by
        # total samples (weargait_train.py:292-296), unlike the 3-stream
        # driver's per-batch means
        va = float(ev.acc[0])
        stopper.update(va)
        if args.verbose:
            print(
                f"[Fold {fi}] Ep {ep:03d} | {args.single_mod} "
                f"train {float(tr.acc_batchmean[0]):5.2f}% L{float(tr.loss[0]):.3f} | "
                f"val {va:5.2f}% best {stopper.best:5.2f}%"
            )
        if stopper.stop:
            break
    best = stopper.best
    per_mod = tuple(
        best if args.single_mod == m else 0.0 for m in MODALITIES
    )
    return float(best), per_mod, {}


def run_cv(args: WearGaitArgs):
    """reference weargait_train.py:533-645."""
    streams, pd_ids, hc_ids = get_streams(args)
    subj2label = build_subj2label(pd_ids, hc_ids)
    folds = make_fixed_balanced_folds_no_overlap(
        pd_ids, hc_ids, n_folds=args.n_folds, per_class=args.test_per_class,
        seed=args.seed,
    )
    if args.n_folds_cap:
        folds = folds[: args.n_folds_cap]

    fold_macro, fold_w, fold_i, fold_m = [], [], [], []
    mask_fold_scores: Dict[str, List[float]] = {k: [] for k in MASK_COMBOS}

    for fi, (train_subs, test_subs) in enumerate(folds, 1):
        print(f"\n=== Fold {fi}/{len(folds)} ===")
        split = WG.prepare_split(
            streams, train_subs, test_subs, subj2label,
            win=args.win_len, hop=args.hop_len,
        )
        if args.single_mod is not None:
            macro, (bw, bi, bm), masks = run_single_mod_fold(fi, split, args)
        else:
            macro, (bw, bi, bm), masks = run_fold(fi, split, args)
        fold_macro.append(macro)
        fold_w.append(bw)
        fold_i.append(bi)
        fold_m.append(bm)
        for k, v in masks.items():
            mask_fold_scores[k].append(v)

    print("\n=== Summary ===")
    print(
        f"Macro acc mean ± std: {np.mean(fold_macro):.2f}% ± {np.std(fold_macro):.2f}%"
    )
    print(
        f"Per-mod acc mean ± std: "
        f"[walkway {np.mean(fold_w):.2f} ± {np.std(fold_w):.2f}]  "
        f"[insole {np.mean(fold_i):.2f} ± {np.std(fold_i):.2f}]  "
        f"[imu {np.mean(fold_m):.2f} ± {np.std(fold_m):.2f}]"
    )
    if all(len(v) > 0 for v in mask_fold_scores.values()):
        print("\n=== Masked accuracy at best epoch (avg across folds) ===")
        for mk, arr in mask_fold_scores.items():
            a = np.asarray(arr, float)
            print(f"[{mk:5}] {a.mean():5.2f}% ± {a.std():4.2f}%  over {len(a)} folds")
    return {
        "macro": (float(np.mean(fold_macro)), float(np.std(fold_macro))),
        "per_mod": {
            "walkway": float(np.mean(fold_w)),
            "insole": float(np.mean(fold_i)),
            "imu": float(np.mean(fold_m)),
        },
        "masks": {k: float(np.mean(v)) if v else None for k, v in mask_fold_scores.items()},
    }
