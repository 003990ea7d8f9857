"""FBG/FoG baseline drivers: fusion ablations (early/late/share_latent/
cheap_xattn) and the SOTA baselines (DeepAV-Lite, FOCAL, TACA).

reference: train/baselines/fusion_train.py, deepav_train.py, focal_train.py,
taca_train.py — all share the same skeleton (CV folds -> loaders -> model ->
Adam/AdamW -> CE/class_wt -> best-epoch selection); here they share one
generic fold runner over the epoch-scan runtime.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaitpd.config import FBG_FOG_DIMS, normalize_dataset_name
from gaitpd.data.fbg_fog import build_fusion_fold
from gaitpd.models import baselines as B
from gaitpd.models import fusion as FU
from gaitpd.train import metrics as M
from gaitpd.train.cv import (
    FOG_EXCLUDED_SUBJECTS,
    fbg_label_dict,
    fog_label_dict,
    generate_class_stratified_folds,
)
from gaitpd.train.fbg_fog_driver import fold_to_device
from gaitpd.train.loop import EarlyStopper, EpochRunner, init_train_state, run_eval_epoch, run_train_epoch
from gaitpd.train.optim import adam_torch, adamw_torch
from gaitpd.train.step import StepSettings, make_loss_ctx


@dataclasses.dataclass
class BaselineArgs:
    kind: str  # fusion | deepav | focal | taca
    dataset: str = "fog"
    synced: bool = False
    wm: str = "ce"  # ce | class_wt
    seed: int = 43
    fusion_type: str = "cheap_xattn"
    epochs: Optional[int] = None
    batch_size: Optional[int] = None
    patience: Optional[int] = None
    synthetic: bool = False
    n_folds_cap: Optional[int] = None
    verbose: bool = True
    # TACA knobs (reference taca_train.py:201-209)
    d_model: int = 96
    n_heads: int = 4
    n_tok_s: int = 4
    n_tok_e: int = 4
    tau: float = 1.0
    gamma: float = 1.5
    taca_schedule: str = "const"
    taca_depths: int = 1


# reference per-driver hyperparameter tables (the deliberate drift between
# them is preserved: fusion_train.py:21-50 uses fog sensor_length 150 and
# fbg batch 32; the SOTA drivers use 100 epochs & patience 60,
# deepav_train.py:21-24, focal_train.py:17-26, taca_train.py:17-20)
def _hp(args: BaselineArgs, dataset: str):
    if args.kind == "fusion":
        hp = dict(epochs=50, patience=10**9,
                  batch=32 if dataset == "fbg" else 256,
                  sensor_length=65 if dataset == "fbg" else 150,
                  lr=1e-3)
    else:
        hp = dict(epochs=100, patience=60, batch=256,
                  sensor_length=65 if dataset == "fbg" else 426, lr=1e-3)
    if args.epochs:
        hp["epochs"] = args.epochs
    if args.batch_size:
        hp["batch"] = args.batch_size
    if args.patience is not None:
        hp["patience"] = args.patience
    return hp


def _build_model(args: BaselineArgs, dims, hp, sync: bool):
    common = dict(
        skeleton_output_dim=dims.skeleton_output_dim,
        sensor_out_channels=dims.sensor_out_channels,
        sensor_length=hp["sensor_length"],
        pose_length=dims.pose_length,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
    )
    if args.kind == "fusion":
        cls = FU.TWO_MOD_FUSIONS[args.fusion_type]
        return cls(synchronized_loading=sync, **common)
    if args.kind == "deepav":
        return B.DeepAVLite(num_classes=dims.num_classes, synchronized=sync)
    if args.kind == "focal":
        return B.FOCALSharedLatent(
            skeleton_output_dim=dims.skeleton_output_dim,
            sensor_out_channels=dims.sensor_out_channels,
            sensor_length=hp["sensor_length"],
            pose_length=dims.pose_length,
            d_shared=16, d_private=8, shared_out_channels=4, backbone_dim=4,
            num_classes=dims.num_classes, synchronized=sync,
        )
    if args.kind == "taca":
        return B.TACAWrapper(
            skel_t=dims.pose_length, skel_d=dims.skeleton_input_dim,
            sens_t=hp["sensor_length"], sens_d=dims.sensor_in_channels,
            num_classes=dims.num_classes,
            d_model=args.d_model, n_heads=args.n_heads,
            n_tok_s=args.n_tok_s, n_tok_e=args.n_tok_e,
            tau=args.tau, gamma=args.gamma, schedule=args.taca_schedule,
            num_depths=args.taca_depths, drop=0.1, synchronized=sync,
        )
    raise ValueError(args.kind)


def _adapters(args: BaselineArgs, model, hp):
    """TACA flattens both modalities to (B, T*D) (taca_train.py:30-37) and
    takes an epoch-fraction; DeepAV threads dropout."""
    if args.kind == "taca":
        flat = lambda xs: tuple(x.reshape(x.shape[0], -1) for x in xs)  # noqa: E731

        def train_apply(v, xs, rng, epoch):
            ef = epoch.astype(jnp.float32) / max(1, hp["epochs"])
            return model.apply(v, *flat(xs), train=True, epoch_frac=ef,
                               rngs={"dropout": rng})

        def eval_apply(v, xs, epoch):
            ef = epoch.astype(jnp.float32) / max(1, hp["epochs"])
            return model.apply(v, *flat(xs), train=False, epoch_frac=ef)

        return train_apply, eval_apply, flat
    if args.kind == "deepav":
        def train_apply(v, xs, rng, epoch):
            return model.apply(v, *xs, train=True, rngs={"dropout": rng})

        def eval_apply(v, xs, epoch):
            return model.apply(v, *xs, train=False)

        return train_apply, eval_apply, (lambda xs: xs)
    return None, None, (lambda xs: xs)


def train_fold(fold_idx, reader, args: BaselineArgs, train_subj, eval_subj):
    dataset = normalize_dataset_name(args.dataset)
    dims = FBG_FOG_DIMS[dataset]
    hp = _hp(args, dataset)

    fold = build_fusion_fold(
        dataset, reader, train_subj, eval_subj,
        synchronized=args.synced, seed=args.seed,
        pad_skel=dims.pose_length, pad_sens=hp["sensor_length"],
        modality="multimodal",
    )
    data = fold_to_device(fold, "multimodal")

    # one joint head for sync (except fusion share_latent which keeps 2 heads
    # even in sync mode, reference fusion_train.py:168-173)
    two_heads = (not args.synced) or (
        args.kind == "fusion" and args.fusion_type == "share_latent"
    )
    n_heads = 2 if two_heads else 1
    head_inputs = (0, 1) if two_heads else (0,)

    counts = [
        np.bincount(np.asarray(data.ys[i])[data.train_pool[:, i]],
                    minlength=dims.num_classes)
        for i in head_inputs
    ]
    settings = StepSettings(
        n_streams=n_heads,
        wm=args.wm if args.wm in ("ce", "class_wt") else "ce",
        synchronized=args.synced,
        # fusion async averages the two CE losses (fusion_train.py:242);
        # the SOTA drivers SUM them (deepav_train.py:94, focal_train.py:43-46)
        loss_reduction="mean" if args.kind == "fusion" else "sum",
    )
    ctx = make_loss_ctx(settings, counts)

    model = _build_model(args, dims, hp, args.synced)
    if args.kind == "fusion":
        tx = adam_torch(hp["lr"])  # reference fusion_train.py:202, no clip
    else:
        tx = adamw_torch(hp["lr"], weight_decay=1e-4, grad_clip=1.0)
    train_apply, eval_apply, sample_tf = _adapters(args, model, hp)
    sample_xs = sample_tf(tuple(x[:2] for x in data.xs))
    state, _ = init_train_state(model, tx, None, sample_xs, seed=args.seed)
    runner = EpochRunner(
        model.apply, tx, settings, None, None,
        train_apply=train_apply, eval_apply=eval_apply, head_inputs=head_inputs,
    )

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    if args.verbose:
        print(f"Total params: {n_params:,}")

    rng = np.random.default_rng(args.seed + 1000 * fold_idx)
    key = jax.random.PRNGKey(args.seed + fold_idx)
    stopper = EarlyStopper(patience=hp["patience"])

    for ep in range(1, hp["epochs"] + 1):
        state = state.replace(epoch=jnp.asarray(ep - 1, jnp.int32))
        order = rng.permutation(len(data.train_pool))
        key, k_tr, k_ev = jax.random.split(key, 3)
        state, tr = run_train_epoch(runner, state, data, order, hp["batch"], k_tr, ctx)
        ev = run_eval_epoch(runner, state, data, hp["batch"], k_ev, ctx, collect=True)
        if n_heads == 1:
            score = float(ev.acc[0])
            line = f"acc {score:.1f}%"
        else:
            vsk, vse = float(ev.acc[0]), float(ev.acc[1])
            score = 0.5 * (vsk + vse)
            line = f"sk {vsk:.1f}% | se {vse:.1f}% | avg {score:.1f}%"
        stopper.update(score, payload=ev)
        if args.verbose:
            print(
                f"[Fold {fold_idx}] Ep{ep}: loss {float(tr.loss.mean()):.3f}/"
                f"{float(ev.loss.mean()):.3f} | {line}"
            )
        if stopper.stop:
            print(f"[Fold {fold_idx}] early stop at ep {ep}")
            break

    best = stopper.best_payload
    if best is None:
        return 0.0, 0.0, 0.0
    if n_heads == 1:
        acc = M.accuracy(best.preds[0], best.trues[0])
        if args.verbose:
            print(f"\n>>> Fold {fold_idx} Best Acc: {stopper.best:.2f}%")
            M.print_report(best.trues[0], best.preds[0], "Shared Head")
        return acc, 0.0, acc
    sk = M.accuracy(best.preds[0], best.trues[0])
    se = M.accuracy(best.preds[1], best.trues[1])
    avg = 0.5 * (sk + se)
    if args.verbose:
        print(f"\n>>> Fold {fold_idx} Best skel={sk:.2f}% sensor={se:.2f}% avg={avg:.2f}%")
        M.print_report(best.trues[0], best.preds[0], "Skeleton Head")
        M.print_report(best.trues[1], best.preds[1], "Sensor   Head")
    return sk, se, avg


def main(args: BaselineArgs):
    dataset = normalize_dataset_name(args.dataset)
    if args.synthetic:
        from gaitpd.data import synthetic

        reader = (
            synthetic.make_fbg_reader(seed=args.seed)
            if dataset == "fbg"
            else synthetic.make_fog_reader(seed=args.seed)
        )
    else:
        from gaitpd.data.cache import load_reader

        reader = load_reader(dataset)
    rng = np.random.default_rng(args.seed)
    # the SOTA drivers pass the FoG exclusions for both datasets
    # (reference focal_train.py:155, deepav_train.py:162)
    label_dict = (
        fbg_label_dict(reader, exclude=FOG_EXCLUDED_SUBJECTS)
        if dataset == "fbg"
        else fog_label_dict(reader)
    )
    folds = generate_class_stratified_folds(label_dict, rng)
    if args.n_folds_cap:
        folds = folds[: args.n_folds_cap]
    out = []
    for i, (tr, ev) in enumerate(folds, 1):
        print(f"\n=== Fold {i}/{len(folds)} ===\nTrain: {tr}\nEval : {ev}")
        out.append(train_fold(i, reader, args, tr, ev))
    out = np.asarray(out)
    msk, mse, mav = out.mean(axis=0)
    if args.synced:
        print(f"\nMean Acc: {mav:.2f}%")
    else:
        print(f"\nMean skel={msk:.2f}%  sensor={mse:.2f}%  avg={mav:.2f}%")
    return {"skel": float(msk), "sensor": float(mse), "avg": float(mav)}


def run_baseline(ns, kind: str):
    """CLI shim for --mode deepav|focal|taca."""
    args = BaselineArgs(
        kind=kind,
        dataset=ns.dataset,
        synced=ns.synchronized_loading,
        wm=ns.wm if ns.wm in ("ce", "class_wt") else "ce",
        seed=ns.seed,
        epochs=ns.epochs,
        batch_size=ns.batch_size,
        patience=ns.patience,
        synthetic=ns.synthetic,
        n_folds_cap=ns.n_folds_cap,
        verbose=not ns.quiet,
    )
    return main(args)


def run_fusion(ns):
    """CLI shim for --mode fusion."""
    args = BaselineArgs(
        kind="fusion",
        dataset=ns.dataset,
        synced=ns.synchronized_loading,
        wm="ce",
        seed=ns.seed,
        fusion_type=ns.fusion_type,
        epochs=ns.epochs,
        batch_size=ns.batch_size,
        patience=ns.patience,
        synthetic=ns.synthetic,
        n_folds_cap=ns.n_folds_cap,
        verbose=not ns.quiet,
    )
    return main(args)
