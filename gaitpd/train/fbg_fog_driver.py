"""FBG/FoG experiment driver: subject-fold CV over skeleton / sensor /
multimodal multitask training.

Equivalent of reference train/fbg_fog_train.py (process_batch :46-164,
run_epoch :170-263, train_one_fold :269-404, main :410-436) on the
epoch-scan runtime: per fold the data goes to device once and each epoch is
one compiled scan; CAGrad runs in-graph.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaitpd.config import FBG_FOG_DIMS, FBG_FOG_TRAIN, normalize_dataset_name
from gaitpd.data.fbg_fog import FusionFold, build_fusion_fold
from gaitpd.learning.mtl import make_method
from gaitpd.models.multitask import (
    MultiModalMultiTask,
    SensorModalityModel,
    SkelModalityModel,
)
from gaitpd.train import metrics as M
from gaitpd.train.cv import fbg_label_dict, fog_label_dict, generate_class_stratified_folds
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


@dataclasses.dataclass
class FbgFogArgs:
    """CLI surface of the reference driver (fbg_fog_train.py:442-463)."""

    dataset: str = "fog"
    modality: str = "multimodal"  # skeleton|sensor|both|multimodal|all
    consistency_lambda: float = 1.0
    seed: int = 43
    wm: str = "gcl"
    synchronized_loading: bool = False
    alpha: float = 0.1
    max_norm: float = 1.0
    ldam_s: float = 30.0
    ldam_m: float = 0.5
    gcl_m: float = 0.2
    gcl_s: float = 25.0
    noise_mul: float = 0.0
    drw_warmup: int = 0
    use_norm_and_cos: bool = False
    epochs: Optional[int] = None  # override configs' epoch count
    batch_size: Optional[int] = None
    synthetic: bool = False  # use synthetic readers (no raw data needed)
    synthetic_strength: float = 1.0  # class-signal strength of the synthetic readers
    # per-joint gains on the synthetic pose signal so it survives the
    # root-joint centering (center_poses, reference dataloader_fbg_fog.py:
    # 93-99); without this the pose class signal is common-mode across
    # joints and centering deletes it (skeleton branches train on noise)
    synthetic_pose_per_joint: bool = False
    n_folds_cap: Optional[int] = None
    verbose: bool = True
    mesh: object = None
    mtl_method: str = "cagrad"  # any gaitpd.learning.mtl.METHODS key
    ckpt_dir: Optional[str] = None  # enable per-fold orbax checkpoints
    resume: bool = False  # resume folds from their latest checkpoint
    save_loss_plots: bool = False  # per-fold loss-curve PNGs
    rebuild_cache: bool = False  # rebuild the reader pickle cache first
    # on-device train-time augmentation (gaitpd/data/augment.py::
    # augment_stream; strengths are traced operands — no recompiles across
    # sweeps). Spatial ops (mirror/rotation) apply to the skeleton stream;
    # noise/axis-mask to both streams.
    aug_mirror_p: float = 0.0
    aug_rot_deg: float = 0.0
    aug_noise_std: float = 0.0
    aug_axis_p: float = 0.0


def augment_config(args, skeleton_input_dim: int, modality: str):
    """(specs, params) for the on-device augmentation stage, or (None, None)
    when every strength is zero. One AugmentSpec per input stream; the
    sensor stream only takes the non-spatial transforms."""
    strengths = dict(
        mirror_p=args.aug_mirror_p, rot_deg=args.aug_rot_deg,
        noise_std=args.aug_noise_std, axis_p=args.aug_axis_p,
    )
    if not any(v > 0 for v in strengths.values()):
        return None, None
    from gaitpd.data.augment import AugmentSpec, make_aug_params

    pose_spec = AugmentSpec(
        joints=skeleton_input_dim // 3,
        mirror=args.aug_mirror_p > 0, rotation=args.aug_rot_deg > 0,
        noise=args.aug_noise_std > 0, axis_mask=args.aug_axis_p > 0,
    )
    sens_spec = AugmentSpec(
        noise=args.aug_noise_std > 0, axis_mask=args.aug_axis_p > 0,
    )
    if not (sens_spec.noise or sens_spec.axis_mask):
        sens_spec = None
    if modality == "skeleton":
        specs = (pose_spec,)
    elif modality == "sensor":
        specs = (sens_spec,)
    else:
        specs = (pose_spec, sens_spec)
    params = tuple(make_aug_params(**strengths) for _ in specs)
    return specs, params


def choose_model(args: FbgFogArgs, dims):
    """reference train/utilities.py:35-71."""
    if args.modality == "skeleton":
        return SkelModalityModel(
            skeleton_output_dim=dims.skeleton_output_dim,
            shared_out_channels=dims.shared_out_channels,
            backbone_dim=dims.backbone_dim,
            num_classes=dims.num_classes,
        )
    if args.modality == "sensor":
        return SensorModalityModel(
            sensor_out_channels=dims.sensor_out_channels,
            sensor_length=dims.sensor_length,
            pose_length=dims.pose_length,
            shared_out_channels=dims.shared_out_channels,
            backbone_dim=dims.backbone_dim,
            num_classes=dims.num_classes,
        )
    return MultiModalMultiTask(
        skeleton_output_dim=dims.skeleton_output_dim,
        sensor_out_channels=dims.sensor_out_channels,
        sensor_length=dims.sensor_length,
        pose_length=dims.pose_length,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
        use_norm=args.use_norm_and_cos,
        use_cosine=args.use_norm_and_cos,
        synchronized_loading=args.synchronized_loading,
    )


def fold_to_device(fold: FusionFold, modality: str) -> DeviceFoldData:
    if modality == "skeleton":
        tr, ev = (fold.train_pose,), (fold.eval_pose,)
        tp, epool = fold.train_pool[:, :1], fold.eval_pool[:, :1]
    elif modality == "sensor":
        tr, ev = (fold.train_sens,), (fold.eval_sens,)
        tp, epool = fold.train_pool[:, 1:], fold.eval_pool[:, 1:]
    else:
        tr = (fold.train_pose, fold.train_sens)
        ev = (fold.eval_pose, fold.eval_sens)
        tp, epool = fold.train_pool, fold.eval_pool
    return DeviceFoldData(
        xs=tuple(jnp.asarray(a.x) for a in tr),
        ys=tuple(jnp.asarray(a.y) for a in tr),
        train_pool=tp,
        eval_pool=epool,
        eval_xs=tuple(jnp.asarray(a.x) for a in ev),
        eval_ys=tuple(jnp.asarray(a.y) for a in ev),
    )


def train_one_fold(
    fold_idx: int,
    reader,
    args: FbgFogArgs,
    train_subj: Sequence[str],
    eval_subj: Sequence[str],
) -> Tuple[float, float, float]:
    """reference fbg_fog_train.py:269-404. Returns (skel_acc, sens_acc, best_avg)."""
    dataset = normalize_dataset_name(args.dataset)
    dims = FBG_FOG_DIMS[dataset]
    tp = FBG_FOG_TRAIN[dataset]
    epochs = args.epochs or tp.epochs
    batch_size = args.batch_size or tp.batch_size
    multimodal = args.modality == "multimodal"
    n_streams = 2 if multimodal else 1

    fold = build_fusion_fold(
        dataset, reader, train_subj, eval_subj,
        synchronized=args.synchronized_loading, seed=args.seed,
        pad_skel=dims.pose_length, pad_sens=dims.sensor_length,
        modality=args.modality,
    )
    data = fold_to_device(fold, args.modality)

    # per-branch class counts over the epoch's samples
    # (reference utilities get_branch_class_counts via a full loader pass)
    counts = []
    for k in range(n_streams):
        ys = np.asarray(data.ys[k])[data.train_pool[:, k]]
        counts.append(np.bincount(ys, minlength=dims.num_classes))

    aug_specs, aug_params = augment_config(
        args, dims.skeleton_input_dim, args.modality
    )
    settings = StepSettings(
        n_streams=n_streams,
        wm=args.wm,
        synchronized=args.synchronized_loading,
        ldam_s=args.ldam_s,
        gcl_m=args.gcl_m,
        gcl_s=args.gcl_s,
        noise_mul=args.noise_mul,
        drw_warmup=args.drw_warmup,
        consistency_lambda=args.consistency_lambda if multimodal else 0.0,
        private_grads="sum",
        augment=aug_specs,
    )
    ctx = make_loss_ctx(settings, counts, ldam_max_m=args.ldam_m,
                        aug_params=aug_params)

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
    sample_xs = tuple(x[:2] for x in data.xs)
    state, partition = init_train_state(model, tx, mtl, sample_xs, seed=args.seed)
    runner = EpochRunner(model.apply, tx, settings, mtl, partition, mesh=args.mesh)

    start_epoch = 0
    resume_meta = None
    if args.ckpt_dir and args.resume:
        from gaitpd.train.checkpoint import restore_fold_checkpoint

        restored = restore_fold_checkpoint(args.ckpt_dir, fold_idx, state)
        if restored is not None:
            state, meta = restored
            start_epoch = meta["epoch"] + 1
            resume_meta = meta
            print(f"[Fold {fold_idx}] resumed from epoch {start_epoch}")

    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    if args.verbose:
        print(f"Total params: {n_params:,}")

    rng = np.random.default_rng(args.seed + 1000 * fold_idx)
    key = jax.random.PRNGKey(args.seed + fold_idx)
    stopper = EarlyStopper(patience=tp.patience)
    if resume_meta is not None:
        stopper.best = resume_meta.get("best_metric", 0.0)
        stopper.no_improve = resume_meta.get("no_improve", 0)
        # fast-forward RNG streams for resume determinism
        for _ in range(start_epoch):
            rng.permutation(len(data.train_pool))
            key, _, _ = jax.random.split(key, 3)
    train_losses, val_losses = [], []

    for ep in range(start_epoch, epochs):
        state = state.replace(epoch=jnp.asarray(ep, jnp.int32))
        order = rng.permutation(len(data.train_pool))
        key, k_tr, k_ev = jax.random.split(key, 3)
        state, tr = run_train_epoch(runner, state, data, order, batch_size, k_tr, ctx)
        ev = run_eval_epoch(runner, state, data, batch_size, k_ev, ctx, collect=True)
        train_losses.append(float(tr.loss.mean()))
        val_losses.append(float(ev.loss.mean()))

        if multimodal and args.synchronized_loading:
            avg = ev.ens_acc
        elif multimodal:
            avg = float((ev.acc[0] + ev.acc[1]) / 2)
        else:
            avg = float(ev.acc[0])

        improved = stopper.update(avg, payload=ev)
        if args.ckpt_dir:
            from gaitpd.train.checkpoint import save_fold_checkpoint

            save_fold_checkpoint(
                args.ckpt_dir, fold_idx, state,
                best_metric=stopper.best, no_improve=stopper.no_improve,
            )
            if improved:
                save_fold_checkpoint(
                    args.ckpt_dir, fold_idx, state,
                    best_metric=stopper.best, latest=False,
                )
        if args.verbose:
            if multimodal and args.synchronized_loading:
                print(
                    f"[Fold {fold_idx}][Ep {ep+1}/{epochs}] "
                    f"Train loss={tr.loss.mean():.3f} | "
                    f"Eval loss={ev.loss.mean():.3f} ens_acc={avg:.1f}%"
                )
            else:
                accs = list(tr.acc) + [0.0] * (2 - len(tr.acc))
                eaccs = list(ev.acc) + [0.0] * (2 - len(ev.acc))
                print(
                    f"[Fold {fold_idx}][Ep {ep+1}/{epochs}] "
                    f"Train loss={tr.loss.mean():.3f} skel={accs[0]:.1f}% sen={accs[-1]:.1f}% | "
                    f"Eval loss={ev.loss.mean():.3f} skel={eaccs[0]:.1f}% sen={eaccs[-1]:.1f}% "
                    f"avg={avg:.1f}%"
                )
        if not improved and stopper.stop:
            print(f"[Fold {fold_idx}] Early stopping at epoch {ep+1}")
            break

    if args.save_loss_plots:
        # reference train/utilities.py:205-224 behind --save_loss_plots
        M.save_loss_curve(
            "loss_plots", fold_idx, train_losses, val_losses,
            tag=f"{dataset}_{args.modality}_{args.wm}_loss_curve",
        )

    best = stopper.best_payload
    if best is None:
        return 0.0, 0.0, 0.0

    def _acc(i):
        return M.accuracy(best.preds[i], best.trues[i])

    if args.modality == "skeleton":
        sk_acc, se_acc = _acc(0), 0.0
    elif args.modality == "sensor":
        sk_acc, se_acc = 0.0, _acc(0)
    else:
        sk_acc, se_acc = _acc(0), _acc(1)

    if args.verbose:
        if multimodal and args.synchronized_loading:
            print(f"\n*** Fold {fold_idx} Best Ensemble Acc: {stopper.best:.2f}% ***\n")
        else:
            print(
                f"\n*** Fold {fold_idx} Best skel={sk_acc:.2f}% sens={se_acc:.2f}%, "
                f"avg={stopper.best:.2f}% ***\n"
            )
        if args.modality in ("multimodal", "skeleton"):
            M.print_report(best.trues[0], best.preds[0], "Best Skeleton")
        if args.modality in ("multimodal", "sensor"):
            i = 0 if args.modality == "sensor" else 1
            M.print_report(best.trues[i], best.preds[i], "Best Sensor")
        if multimodal and args.synchronized_loading:
            M.print_report(best.trues[0], best.preds_ens, "Best Ensemble")

    return sk_acc, se_acc, float(stopper.best)


def get_reader(args: FbgFogArgs):
    dataset = normalize_dataset_name(args.dataset)
    if args.synthetic:
        from gaitpd.data import synthetic

        if dataset == "fbg":
            return synthetic.make_fbg_reader(
                seed=args.seed, strength=args.synthetic_strength,
                pose_per_joint=args.synthetic_pose_per_joint,
            )
        return synthetic.make_fog_reader(
            seed=args.seed, strength=args.synthetic_strength,
            pose_per_joint=args.synthetic_pose_per_joint,
        )
    from gaitpd.data.cache import load_reader

    return load_reader(dataset, rebuild=args.rebuild_cache)


def main(args: FbgFogArgs):
    """reference fbg_fog_train.py:410-436."""
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
        args = dataclasses.replace(args, modality=mod)
        print(f"\n>>> MODE: {mod.upper()} <<<")
        results = []
        for idx, (t, e) in enumerate(folds, 1):
            print(f"\nFold {idx}: train={t}, eval={e}")
            results.append(train_one_fold(idx, reader, args, t, e))
        arr = np.asarray(results)
        mean_sk, mean_se, mean_av = arr.mean(axis=0)
        if mod == "multimodal" and args.synchronized_loading:
            print(f"mean Ensemble Acc: {mean_av:.2f}%")
        else:
            print(f"mean skel={mean_sk:.2f}%, sensor={mean_se:.2f}%, avg={mean_av:.2f}%")
        summary[mod] = dict(skel=mean_sk, sensor=mean_se, avg=mean_av)
    return summary
