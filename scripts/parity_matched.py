"""Matched-EVERYTHING flagship parity: same init, same batches, same folds.

VERDICT r3 item 6. The 32-seed flagship GCL row shows a small consistent
gaitpd edge (+2.72 [+0.3, +5.1]); the attribution chain (CAGrad ablation:
edge persists without CAGrad; FOCAL-analogue one-step gradients match to
1e-8 under weight transplant) points at init draws and data order — the two
documented distribution-matched non-goals — not at step math. This harness
makes the attribution DIRECT instead of inferred:

  1. The torch reference driver (`/root/reference/train/fbg_fog_train.py`
     train_one_fold :269-404) runs NATIVELY on the shared synthetic reader,
     with two instruments attached:
       - its model init is OVERWRITTEN by a transplant of the gaitpd flax
         init (same machinery as tests/test_forward_parity.py), and
       - its DataLoaders are wrapped so every consumed batch (the
         get_branch_class_counts pass, every train epoch's batches in
         order, every eval pass) is recorded as numpy.
  2. The gaitpd step (`gaitpd/train/step.py`, flagship StepSettings:
     wm=gcl + cosine heads + CAGrad c=0.1, async) then trains FROM THE SAME
     INIT consuming EXACTLY the recorded batch stream — same class counts,
     same per-epoch batch composition and order, same eval batches, same
     best-epoch selection rule (avg of branch accs, fbg_fog_train.py:347-350).

With init, data order, and (previously proven) per-step math all matched,
per-seed outcomes should agree to float noise; any residual systematic gap
would be a real step-level difference. Run:

  python scripts/parity_matched.py --epochs 25 --seeds 0 1 2 3 4 5 6 7
"""

from __future__ import annotations

import argparse
import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).parent))


# --------------------------------------------------------------------------
# flax -> torch transplant (mirrors tests/test_forward_parity.py:35-51)
# --------------------------------------------------------------------------

def _transplant(ref_model, variables):
    import torch

    def t_(x):
        # MUST copy: torch.from_numpy(np.asarray(jax_array)) aliases the jax
        # buffer for leaves loaded without .contiguous() (biases, LN params),
        # and the torch optimizer then mutates the flax init IN PLACE during
        # the native reference run — silently warm-starting the gaitpd side
        # with torch-trained values (this bug produced a spurious +3.8
        # "matched" gap in round 4 before being caught).
        return torch.from_numpy(np.asarray(x).copy())

    def load_linear(mod, p):
        d = p["Dense_0"]
        mod.weight.data = t_(d["kernel"]).T.contiguous()
        if "bias" in d:
            mod.bias.data = t_(d["bias"])

    def load_conv(mod, p):
        c = p["Conv_0"]
        mod.weight.data = t_(c["kernel"]).permute(2, 1, 0).contiguous()
        mod.bias.data = t_(c["bias"])

    def load_ln(mod, p):
        mod.weight.data = t_(p["scale"])
        mod.bias.data = t_(p["bias"])

    def load_head(mod, p):
        # use_norm_and_cos head: LayerNorm + CosineLinear (weight (C,D) in
        # torch, (D,C) in flax — reference feature_encoder.py:7-24,129-132)
        load_ln(mod.norm, p["LayerNorm_0"])
        mod.fc.weight.data = t_(p["CosineLinear_0"]["weight"]).T.contiguous()

    p = variables["params"]
    load_linear(ref_model.skeleton_encoder.fc1, p["skeleton_encoder"]["TorchLinear_0"])
    load_ln(ref_model.skeleton_encoder.ln1, p["skeleton_encoder"]["LayerNorm_0"])
    load_conv(ref_model.sensor_encoder.conv1d, p["sensor_encoder"]["Conv1dSame_0"])
    load_conv(ref_model.backbone.conv1d, p["backbone"]["Conv1dSame_0"])
    load_head(ref_model.task_head_skel, p["task_head_skel"])
    load_head(ref_model.task_head_sensor, p["task_head_sensor"])
    return ref_model


# --------------------------------------------------------------------------
# recording DataLoader wrapper
# --------------------------------------------------------------------------

class RecordingLoader:
    """Tees every batch consumed from a torch DataLoader into numpy passes.
    Each full iteration becomes one entry of .passes (the reference consumes
    the train loader once for get_branch_class_counts, then once per epoch,
    fbg_fog_train.py:292,308)."""

    def __init__(self, loader):
        self.loader = loader
        self.passes = []

    def __len__(self):
        return len(self.loader)

    def __iter__(self):
        import torch

        cur = []
        self.passes.append(cur)
        for batch in self.loader:
            cur.append({
                k: (v.numpy().copy() if torch.is_tensor(v) else v)
                for k, v in batch.items()
            })
            yield batch


def _transplant_skel(ref_model, variables):
    """flax SkelModalityModel -> reference SkelModalityModel
    (feature_encoder.py:308-344: encoder fc1+ln1, shared backbone conv,
    TaskHead LayerNorm+Linear)."""
    import torch

    def t_(x):
        return torch.from_numpy(np.asarray(x).copy())

    p = variables["params"]
    d = p["encoder"]["TorchLinear_0"]["Dense_0"]
    ref_model.encoder.fc1.weight.data = t_(d["kernel"]).T.contiguous()
    ref_model.encoder.fc1.bias.data = t_(d["bias"])
    ln = p["encoder"]["LayerNorm_0"]
    ref_model.encoder.ln1.weight.data = t_(ln["scale"])
    ref_model.encoder.ln1.bias.data = t_(ln["bias"])
    c = p["backbone"]["Conv1dSame_0"]["Conv_0"]
    ref_model.backbone.conv1d.weight.data = t_(c["kernel"]).permute(2, 1, 0).contiguous()
    ref_model.backbone.conv1d.bias.data = t_(c["bias"])
    hn = p["task_head"]["LayerNorm_0"]
    ref_model.task_head.norm.weight.data = t_(hn["scale"])
    ref_model.task_head.norm.bias.data = t_(hn["bias"])
    hd = p["task_head"]["TorchLinear_0"]["Dense_0"]
    ref_model.task_head.fc.weight.data = t_(hd["kernel"]).T.contiguous()
    ref_model.task_head.fc.bias.data = t_(hd["bias"])
    return ref_model


def _init_gaitpd_model(modality, dims, seed, fold_idx):
    import jax
    import jax.numpy as jnp

    from gaitpd.models.multitask import MultiModalMultiTask, SkelModalityModel

    key = jax.random.PRNGKey(seed + 7919 * fold_idx)
    if modality == "skeleton":
        fmodel = SkelModalityModel(
            skeleton_output_dim=dims.skeleton_output_dim,
            shared_out_channels=dims.shared_out_channels,
            backbone_dim=dims.backbone_dim,
            num_classes=dims.num_classes,
        )
        variables = fmodel.init(
            key, jnp.zeros((2, dims.pose_length, 21), jnp.float32)
        )
        return fmodel, variables
    fmodel = MultiModalMultiTask(
        skeleton_output_dim=dims.skeleton_output_dim,
        sensor_out_channels=dims.sensor_out_channels,
        sensor_length=dims.sensor_length,
        pose_length=dims.pose_length,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
        use_norm=True, use_cosine=True,
        synchronized_loading=False,
    )
    variables = fmodel.init(
        key,
        jnp.zeros((2, dims.pose_length, 21), jnp.float32),
        jnp.zeros((2, dims.sensor_length, dims.sensor_out_channels), jnp.float32),
    )
    return fmodel, variables


def run_reference_instrumented(reader, seed, epochs, folds, alpha=0.1,
                               modality="multimodal", wm="gcl",
                               transplant=True):
    """Run the reference's train_one_fold natively per fold with transplanted
    init + recording loaders. Returns per-fold (best_avg, recorded streams,
    init variables).

    transplant=False keeps the reference's own torch init (the recording
    instruments stay attached) — the harness-neutrality control and the
    'own init, own order' cell of the init-stream swap
    (scripts/parity_initswap.py)."""
    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF))
    import torch

    torch.set_num_threads(1)
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor

    import fbg_fog_train as ref_driver
    import utilities as ref_utils
    try:
        from configs import FBG_FOG_PARAMS
    except ImportError:
        from train.configs import FBG_FOG_PARAMS
    FBG_FOG_PARAMS["fog"]["epochs"] = epochs

    import types

    from gaitpd.config import FBG_FOG_DIMS

    dims = FBG_FOG_DIMS["fog"]

    cos = modality == "multimodal" and wm == "gcl"
    args = types.SimpleNamespace(
        dataset="fog", modality=modality, consistency_lambda=1.0,
        wm=wm, synchronized_loading=False, alpha=alpha, max_norm=1.0,
        ldam_s=30.0, ldam_m=0.5, gcl_m=0.2, gcl_s=25.0, noise_mul=0.0,
        drw_warmup=0, use_norm_and_cos=cos, save_loss_plots=False,
        seed=seed,
    )

    orig_loaders = ref_driver.create_fusion_loaders
    orig_choose = ref_driver.choose_model
    results = []
    try:
        for fold_idx, (t, e) in enumerate(folds, 1):
            rec = {"train": None, "eval": None, "variables": None}

            def create_loaders(*a, **kw):
                kw["num_workers"] = 0
                tr, ev = orig_loaders(*a, **kw)
                rec["train"] = RecordingLoader(tr)
                rec["eval"] = RecordingLoader(ev)
                return rec["train"], rec["eval"]

            def choose_transplanted(cargs, params, device):
                model = orig_choose(cargs, params, device)
                if not transplant:
                    return model
                # gaitpd init for this (seed, fold): the SAME variables feed
                # the gaitpd side below
                _, variables = _init_gaitpd_model(modality, dims, seed, fold_idx)
                rec["variables"] = variables
                if modality == "skeleton":
                    return _transplant_skel(model, variables)
                return _transplant(model, variables)

            ref_driver.create_fusion_loaders = create_loaders
            ref_driver.choose_model = choose_transplanted
            ref_utils.set_random_seed(seed)
            buf = io.StringIO()
            with redirect_stdout(buf):
                sk, se, best_avg = ref_driver.train_one_fold(
                    fold_idx, reader, args, t, e
                )
            results.append({
                "best_avg": float(best_avg),
                "train_passes": rec["train"].passes,
                "eval_passes": rec["eval"].passes,
                "variables": rec["variables"],
            })
    finally:
        ref_driver.create_fusion_loaders = orig_loaders
        ref_driver.choose_model = orig_choose
    return results


# --------------------------------------------------------------------------
# gaitpd side: step-level training on the recorded stream
# --------------------------------------------------------------------------

def run_gaitpd_on_stream(fold_rec, epochs, alpha=0.1):
    import jax
    import jax.numpy as jnp

    from gaitpd.config import FBG_FOG_DIMS
    from gaitpd.learning.mtl import build_flat_partition, make_method
    from gaitpd.models.multitask import MultiModalMultiTask
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings,
        TrainState,
        make_apply_adapters,
        make_loss_ctx,
        make_train_step,
    )

    dims = FBG_FOG_DIMS["fog"]
    model = MultiModalMultiTask(
        skeleton_output_dim=dims.skeleton_output_dim,
        sensor_out_channels=dims.sensor_out_channels,
        sensor_length=dims.sensor_length,
        pose_length=dims.pose_length,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
        use_norm=True, use_cosine=True, synchronized_loading=False,
    )
    variables = fold_rec["variables"]

    def flatten_skel(x):
        # reference training_common.py:43-49: (B,T,J,C) -> (B,T,J*C)
        x = np.asarray(x, np.float32)
        return x.reshape(x.shape[0], x.shape[1], -1)

    def unpack(b):
        xs = (
            jnp.asarray(flatten_skel(b["skeleton"])),
            jnp.asarray(np.asarray(b["sensor"], np.float32)),
        )
        ys = (
            jnp.asarray(np.asarray(b["label_skeleton"]), jnp.int32),
            jnp.asarray(np.asarray(b["label_sensor"]), jnp.int32),
        )
        return xs, ys

    # class counts exactly as the reference computed them: from the FIRST
    # recorded pass (get_branch_class_counts, fbg_fog_train.py:292)
    counts_pass = fold_rec["train_passes"][0]
    sk_counts = np.zeros(dims.num_classes, np.int64)
    se_counts = np.zeros(dims.num_classes, np.int64)
    for b in counts_pass:
        sk_counts += np.bincount(
            np.asarray(b["label_skeleton"]).ravel(), minlength=dims.num_classes
        )
        se_counts += np.bincount(
            np.asarray(b["label_sensor"]).ravel(), minlength=dims.num_classes
        )

    settings = StepSettings(
        n_streams=2, wm="gcl", synchronized=False, gcl_m=0.2, gcl_s=25.0,
        noise_mul=0.0, drw_warmup=0, consistency_lambda=1.0,
        private_grads="sum",
    )
    ctx = make_loss_ctx(settings, [sk_counts, se_counts])
    tx = sgd_torch(1e-3, 0.9, 1e-4)
    mtl = partition = None
    if alpha > 0:
        mtl = make_method("cagrad", 2, c=alpha, max_norm=1.0)
        bound = model.bind(variables)
        partition = build_flat_partition(
            variables, bound.shared_modules, bound.task_modules
        )
    state = TrainState(
        params=variables, opt_state=tx.init(variables),
        mtl_state=mtl.init_state() if mtl is not None else {},
        epoch=jnp.zeros((), jnp.int32),
    )
    train_apply, eval_apply = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(train_apply, tx, settings, mtl, partition))
    eval_jit = jax.jit(lambda v, xs: eval_apply(v, xs, 0))

    train_epochs = fold_rec["train_passes"][1:]
    assert len(train_epochs) == epochs, (len(train_epochs), epochs)
    best_avg = 0.0
    key = jax.random.PRNGKey(0)  # noise_mul=0: the loss rng is inert
    for ep, batches in enumerate(train_epochs):
        state = state.replace(epoch=jnp.asarray(ep, jnp.int32))
        for b in batches:
            xs, ys = unpack(b)
            batch = {"xs": xs, "ys": ys,
                     "valid": jnp.ones((xs[0].shape[0],), jnp.float32)}
            key, k = jax.random.split(key)
            state, _ = step(state, batch, k, ctx)
        # eval with the reference's recorded eval pass for this epoch
        ev = fold_rec["eval_passes"][ep] if ep < len(fold_rec["eval_passes"]) \
            else fold_rec["eval_passes"][-1]
        corr = np.zeros(2)
        tot = np.zeros(2)
        for b in ev:
            xs, ys = unpack(b)
            lg = eval_jit(state.params, xs)
            for i in range(2):
                corr[i] += int((np.argmax(np.asarray(lg[i]), -1) == np.asarray(ys[i])).sum())
                tot[i] += ys[i].shape[0]
        vsk, vse = 100.0 * corr / np.maximum(tot, 1)
        avg = (vsk + vse) / 2
        if avg > best_avg:
            best_avg = float(avg)
    return best_avg


def run_gaitpd_on_stream_skel(fold_rec, epochs):
    """Skeleton-only replay: mirror the gaitpd driver's single-modality path
    (fbg_fog_driver.train_one_fold: StepSettings n_streams=1, wm=ce, pooled
    eval accuracy, strict-> best selection)."""
    import jax
    import jax.numpy as jnp

    from gaitpd.config import FBG_FOG_DIMS, FBG_FOG_TRAIN
    from gaitpd.models.multitask import SkelModalityModel
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings,
        TrainState,
        make_apply_adapters,
        make_loss_ctx,
        make_train_step,
    )

    dims = FBG_FOG_DIMS["fog"]
    tp = FBG_FOG_TRAIN["fog"]
    model = SkelModalityModel(
        skeleton_output_dim=dims.skeleton_output_dim,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
    )
    variables = fold_rec["variables"]

    def flatten_skel(x):
        x = np.asarray(x, np.float32)
        return x.reshape(x.shape[0], x.shape[1], -1)

    def unpack(b):
        xs = (jnp.asarray(flatten_skel(b["skeleton"])),)
        ys = (jnp.asarray(np.asarray(b["label_skeleton"]), jnp.int32),)
        return xs, ys

    counts_pass = fold_rec["train_passes"][0]
    sk_counts = np.zeros(dims.num_classes, np.int64)
    for b in counts_pass:
        sk_counts += np.bincount(
            np.asarray(b["label_skeleton"]).ravel(), minlength=dims.num_classes
        )

    settings = StepSettings(n_streams=1, wm="ce", synchronized=False,
                            private_grads="sum")
    ctx = make_loss_ctx(settings, [sk_counts])
    tx = sgd_torch(tp.learning_rate, tp.momentum, tp.weight_decay)
    state = TrainState(params=variables, opt_state=tx.init(variables),
                       mtl_state={}, epoch=jnp.zeros((), jnp.int32))
    train_apply, eval_apply = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(train_apply, tx, settings, None, None))
    eval_jit = jax.jit(lambda v, xs: eval_apply(v, xs, 0))

    train_epochs = fold_rec["train_passes"][1:]
    assert len(train_epochs) == epochs, (len(train_epochs), epochs)
    best = 0.0
    key = jax.random.PRNGKey(0)
    for ep, batches in enumerate(train_epochs):
        state = state.replace(epoch=jnp.asarray(ep, jnp.int32))
        for b in batches:
            xs, ys = unpack(b)
            batch = {"xs": xs, "ys": ys,
                     "valid": jnp.ones((xs[0].shape[0],), jnp.float32)}
            key, k = jax.random.split(key)
            state, _ = step(state, batch, k, ctx)
        ev = fold_rec["eval_passes"][ep] if ep < len(fold_rec["eval_passes"]) \
            else fold_rec["eval_passes"][-1]
        corr = tot = 0.0
        for b in ev:
            xs, ys = unpack(b)
            lg = eval_jit(state.params, xs)
            if isinstance(lg, (tuple, list)):
                lg = lg[0]
            corr += float((np.argmax(np.asarray(lg), -1) == np.asarray(ys[0])).sum())
            tot += ys[0].shape[0]
        acc = 100.0 * corr / max(tot, 1.0)
        if acc > best:
            best = float(acc)
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--seeds", nargs="+", type=int, default=list(range(8)))
    p.add_argument("--strength", type=float, default=0.6)
    p.add_argument("--alpha", type=float, default=0.1,
                   help="CAGrad c; 0 disables CAGrad on BOTH sides (mean of "
                        "branch losses) — isolates the in-graph-QP-vs-scipy "
                        "difference from the rest of the matched step")
    p.add_argument("--modality", default="multimodal",
                   choices=["multimodal", "skeleton"],
                   help="skeleton: the single-branch sub-driver (wm forced "
                        "to ce, CAGrad off — reference utilities.py:35-71)")
    p.add_argument("--pose_per_joint", action="store_true",
                   help="per-class per-joint gains on the synthetic pose "
                        "signal so it survives the reference's root-joint "
                        "centering (see gaitpd/data/synthetic.py::_signal)")
    p.add_argument("--out", default="artifacts/parity/parity_matched_report.json")
    ns = p.parse_args()

    from gaitpd.data.synthetic import make_fog_reader

    sys.path.insert(0, str(REF / "train"))
    import utilities as ref_utils

    from parity_check import paired_stats

    skel = ns.modality == "skeleton"
    wm = "ce" if skel else "gcl"
    if skel:
        ns.alpha = 0.0  # single-modality path: plain loss.backward()
    cfg_name = ("skeleton_ce" if skel else "multimodal_gcl_cagrad") \
        + " matched-init matched-order"
    report = {"epochs": ns.epochs, "strength": ns.strength,
              "alpha": ns.alpha, "modality": ns.modality,
              "pose_per_joint": ns.pose_per_joint,
              "config": cfg_name,
              "seeds": {}}
    out_path = Path(ns.out)
    if out_path.exists():
        prev = json.loads(out_path.read_text())
        if (prev.get("epochs") == ns.epochs
                and prev.get("strength") == ns.strength
                and prev.get("alpha", 0.1) == ns.alpha
                and prev.get("modality", "multimodal") == ns.modality
                and prev.get("pose_per_joint", False) == ns.pose_per_joint):
            report["seeds"] = dict(prev.get("seeds", {}))
            print(f"[merge] {len(report['seeds'])} seeds present", flush=True)

    for seed in ns.seeds:
        if str(seed) in report["seeds"]:
            print(f"[merge] seed {seed} done, skipping", flush=True)
            continue
        reader = make_fog_reader(seed=seed, strength=ns.strength,
                                 pose_per_joint=ns.pose_per_joint)
        folds = ref_utils.generate_class_stratified_folds(reader, "fog")
        print(f"=== seed {seed}: reference (instrumented, {len(folds)} folds) ===",
              flush=True)
        ref_folds = run_reference_instrumented(reader, seed, ns.epochs, folds,
                                               alpha=ns.alpha,
                                               modality=ns.modality, wm=wm)
        print(f"=== seed {seed}: gaitpd on the recorded stream ===", flush=True)
        ours, refs = [], []
        for fr in ref_folds:
            if skel:
                ours.append(run_gaitpd_on_stream_skel(fr, ns.epochs))
            else:
                ours.append(run_gaitpd_on_stream(fr, ns.epochs, alpha=ns.alpha))
            refs.append(fr["best_avg"])
        report["seeds"][str(seed)] = {
            "gaitpd_folds": ours, "reference_folds": refs,
            "gaitpd": float(np.mean(ours)), "reference": float(np.mean(refs)),
        }
        print(f"[seed {seed}] gaitpd={np.mean(ours):.2f}% "
              f"reference={np.mean(refs):.2f}% "
              f"(per-fold gaps: "
              f"{[round(a - b, 2) for a, b in zip(ours, refs)]})", flush=True)
        out_path.write_text(json.dumps(report, indent=1))

    g = [v["gaitpd"] for v in report["seeds"].values()]
    r = [v["reference"] for v in report["seeds"].values()]
    fold_gaps = [a - b for v in report["seeds"].values()
                 for a, b in zip(v["gaitpd_folds"], v["reference_folds"])]
    report["summary"] = {
        "gaitpd_mean": float(np.mean(g)),
        "reference_mean": float(np.mean(r)),
        "gap": float(np.mean(g) - np.mean(r)),
        "stats": paired_stats(g, r),
        "n_folds": len(fold_gaps),
        "fold_gap_abs_mean": float(np.mean(np.abs(fold_gaps))),
        "fold_gaps_exactly_zero": int(sum(abs(x) < 1e-9 for x in fold_gaps)),
    }
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps(report["summary"], indent=1))


if __name__ == "__main__":
    main()
