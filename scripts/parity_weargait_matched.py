"""Matched-EVERYTHING WearGait sync parity: same init, same batches, folds.

The two WearGait watch rows from the round-3 verdict are both on the SYNC
path: the full-driver class_wt row (+4.16 [-1.7,+10.1] at 32 seeds,
`parity_weargait_s32_report.json`) and the tie-free-GCL W-only per-mask row
(+4.09 [-0.24,+8.41], `parity_weargait_permask.json`). Both CIs straddle
zero but are the loosest in the matrix. This harness applies the
round-4 matched-init/matched-order technique (scripts/parity_matched.py,
which proved the FoG flagship gap is RNG lottery with 24/24 exactly-equal
folds) to the WearGait sync driver:

  1. The torch reference `weargait_train.run_cv` (:533-645) runs NATIVELY on
     the materialised synthetic layout with two instruments attached:
       - `build_model` is wrapped so the freshly built WearGaitThreeModal's
         init is OVERWRITTEN by a transplant of a gaitpd flax init (same
         recipe as tests/test_forward_parity.py:93-127, plus the sync-mode
         shared head, weargait_encoders.py:133-136), and
       - `make_loaders` wraps both loaders so every consumed pass (the
         class-count pass of build_criteria_and_cagrad :132-152, the
         per-epoch DRW count passes for wm=gcl :526-530, every train epoch,
         every eval epoch, the 7 masked-eval passes :612-622) is recorded
         as numpy in consumption order.
  2. The gaitpd step machinery (gaitpd/train/step.py, the same StepSettings
     the driver's run_fold uses: 3 streams, synchronized, CAGrad c=0.5 on
     shared with private_grads="sum_plus_own") trains FROM THE SAME INIT
     consuming EXACTLY the recorded train-pass stream, evaluates with the
     recorded eval passes (pooled softmax-ensemble selection,
     weargait_train.py:337-351,593), and reruns the 7-mask relaxed-input
     eval (:384-433) from its own best params.

With init, batch order, and per-step math all matched, per-fold best-ens
accuracies AND all 7 per-mask scores should agree exactly; any residual
systematic gap would be a real step-level difference. Run:

  python scripts/parity_weargait_matched.py --wm class_wt --seeds 0 1 2 3
  python scripts/parity_weargait_matched.py --wm gcl --tie_free --seeds ...
"""

from __future__ import annotations

import argparse
import io
import json
import re
import sys
import tempfile
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).parent))

MASK_KEYS = ["W", "I", "M", "W+I", "W+M", "I+M", "W+I+M"]
MASK_TUPS = {
    "W": (1, 0, 0), "I": (0, 1, 0), "M": (0, 0, 1),
    "W+I": (1, 1, 0), "W+M": (1, 0, 1), "I+M": (0, 1, 1), "W+I+M": (1, 1, 1),
}


# --------------------------------------------------------------------------
# flax -> torch transplant (recipe: tests/test_forward_parity.py:93-127)
# --------------------------------------------------------------------------

def _transplant(ref_model, variables, sync: bool):
    import torch

    def t_(x):
        # MUST copy — torch trains in place on tensors that would otherwise
        # alias the flax init buffers (see parity_matched.py::_transplant).
        return torch.from_numpy(np.asarray(x).copy())

    def load_conv(mod, p):
        c = p["Conv_0"]
        mod.weight.data = t_(c["kernel"]).permute(2, 1, 0).contiguous()
        mod.bias.data = t_(c["bias"])

    def load_ln(mod, p):
        mod.weight.data = t_(p["scale"])
        mod.bias.data = t_(p["bias"])

    def load_linear(mod, p):
        d = p["Dense_0"]
        mod.weight.data = t_(d["kernel"]).T.contiguous()
        if "bias" in d:
            mod.bias.data = t_(d["bias"])

    p = variables["params"]
    load_conv(ref_model.enc_w.conv, p["enc_w"]["Conv1dSame_0"])
    load_ln(ref_model.enc_w.ln, p["enc_w"]["LayerNorm_0"])
    load_conv(ref_model.enc_i.conv1, p["enc_i"]["Conv1dSame_0"])
    load_conv(ref_model.enc_i.conv2, p["enc_i"]["Conv1dSame_1"])
    load_conv(ref_model.enc_i.skip, p["enc_i"]["Conv1dSame_2"])
    load_ln(ref_model.enc_i.ln2, p["enc_i"]["LayerNorm_0"])
    load_conv(ref_model.enc_m.conv, p["enc_m"]["Conv1dSame_0"])
    load_ln(ref_model.enc_m.ln, p["enc_m"]["LayerNorm_0"])
    load_conv(ref_model.backbone.conv, p["backbone"]["Conv1dSame_0"])
    if sync:
        # one shared head on both sides (weargait_encoders.py:133-136 aliases
        # head_w/head_i/head_m to _shared_head; gaitpd names it head_shared)
        load_linear(ref_model._shared_head.fc, p["head_shared"]["TorchLinear_0"])
    else:
        load_linear(ref_model.head_w.fc, p["head_w"]["TorchLinear_0"])
        load_linear(ref_model.head_i.fc, p["head_i"]["TorchLinear_0"])
        load_linear(ref_model.head_m.fc, p["head_m"]["TorchLinear_0"])
    return ref_model


# --------------------------------------------------------------------------
# recording DataLoader wrapper (nested sync batches: xs list + y tensor)
# --------------------------------------------------------------------------

def _to_np(x):
    import torch

    if torch.is_tensor(x):
        return x.numpy().copy()
    if isinstance(x, dict):
        return {k: _to_np(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_to_np(v) for v in x]
    return x


class RecordingLoader:
    def __init__(self, loader):
        self.loader = loader
        self.passes = []

    def __len__(self):
        return len(self.loader)

    @property
    def dataset(self):
        # run_cv reseeds the async dataset per epoch through
        # tr_loader.dataset.reseed (weargait_train.py:573-574) — proxy it
        return self.loader.dataset

    def __iter__(self):
        cur = []
        self.passes.append(cur)
        for batch in self.loader:
            cur.append({k: _to_np(v) for k, v in batch.items() if k != "keys"})
            yield batch


# --------------------------------------------------------------------------
# instrumented reference run (one seed, all folds via wt.run_cv)
# --------------------------------------------------------------------------

def run_reference_instrumented(streams, pd_ids, hc_ids, seed, ns, workdir):
    from parity_weargait import materialize_reference_layout, ref_args

    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF))
    import torch

    torch.set_num_threads(1)
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor
    import pandas as pd

    # writable-to_numpy shim for pandas>=3 (see parity_weargait.py:103-117)
    if not getattr(pd.Series.to_numpy, "_gaitpd_writable", False):
        _orig_to_numpy = pd.Series.to_numpy

        def _to_numpy_writable(self, *a, **k):
            x = _orig_to_numpy(self, *a, **k)
            if isinstance(x, np.ndarray) and not x.flags.writeable:
                x = x.copy()
            return x

        _to_numpy_writable._gaitpd_writable = True
        pd.Series.to_numpy = _to_numpy_writable

    import weargait_train as wt

    import jax
    import jax.numpy as jnp

    from gaitpd.models.multitask import WearGaitThreeModal

    out, pd_dir, hc_dir = materialize_reference_layout(
        streams, pd_ids, hc_ids, workdir
    )
    wt.pd_path = str(pd_dir)
    wt.hc_path = str(hc_dir)
    wt.output_dir = str(out)

    fold_records = []
    orig_make_loaders = wt.make_loaders
    orig_build_model = wt.build_model
    orig_ewm = wt.eval_with_mask
    orig_eoe = wt.eval_one_epoch

    def make_loaders_hook(prep, subj2label, cargs):
        (tr, te), async_mode = orig_make_loaders(prep, subj2label, cargs)
        rec = {"train": RecordingLoader(tr), "eval": RecordingLoader(te),
               "variables": None, "masks": {}, "ens_hist": []}
        fold_records.append(rec)
        return (rec["train"], rec["eval"]), async_mode

    def eoe_hook(model, loader, async_mode, criterions):
        r = orig_eoe(model, loader, async_mode, criterions)
        # full-precision per-epoch selection metric (the printed "Best
        # macro acc" line is rounded to 2 decimals): sync = pooled softmax
        # ensemble; async = mean of the three per-mod batch-mean accs
        # (weargait_train.py:593)
        metric = float(np.mean(r[1])) if async_mode else float(r[2])
        fold_records[-1]["ens_hist"].append(metric)
        return r

    def build_model_hook(cargs, sync_flag):
        model = orig_build_model(cargs, sync_flag)
        fmodel = WearGaitThreeModal(synchronized=sync_flag)
        variables = fmodel.init(
            jax.random.PRNGKey(seed + 7919 * len(fold_records)),
            jnp.zeros((2, 64, 2), jnp.float32),
            jnp.zeros((2, 64, 13), jnp.float32),
            jnp.zeros((2, 64, 24), jnp.float32),
        )
        fold_records[-1]["variables"] = variables
        return _transplant(model, variables, sync_flag)

    def ewm_hook(model, loader, async_mode, mask, verbose=False):
        r = orig_ewm(model, loader, async_mode, mask, verbose)
        if isinstance(mask, str):
            # sync: pooled ensemble acc (float); async: run_cv records
            # macro_enabled (weargait_train.py:617-621)
            fold_records[-1]["masks"][mask] = (
                float(r) if not async_mode else float(r["macro_enabled"])
            )
        return r

    args = ref_args(seed, ns.epochs, ns.n_folds, ns.per_class,
                    async_loading=ns.async_loading, wm=ns.wm)
    buf = io.StringIO()
    try:
        wt.make_loaders = make_loaders_hook
        wt.build_model = build_model_hook
        wt.eval_with_mask = ewm_hook
        wt.eval_one_epoch = eoe_hook
        with redirect_stdout(buf):
            wt.run_cv(args)
    finally:
        wt.make_loaders = orig_make_loaders
        wt.build_model = orig_build_model
        wt.eval_with_mask = orig_ewm
        wt.eval_one_epoch = orig_eoe

    # per-fold best ensemble accuracy: same strict-> rule as the driver
    # (weargait_train.py:593-596), from the full-precision recorded history;
    # cross-check the count against the driver's own printed report lines
    printed = re.findall(r"Best macro acc: ([0-9.]+)%", buf.getvalue())
    assert len(printed) == len(fold_records), (len(printed), len(fold_records))
    for rec, pr in zip(fold_records, printed):
        rec["best_macro"] = max(rec["ens_hist"], default=0.0)
        assert abs(rec["best_macro"] - float(pr)) < 0.005 + 1e-9, \
            (rec["best_macro"], pr)
    return fold_records


# --------------------------------------------------------------------------
# gaitpd replay: train on the recorded stream with the driver's step config
# --------------------------------------------------------------------------

def replay_fold(rec, ns):
    import jax
    import jax.numpy as jnp

    from gaitpd.learning.mtl import build_flat_partition, make_method
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings,
        TrainState,
        make_apply_adapters,
        make_eval_step,
        make_loss_ctx,
        make_train_step,
    )

    async_mode = ns.async_loading
    model = WearGaitThreeModal(synchronized=not async_mode)
    variables = rec["variables"]

    # class counts exactly as the reference computed them: from the FIRST
    # recorded train pass (build_criteria_and_cagrad, weargait_train.py:133)
    mods = ("walkway", "insole", "imu")
    if async_mode:
        counts3 = []
        for m in mods:
            c = np.zeros(2, np.int64)
            for b in rec["train"].passes[0]:
                c += np.bincount(np.asarray(b["y"][m]).ravel(), minlength=2)
            counts3.append(c)
    else:
        c = np.zeros(2, np.int64)
        for b in rec["train"].passes[0]:
            c += np.bincount(np.asarray(b["y"]).ravel(), minlength=2)
        counts3 = [c, c, c]

    settings = StepSettings(
        n_streams=3, wm=ns.wm, synchronized=not async_mode,
        gcl_m=0.2, gcl_s=25.0, noise_mul=0.0, drw_warmup=0,
        consistency_lambda=0.0, private_grads="sum_plus_own",
    )
    ctx = make_loss_ctx(settings, counts3)
    tx = sgd_torch(1e-3, 0.9, 1e-4)
    mtl = make_method("cagrad", 3, c=0.5)
    bound = model.bind(variables)
    partition = build_flat_partition(
        variables, bound.shared_modules, bound.task_modules
    )
    train_apply, eval_apply = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(train_apply, tx, settings, mtl, partition))
    eval_step = jax.jit(make_eval_step(eval_apply, settings))
    state = TrainState(
        params=variables, opt_state=tx.init(variables),
        mtl_state=mtl.init_state(), epoch=jnp.zeros((), jnp.int32),
    )

    def unpack(b):
        if async_mode:
            xs = tuple(jnp.asarray(np.asarray(b[m], np.float32)) for m in mods)
            ys = tuple(
                jnp.asarray(np.asarray(b["y"][m]), jnp.int32) for m in mods
            )
        else:
            xs = tuple(jnp.asarray(np.asarray(x, np.float32)) for x in b["xs"])
            y = jnp.asarray(np.asarray(b["y"]), jnp.int32)
            ys = (y, y, y)
        return {"xs": xs, "ys": ys,
                "valid": jnp.ones((xs[0].shape[0],), jnp.float32)}

    # pass schedule (sync): pass 0 = criteria counts; wm=gcl additionally
    # consumes one count pass per epoch (maybe_apply_drw, :526-530) before
    # each train pass, wm=class_wt does not
    stride = 2 if ns.wm == "gcl" else 1
    train_passes = [rec["train"].passes[stride * ep] for ep in range(1, ns.epochs + 1)]
    n_expected = 1 + stride * ns.epochs
    assert len(rec["train"].passes) == n_expected, \
        (len(rec["train"].passes), n_expected)

    full_mask = jnp.asarray([True, True, True])
    key = jax.random.PRNGKey(0)  # noise_mul=0: loss rng inert

    def pooled_ens(params, ev_batches, epoch, mask):
        """sync: pooled softmax-ensemble acc (weargait_train.py:337-351);
        async: mean over ENABLED mods of per-mod batch-mean accs
        (:417-429 masked, :593 full)."""
        if async_mode:
            acc_sum = np.zeros(3)
            nb = 0
            for b in ev_batches:
                batch = unpack(b)
                r = eval_step(params, batch, ctx, jax.random.PRNGKey(1),
                              jnp.asarray(epoch, jnp.int32), mask)
                n = np.float32(max(float(r["n"]), 1.0))
                # torch computes the per-batch mean in f32 before .item()
                # ((lw.argmax==y).float().mean().item()*100,
                # weargait_train.py:420-422) — round to f32 first so the
                # accumulated metric is bit-matched
                mean32 = np.asarray(r["correct"], np.float32) / n
                acc_sum += 100.0 * mean32.astype(np.float64)
                nb += 1
            per_mod = acc_sum / max(nb, 1)
            on = np.asarray(mask, bool)
            return float(per_mod[on].mean()) if on.any() else 0.0
        corr = n = 0.0
        for b in ev_batches:
            batch = unpack(b)
            r = eval_step(params, batch, ctx, jax.random.PRNGKey(1),
                          jnp.asarray(epoch, jnp.int32), mask)
            corr += float(r["ens_correct"])
            n += float(r["n"])
        return 100.0 * corr / max(1.0, n)

    best = 0.0
    best_params = None
    for ep in range(1, ns.epochs + 1):
        state = state.replace(epoch=jnp.asarray(ep - 1, jnp.int32))
        for b in train_passes[ep - 1]:
            key, k = jax.random.split(key)
            state, _ = step(state, unpack(b), k, ctx)
        ev = rec["eval"].passes[ep - 1]
        ens = pooled_ens(state.params, ev, ep - 1, full_mask)
        if ens > best:
            best = ens
            best_params = jax.device_get(state.params)

    masks = {}
    if best_params is not None:
        bp = jax.device_put(best_params)
        ev0 = rec["eval"].passes[0]  # test loader is unshuffled: passes equal
        for mk in MASK_KEYS:
            masks[mk] = pooled_ens(
                bp, ev0, ns.epochs - 1, jnp.asarray(MASK_TUPS[mk], bool)
            )
    return best, masks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--seeds", nargs="+", type=int, default=list(range(8)))
    p.add_argument("--n_folds", type=int, default=2)
    p.add_argument("--per_class", type=int, default=3)
    p.add_argument("--strength", type=float, default=0.8,
                   help="signal strength of the synthetic streams; legacy "
                        "reports recorded 0.5 but the generator was fixed "
                        "at 0.8 (treated as equal when merging)")
    p.add_argument("--wm", default="class_wt", choices=["class_wt", "ce", "gcl"])
    p.add_argument("--tie_free", action="store_true")
    p.add_argument("--async_loading", action="store_true",
                   help="match the ASYNC driver path (per-modality labels "
                        "and heads, per-epoch dataset reseed, batch-mean "
                        "macro selection — weargait_train.py:573-574,593)")
    p.add_argument("--out", default="artifacts/parity/parity_weargait_matched_report.json")
    ns = p.parse_args()

    from gaitpd.data.synthetic import make_weargait_streams

    from parity_check import paired_stats

    mode = "async" if ns.async_loading else "sync"
    report = {"epochs": ns.epochs, "wm": ns.wm, "tie_free": ns.tie_free,
              "n_folds": ns.n_folds, "per_class": ns.per_class,
              "strength": ns.strength, "async_loading": ns.async_loading,
              "config": f"weargait_{mode}_{ns.wm} matched-init matched-order",
              "strength_effective": True,  # --strength reaches the generator
              "seeds": {}}
    out_path = Path(ns.out)
    if out_path.exists():
        prev = json.loads(out_path.read_text())

        def prev_val(k):
            v = prev.get(k, False if k == "async_loading" else None)
            if (k == "strength" and v == 0.5
                    and not prev.get("strength_effective")):
                # legacy recorded-but-unused flag default ran at 0.8; a
                # post-fix report (strength_effective=True) recording 0.5
                # genuinely ran at 0.5
                return 0.8
            return v

        if all(prev_val(k) == report[k]
               for k in ("epochs", "wm", "tie_free", "n_folds", "per_class",
                         "strength", "async_loading")):
            report["seeds"] = dict(prev.get("seeds", {}))
            print(f"[merge] {len(report['seeds'])} seeds present", flush=True)

    for seed in ns.seeds:
        if str(seed) in report["seeds"]:
            print(f"[merge] seed {seed} done, skipping", flush=True)
            continue
        n = ns.n_folds * ns.per_class + 2
        streams, pd_ids, hc_ids = make_weargait_streams(
            n_pd=n, n_hc=n, t_frames=500, seed=seed, tie_free=ns.tie_free,
            strength=ns.strength,
        )
        print(f"=== seed {seed}: reference (instrumented) ===", flush=True)
        with tempfile.TemporaryDirectory() as td:
            recs = run_reference_instrumented(
                streams, pd_ids, hc_ids, seed, ns, Path(td)
            )
            print(f"=== seed {seed}: gaitpd on the recorded stream ===",
                  flush=True)
            ours, refs, mask_gaps = [], [], {k: [] for k in MASK_KEYS}
            our_masks_all, ref_masks_all = [], []
            for rec in recs:
                b, masks = replay_fold(rec, ns)
                ours.append(b)
                refs.append(rec["best_macro"])
                our_masks_all.append(masks)
                ref_masks_all.append(rec["masks"])
                for mk in MASK_KEYS:
                    if mk in masks and mk in rec["masks"]:
                        mask_gaps[mk].append(masks[mk] - rec["masks"][mk])
        report["seeds"][str(seed)] = {
            "gaitpd_folds": ours, "reference_folds": refs,
            "gaitpd": float(np.mean(ours)), "reference": float(np.mean(refs)),
            "gaitpd_masks": our_masks_all, "reference_masks": ref_masks_all,
        }
        print(f"[seed {seed}] gaitpd={np.mean(ours):.2f}% "
              f"reference={np.mean(refs):.2f}% (per-fold gaps: "
              f"{[round(a - b, 2) for a, b in zip(ours, refs)]}; "
              f"max |mask gap|: "
              f"{max((abs(g) for gs in mask_gaps.values() for g in gs), default=0.0):.2f})",
              flush=True)
        out_path.write_text(json.dumps(report, indent=1))

    g = [v["gaitpd"] for v in report["seeds"].values()]
    r = [v["reference"] for v in report["seeds"].values()]
    fold_gaps = [a - b for v in report["seeds"].values()
                 for a, b in zip(v["gaitpd_folds"], v["reference_folds"])]
    mask_gap_all = [
        om[mk] - rm[mk]
        for v in report["seeds"].values()
        for om, rm in zip(v["gaitpd_masks"], v["reference_masks"])
        for mk in MASK_KEYS if mk in om and mk in rm
    ]
    report["summary"] = {
        "gaitpd_mean": float(np.mean(g)),
        "reference_mean": float(np.mean(r)),
        "gap": float(np.mean(g) - np.mean(r)),
        "stats": paired_stats(g, r),
        "n_folds": len(fold_gaps),
        "fold_gap_abs_mean": float(np.mean(np.abs(fold_gaps))),
        "fold_gaps_exactly_zero": int(sum(abs(x) < 1e-9 for x in fold_gaps)),
        "n_mask_cells": len(mask_gap_all),
        "mask_gap_abs_mean": float(np.mean(np.abs(mask_gap_all))) if mask_gap_all else None,
        "mask_gaps_exactly_zero": int(sum(abs(x) < 1e-9 for x in mask_gap_all)),
    }
    out_path.write_text(json.dumps(report, indent=1))
    print(json.dumps(report["summary"], indent=1))


if __name__ == "__main__":
    main()
