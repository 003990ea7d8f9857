"""End-to-end TRAINING parity for the four baseline drivers: run the torch
REFERENCE trainers (fusion_train.py / focal_train.py / deepav_train.py /
taca_train.py, imported from /root/reference unmodified, on CPU) and the
gaitpd baseline_drivers equivalents on the SAME synthetic FoG data with the
SAME subject folds, and compare best-epoch accuracies.

This closes VERDICT r2 item 1: the baseline drivers previously had only
forward-pass weight-transplant parity; this harness verifies the full
training semantics — optimizer (Adam for fusion, fusion_train.py:202; AdamW
wd=1e-4 + grad-clip 1.0 for the SOTA drivers, focal_train.py:111,
deepav_train.py:123, taca_train.py:135), loss reduction (mean for fusion,
fusion_train.py:242; summed CE for SOTA, focal_train.py:43-46,
deepav_train.py:94), best-epoch selection (avg of per-head accs async /
shared-head acc sync), and first-batch shape inference (deepav_train.py:31-54,
taca_train.py:96-121).

Variance reduction vs parity_check.py: the subject folds are generated ONCE
per seed by the reference's own generators and fed to BOTH frameworks, so
the paired gap excludes fold-assignment noise (VERDICT r2 item 7).

Run:  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
        python scripts/parity_baselines.py [--epochs 20] [--seeds 0 1 ...]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from parity_check import paired_stats  # noqa: E402  (sibling script)

# kind, fusion_type, synchronized — mirroring each reference driver's CLI
# (fusion_train.py:402-409, focal_train.py:165-174, deepav_train.py:174-181,
# taca_train.py:193-211); all on fog (the richer dims: 101x21 + 426x6 IMU,
# fusion pads the sensor to 150 instead, fusion_train.py:41)
CONFIGS = {
    "fusion_cheap_xattn_async": dict(kind="fusion", ft="cheap_xattn", sync=False),
    "fusion_early_sync": dict(kind="fusion", ft="early", sync=True),
    # r4: the mode-complement rows — every reference driver x sync/async
    # combination now has a training-parity row (VERDICT r3 item 2):
    # late fusion in its natural async mode (fusion_train.py:188-200),
    # share_latent sync exercising its keep-two-heads sync branch
    # (fusion_train.py:168-173,209-254), FOCAL's sync single-head path
    # (focal_train.py:40-54), DeepAV's async forward_feats+separate-heads
    # path (deepav_train.py:92-94), TACA's sync joint-head path
    # (taca_train.py:44-49).
    "fusion_late_async": dict(kind="fusion", ft="late", sync=False),
    "fusion_share_latent_sync": dict(kind="fusion", ft="share_latent", sync=True),
    "focal_async": dict(kind="focal", ft=None, sync=False),
    "focal_sync": dict(kind="focal", ft=None, sync=True),
    "deepav_sync": dict(kind="deepav", ft=None, sync=True),
    "deepav_async": dict(kind="deepav", ft=None, sync=False),
    "taca_async": dict(kind="taca", ft=None, sync=False),
    "taca_sync": dict(kind="taca", ft=None, sync=True),
    # the fbg branch of the fusion driver: batch 32, sensor pad 150 -> full
    # 65x3 GRF, pose-&-sensor-only eval folds (fusion_train.py:22-27,99-110);
    # async only — fbg+sync crashes in the reference (oversample_equally)
    "fusion_early_fbg_async": dict(kind="fusion", ft="early", sync=False,
                                   dataset="fbg"),
}

DEFAULT_CONFIGS = [
    "fusion_cheap_xattn_async",
    "fusion_early_sync",
    "focal_async",
    "deepav_sync",
    "taca_async",
]


def _ref_sys_path():
    # the dispatcher (train/train.py:39-51) runs the baseline scripts with
    # train/ on sys.path; the scripts themselves live in train/baselines/
    for p in (str(REF / "train" / "baselines"), str(REF / "train"), str(REF)):
        if p not in sys.path:
            sys.path.insert(0, p)


def _make_reader(seed: int, strength: float, dataset: str = "fog"):
    from gaitpd.data.synthetic import make_fbg_reader, make_fog_reader

    if dataset == "fbg":
        return make_fbg_reader(seed=seed, strength=strength)
    return make_fog_reader(seed=seed, strength=strength)


def _patch_num_workers(drv_module):
    """Force num_workers=0 in the reference loader factory (single-core box;
    the drivers hard-code num_workers=4)."""
    from data_processing import dataloader_fbg_fog as ref_loader

    orig = ref_loader.create_fusion_loaders

    def _nw0(*a, **k):
        k["num_workers"] = 0
        return orig(*a, **k)

    drv_module.create_fusion_loaders = _nw0


def run_reference(config: str, epochs: int, seed: int, strength: float):
    """Replicates each reference driver's main() — seed, fold generation,
    per-fold training — with epochs capped and workers=0. Returns
    (mean-best-avg-acc, folds) so the SAME folds can drive gaitpd."""
    _ref_sys_path()
    import torch

    torch.set_num_threads(1)

    cfg = CONFIGS[config]
    dataset = cfg.get("dataset", "fog")
    reader = _make_reader(seed, strength, dataset)
    import types

    if cfg["kind"] == "fusion":
        import fusion_train as drv

        _patch_num_workers(drv)
        drv.MODALITY_PARAMS[dataset]["epochs"] = epochs
        ns = types.SimpleNamespace(
            dataset=dataset, seed=seed, fusion_type=cfg["ft"],
            synchronized_loading=cfg["sync"], rebuild_cache=False,
        )
        drv.args = ns  # module global consumed by create_dataloader/run_epoch
        drv.set_random_seed(seed)
        folds = drv.generate_class_stratified_folds(reader, dataset)
        accs = []
        for i in range(1, len(folds) + 1):
            best_avg, _sk, _se = drv.train_one_fold(i, reader, folds, ns)
            accs.append(best_avg)
        return float(np.mean(accs)), folds

    from learning.training_common import (
        generate_class_stratified_folds,
        set_seed,
    )

    if cfg["kind"] == "focal":
        import focal_train as drv
    elif cfg["kind"] == "deepav":
        import deepav_train as drv
    else:
        import taca_train as drv

    _patch_num_workers(drv)
    drv.HP["fog"]["epochs"] = epochs
    ns = types.SimpleNamespace(
        dataset="fog", synced=cfg["sync"], wm="ce", seed=seed,
        consistency_lambda=1.0,
        # TACA knobs (taca_train.py:201-209 defaults)
        d_model=96, n_heads=4, n_tok_s=4, n_tok_e=4, tau=1.0, gamma=1.5,
        taca_schedule="const", taca_depths=1,
    )
    set_seed(seed)
    folds = generate_class_stratified_folds(
        reader, "fog", exclude_subjects=["SUB10", "SUB30", "SUB22"]
    )
    accs = []
    for i, (tr, ev) in enumerate(folds, 1):
        _sk, _se, avg = drv.train_fold(i, reader, ns, tr, ev)
        accs.append(avg)
    return float(np.mean(accs)), folds


def run_gaitpd(config: str, epochs: int, seed: int, strength: float, folds):
    """Drives gaitpd.train.baseline_drivers.train_fold on the SAME folds."""
    from gaitpd.train.baseline_drivers import BaselineArgs, train_fold

    cfg = CONFIGS[config]
    dataset = cfg.get("dataset", "fog")
    reader = _make_reader(seed, strength, dataset)
    args = BaselineArgs(
        kind=cfg["kind"], dataset=dataset, synced=cfg["sync"], wm="ce",
        seed=seed, fusion_type=cfg["ft"] or "cheap_xattn", epochs=epochs,
        verbose=False, synthetic=True,
    )
    accs = []
    for i, (tr, ev) in enumerate(folds, 1):
        _sk, _se, avg = train_fold(i, reader, args, tr, ev)
        accs.append(avg)
    return float(np.mean(accs))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=DEFAULT_CONFIGS,
                   choices=sorted(CONFIGS))
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--seeds", nargs="+", type=int,
                   default=[0, 1, 2, 3, 4, 5, 6, 7])
    p.add_argument("--strength", type=float, default=0.8)
    p.add_argument("--out", default="artifacts/parity/parity_baselines_report.json")
    ns = p.parse_args()

    # Merge into an existing report (same epochs/strength) so configs can be
    # (re)run incrementally without losing committed rows.
    report = {"epochs": ns.epochs, "strength": ns.strength, "seeds": ns.seeds,
              "paired_folds": True}
    out_path = Path(ns.out)
    if out_path.exists():
        prev = json.loads(out_path.read_text())
        if (prev.get("epochs") == ns.epochs
                and prev.get("strength") == ns.strength):
            prev.update({k: v for k, v in report.items()})
            report = prev
    for config in ns.configs:
        ours_list, ref_list = [], []
        for seed in ns.seeds:
            print(f"=== {config} seed {seed}: torch reference ===", flush=True)
            ref_avg, folds = run_reference(config, ns.epochs, seed, ns.strength)
            print(f"=== {config} seed {seed}: gaitpd (same folds) ===",
                  flush=True)
            ours_avg = run_gaitpd(config, ns.epochs, seed, ns.strength, folds)
            ours_list.append(ours_avg)
            ref_list.append(ref_avg)
            print(f"[{config} seed {seed}] gaitpd={ours_avg:.2f}% "
                  f"reference={ref_avg:.2f}%", flush=True)
        report[config] = {
            "gaitpd_mean": float(np.mean(ours_list)),
            "reference_mean": float(np.mean(ref_list)),
            "gap": float(np.mean(ours_list) - np.mean(ref_list)),
            "stats": paired_stats(ours_list, ref_list),
            "per_seed": {"gaitpd": ours_list, "reference": ref_list},
        }
        Path(ns.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    Path(ns.out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
