"""Metric-parity check: run the torch REFERENCE driver (from /root/reference,
unmodified, on CPU) and the gaitpd driver on the SAME synthetic FoG/FBG
dataset and compare best-epoch accuracies.

This validates the ±1% F1/acc parity target of BASELINE.md end-to-end:
identical fold splits, identical class distributions, same hyperparameters.
Covers the reference's DEFAULT loss path (wm=gcl + cosine heads + DRW +
CAGrad, fbg_fog_train.py:114-133 / classification_losses.py:79-109) and both
datasets' dims (fbg 101x51 pose + 65x3 GRF; fog 101x21 pose + 426x6 IMU,
configs.py:2-31).

Run:  python scripts/parity_check.py [--epochs 25] [--seeds 0 1 ...]
      [--configs sensor_ce multimodal_gcl_cagrad ...] [--strength 0.8]

The reference code is imported, never copied; its loaders are monkeypatched
only to (a) use the synthetic reader, (b) num_workers=0 (single-core box),
and (c) alias torch.cuda.FloatTensor -> torch.FloatTensor so the CUDA-only
LDAM/GCL losses (classification_losses.py:60,83) run on CPU — semantics
unchanged.

Statistics: per-config per-seed pairs, wins/losses, mean gap, and a paired
95% t-CI on the gap (VERDICT r1 item 10).
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

# dataset, modality, wm, synchronized, CAGrad alpha (0 disables), cosine
# heads, drw_warmup — mirroring the reference CLI surface
# (fbg_fog_train.py:442-463; defaults wm=gcl, alpha=0.1, drw_warmup=0)
CONFIGS = {
    "sensor_ce": dict(dataset="fog", modality="sensor", wm="ce", sync=False,
                      alpha=0.0, cos=False, drw=0),
    # the skeleton-only modality (reference utilities.py:35-71 chooses the
    # SkeletonMLP single-branch model); the last single-modality sub-driver
    # without a training-parity row (VERDICT r3 item 4)
    "skeleton_ce": dict(dataset="fog", modality="skeleton", wm="ce",
                        sync=False, alpha=0.0, cos=False, drw=0),
    # skeleton-only CE with a pose signal that SURVIVES the reference's
    # root-joint centering (center_poses, dataloader_fbg_fog.py:93-99): the
    # default synthetic pose wave is common-mode across joints, so centering
    # deletes it and BOTH frameworks train the skeleton branch on pure noise
    # (measured: the skeleton_ce row is bit-invariant to --strength). This
    # row draws per-joint gains (pose_per_joint) so the skeleton model is
    # actually discriminative.
    "skeleton_ce_joint": dict(dataset="fog", modality="skeleton", wm="ce",
                              sync=False, alpha=0.0, cos=False, drw=0,
                              pose_sig=True),
    "multimodal_ce_cagrad": dict(dataset="fog", modality="multimodal",
                                 wm="ce", sync=False, alpha=0.1, cos=False,
                                 drw=0),
    "multimodal_ce_sync": dict(dataset="fog", modality="multimodal", wm="ce",
                               sync=True, alpha=0.0, cos=False, drw=0),
    # synchronized GCL + cosine heads + CAGrad — the configuration where the
    # symmetric-KL prediction consistency actually fires (consistency_lambda
    # 1.0 in both frameworks; reference fbg_fog_train.py:80-89,121-124) and
    # selection is by softmax-ensemble accuracy (:238-243). Unlike the
    # bimodal sync-CE row, GCL configs train stably.
    "multimodal_gcl_sync": dict(dataset="fog", modality="multimodal",
                                wm="gcl", sync=True, alpha=0.1, cos=True,
                                drw=0),
    # the reference's default loss path (flagship): GCL + cosine heads +
    # DRW-at-0 + CAGrad
    "multimodal_gcl_cagrad": dict(dataset="fog", modality="multimodal",
                                  wm="gcl", sync=False, alpha=0.1, cos=True,
                                  drw=0),
    # attribution ablation for the 32-seed flagship edge (+2.7 [+0.3,+5.1]):
    # the 2x2 (loss x CAGrad) grid's missing cell — GCL + cosine heads with
    # CAGrad DISABLED. If the edge persists here it lives in the loss/arch
    # path; if it vanishes it is a CAGrad-interaction effect.
    "multimodal_gcl_nocagrad": dict(dataset="fog", modality="multimodal",
                                    wm="gcl", sync=False, alpha=0.0,
                                    cos=True, drw=0),
    # the namesake "Gaussian cloud" perturbation ACTIVE (noise_mul=0.5):
    # half-normal noise scaled by per-class margins perturbs the cosine
    # logits every training step (classification_losses.py:101-104). Both
    # frameworks default this OFF (fbg_fog_train.py:458); this row shows
    # they train comparably with the cloud on. The noise draws cannot pair
    # across frameworks (torch RNG vs JAX PRNG), so the comparison is
    # distributional — expect a wider CI than the noise-free flagship.
    "multimodal_gcl_noise05_cagrad": dict(dataset="fog",
                                          modality="multimodal", wm="gcl",
                                          sync=False, alpha=0.1, cos=True,
                                          drw=0, noise=0.5),
    # deferred re-weighting mid-run (exercises the DRW swap at epoch 10)
    "multimodal_gcl_drw10_cagrad": dict(dataset="fog", modality="multimodal",
                                        wm="gcl", sync=False, alpha=0.1,
                                        cos=True, drw=10),
    # LDAM margin loss (classification_losses.py:54-76; CUDA-only in the
    # reference, runs on CPU via the FloatTensor alias)
    "multimodal_ldam_cagrad": dict(dataset="fog", modality="multimodal",
                                   wm="ldam", sync=False, alpha=0.1,
                                   cos=False, drw=0),
    # FBG dataset dims (101x51 pose + GRF trimmed to 65x3, configs.py:2-16)
    "fbg_multimodal_gcl_cagrad": dict(dataset="fbg", modality="multimodal",
                                      wm="gcl", sync=False, alpha=0.1,
                                      cos=True, drw=0),
    "fbg_sensor_ce": dict(dataset="fbg", modality="sensor", wm="ce",
                          sync=False, alpha=0.0, cos=False, drw=0),
}

DEFAULT_CONFIGS = [
    "sensor_ce",
    "multimodal_ce_cagrad",
    "multimodal_gcl_cagrad",
    "multimodal_gcl_drw10_cagrad",
    "fbg_multimodal_gcl_cagrad",
]


def _make_reader(dataset: str, seed: int, strength: float,
                 pose_per_joint: bool = False):
    from gaitpd.data.synthetic import make_fbg_reader, make_fog_reader

    if dataset == "fbg":
        # make_fbg_reader has no per-joint pose mode; a silent drop here
        # would yield a misleading parity row (ADVICE r4)
        assert not pose_per_joint, "pose_per_joint is fog-only"
        return make_fbg_reader(seed=seed, strength=strength)
    return make_fog_reader(seed=seed, strength=strength,
                           pose_per_joint=pose_per_joint)


def run_reference(config: str, epochs: int, seed: int, strength: float = 1.0):
    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF))
    import torch

    torch.set_num_threads(1)
    # LDAM/GCL hard-code torch.cuda.FloatTensor (classification_losses.py:
    # 60,70,83) — alias it to the CPU tensor type for this oracle process.
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor

    import fbg_fog_train as ref_driver  # noqa: E402
    import utilities as ref_utils  # noqa: E402
    from data_processing import dataloader_fbg_fog as ref_loader  # noqa: E402

    cfg = CONFIGS[config]
    reader = _make_reader(cfg["dataset"], seed, strength,
                          pose_per_joint=cfg.get("pose_sig", False))

    # single-core box: force num_workers=0 in the reference loader factory
    orig = ref_loader.create_fusion_loaders
    patched = functools.partial(orig)

    def create_loaders(*args, **kwargs):
        kwargs["num_workers"] = 0
        return patched(*args, **kwargs)

    ref_driver.create_fusion_loaders = create_loaders

    import types

    args = types.SimpleNamespace(
        dataset=cfg["dataset"],
        modality=cfg["modality"],
        consistency_lambda=1.0,
        wm=cfg["wm"],
        synchronized_loading=cfg["sync"],
        alpha=cfg["alpha"],
        max_norm=1.0,
        ldam_s=30.0,
        ldam_m=0.5,
        gcl_m=0.2,
        gcl_s=25.0,
        noise_mul=cfg.get("noise", 0.0),
        drw_warmup=cfg["drw"],
        use_norm_and_cos=cfg["cos"],
        save_loss_plots=False,
        seed=seed,
    )
    ref_utils.set_random_seed(seed)
    # cap epochs by shrinking the params dict the driver reads
    try:
        from configs import FBG_FOG_PARAMS
    except ImportError:
        from train.configs import FBG_FOG_PARAMS
    FBG_FOG_PARAMS[cfg["dataset"]]["epochs"] = epochs

    folds = ref_utils.generate_class_stratified_folds(reader, cfg["dataset"])
    results = []
    for idx, (t, e) in enumerate(folds, 1):
        results.append(ref_driver.train_one_fold(idx, reader, args, t, e))
    arr = np.asarray(results)
    return {
        "skel": float(arr[:, 0].mean()),
        "sensor": float(arr[:, 1].mean()),
        "avg": float(arr[:, 2].mean()),
        "folds": len(folds),
    }


def run_gaitpd(config: str, epochs: int, seed: int, strength: float = 1.0):
    from gaitpd.train.fbg_fog_driver import FbgFogArgs, main

    cfg = CONFIGS[config]
    args = FbgFogArgs(
        dataset=cfg["dataset"],
        modality=cfg["modality"],
        wm=cfg["wm"],
        synchronized_loading=cfg["sync"],
        alpha=cfg["alpha"],
        use_norm_and_cos=cfg["cos"],
        drw_warmup=cfg["drw"],
        noise_mul=cfg.get("noise", 0.0),
        epochs=epochs,
        synthetic=True,
        synthetic_strength=strength,
        synthetic_pose_per_joint=cfg.get("pose_sig", False),
        seed=seed,
        verbose=False,
    )
    out = main(args)
    return {k: float(v) for k, v in out[cfg["modality"]].items()}


def paired_stats(ours, ref):
    """Per-seed paired comparison: wins/ties/losses and a 95% t-CI on the
    mean gap (ours - reference)."""
    ours = np.asarray(ours, dtype=np.float64)
    ref = np.asarray(ref, dtype=np.float64)
    d = ours - ref
    n = len(d)
    mean = float(d.mean())
    out = {
        "n_seeds": n,
        "mean_gap": mean,
        "wins": int((d > 1e-9).sum()),
        "ties": int((np.abs(d) <= 1e-9).sum()),
        "losses": int((d < -1e-9).sum()),
    }
    if n >= 2:
        se = float(d.std(ddof=1) / np.sqrt(n))
        try:
            from scipy import stats as _st

            tcrit = float(_st.t.ppf(0.975, n - 1))
        except ImportError:  # pragma: no cover
            tcrit = {1: 12.71, 2: 4.303, 3: 3.182, 4: 2.776, 5: 2.571,
                     6: 2.447, 7: 2.365, 8: 2.306, 9: 2.262}.get(n - 1, 2.0)
        out["gap_ci95"] = [mean - tcrit * se, mean + tcrit * se]
        out["gap_se"] = se
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=DEFAULT_CONFIGS,
                   choices=sorted(CONFIGS))
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--seeds", nargs="+", type=int,
                   default=[0, 1, 2, 3, 4, 5, 6, 7])
    p.add_argument("--strength", type=float, default=0.8,
                   help="class-signal strength (picked so accuracies land in "
                        "a discriminative 60-90%% regime, off chance)")
    p.add_argument("--out", default="artifacts/parity/parity_report.json")
    ns = p.parse_args()

    # merge mode: extend an existing report (same epochs/strength) with new
    # seeds and/or configs instead of discarding committed rows — used to
    # grow 8-seed rows to 16 for narrower CIs (VERDICT r2 item 7)
    report = {"epochs": ns.epochs, "strength": ns.strength, "seeds": ns.seeds}
    prev = {}
    prev_seeds = []  # snapshot BEFORE mutating report (report aliases prev)
    out_path = Path(ns.out)
    if out_path.exists():
        old = json.loads(out_path.read_text())
        if old.get("epochs") == ns.epochs and old.get("strength") == ns.strength:
            prev = old
            prev_seeds = list(old.get("seeds", []))
            report = old
            report["seeds"] = sorted(set(prev_seeds) | set(ns.seeds))
    for config in ns.configs:
        ours_list, ref_list = [], []
        done_seeds = []
        if config in prev:
            ours_list = list(prev[config]["per_seed"]["gaitpd"])
            ref_list = list(prev[config]["per_seed"]["reference"])
            seeds_run = prev.get("seeds_run", {}).get(config)
            if seeds_run is not None:
                # a seed only counts as done if its result is actually present
                done_seeds = list(seeds_run)[: len(ours_list)]
            else:
                # legacy report (no per-config seeds_run): its own `seeds`
                # field IS exactly what was run (e.g. parity_gcl_s08's
                # original seeds are 8-15) — trust it untruncated rather
                # than dropping/duplicating the non-smallest seeds. Guard
                # the trust (ADVICE r4): the seed list and the per_seed
                # results must align one-to-one, else later merges would
                # silently mis-assign seeds to results.
                assert len(prev_seeds) == len(ours_list) == len(ref_list), (
                    f"legacy report {config}: seeds field ({len(prev_seeds)})"
                    f" does not align with per_seed lists "
                    f"({len(ours_list)}/{len(ref_list)})"
                )
                done_seeds = list(prev_seeds)
        for seed in ns.seeds:
            if seed in done_seeds:
                continue
            print(f"=== {config} seed {seed}: gaitpd ===", flush=True)
            ours = run_gaitpd(config, ns.epochs, seed, ns.strength)
            print(f"=== {config} seed {seed}: torch reference ===", flush=True)
            ref = run_reference(config, ns.epochs, seed, ns.strength)
            ours_list.append(ours["avg"])
            ref_list.append(ref["avg"])
            print(f"[{config} seed {seed}] gaitpd avg={ours['avg']:.2f}% "
                  f"reference avg={ref['avg']:.2f}%", flush=True)
        report[config] = {
            "gaitpd_mean": float(np.mean(ours_list)),
            "reference_mean": float(np.mean(ref_list)),
            "gap": float(np.mean(ours_list) - np.mean(ref_list)),
            "stats": paired_stats(ours_list, ref_list),
            "per_seed": {"gaitpd": ours_list, "reference": ref_list},
        }
        report.setdefault("seeds_run", {})[config] = sorted(
            set(done_seeds) | set(ns.seeds)
        )
        Path(ns.out).write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    Path(ns.out).write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
