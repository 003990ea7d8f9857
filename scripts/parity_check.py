"""Metric-parity check: run the torch REFERENCE driver (from /root/reference,
unmodified, on CPU) and the gaitpd driver on the SAME synthetic FoG dataset
and compare best-epoch accuracies.

This validates the ±1% F1/acc parity target of BASELINE.md end-to-end:
identical fold splits, identical class distributions, same hyperparameters.
Run:  python scripts/parity_check.py [--epochs 25] [--config sensor_ce ...]

The reference code is imported, never copied; its loaders are monkeypatched
only to (a) use the synthetic reader and (b) num_workers=0 (single-core box).
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


def run_reference(config: str, epochs: int, seed: int, strength: float = 1.0):
    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF))
    import torch

    torch.set_num_threads(1)
    import fbg_fog_train as ref_driver  # noqa: E402
    import utilities as ref_utils  # noqa: E402
    from data_processing import dataloader_fbg_fog as ref_loader  # noqa: E402

    from gaitpd.data.synthetic import make_fog_reader

    reader = make_fog_reader(seed=seed, strength=strength)

    # single-core box: force num_workers=0 in the reference loader factory
    orig = ref_loader.create_fusion_loaders
    patched = functools.partial(orig)

    def create_loaders(*args, **kwargs):
        kwargs["num_workers"] = 0
        return patched(*args, **kwargs)

    ref_driver.create_fusion_loaders = create_loaders

    import types

    args = types.SimpleNamespace(
        dataset="fog",
        modality="sensor" if config == "sensor_ce" else "multimodal",
        consistency_lambda=1.0,
        wm="ce",
        synchronized_loading=(config == "multimodal_ce_sync"),
        alpha=0.0 if config in ("sensor_ce", "multimodal_ce_sync") else 0.1,
        max_norm=1.0,
        ldam_s=30.0,
        ldam_m=0.5,
        gcl_m=0.2,
        gcl_s=25.0,
        noise_mul=0.0,
        drw_warmup=0,
        use_norm_and_cos=False,
        save_loss_plots=False,
        seed=seed,
    )
    ref_utils.set_random_seed(seed)
    # cap epochs by shrinking the params dict the driver reads
    try:
        from configs import FBG_FOG_PARAMS
    except ImportError:
        from train.configs import FBG_FOG_PARAMS
    FBG_FOG_PARAMS["fog"]["epochs"] = epochs

    folds = ref_utils.generate_class_stratified_folds(reader, "fog")
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

    import gaitpd.data.synthetic as syn
    import functools as _ft

    orig_make = syn.make_fog_reader
    syn.make_fog_reader = _ft.partial(orig_make, strength=strength)
    args = FbgFogArgs(
        dataset="fog",
        modality="sensor" if config == "sensor_ce" else "multimodal",
        wm="ce",
        synchronized_loading=(config == "multimodal_ce_sync"),
        alpha=0.0 if config in ("sensor_ce", "multimodal_ce_sync") else 0.1,
        epochs=epochs,
        synthetic=True,
        seed=seed,
        verbose=False,
    )
    out = main(args)
    syn.make_fog_reader = orig_make
    mod = "sensor" if config == "sensor_ce" else "multimodal"
    return {k: float(v) for k, v in out[mod].items()}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", nargs="+", default=["sensor_ce", "multimodal_ce_cagrad"])
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1])
    p.add_argument("--strength", type=float, default=0.35, help="class-signal strength (lower = harder task)")
    ns = p.parse_args()

    report = {}
    for config in ns.configs:
        ours_list, ref_list = [], []
        for seed in ns.seeds:
            print(f"=== {config} seed {seed}: gaitpd ===", flush=True)
            ours = run_gaitpd(config, ns.epochs, seed, ns.strength)
            print(f"=== {config} seed {seed}: torch reference ===", flush=True)
            ref = run_reference(config, ns.epochs, seed, ns.strength)
            ours_list.append(ours["avg"])
            ref_list.append(ref["avg"])
            print(f"[{config} seed {seed}] gaitpd avg={ours['avg']:.2f}% "
                  f"reference avg={ref['avg']:.2f}%")
        report[config] = {
            "gaitpd_mean": float(np.mean(ours_list)),
            "reference_mean": float(np.mean(ref_list)),
            "gap": float(np.mean(ours_list) - np.mean(ref_list)),
            "per_seed": {"gaitpd": ours_list, "reference": ref_list},
        }
    print(json.dumps(report, indent=2))
    Path("parity_report.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
