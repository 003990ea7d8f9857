"""Accuracy effect of the on-device augmentation stage (VERDICT r4 item 5).

Runs the gaitpd FoG skeleton driver (discriminative per-joint synthetic
signal) with and without train-time augmentation over many seeds and
reports the paired per-seed delta. The e25 regime is edge-of-learnability
(30 train segments, 1 SGD step/epoch, huge seed variance — see PARITY.md),
exactly where augmentation should matter most.

Run: python scripts/aug_ablation.py --epochs 25 --seeds 0..15
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(Path(__file__).parent))


AUG = {"mirror_p": 0.5, "rot_deg": 10.0, "noise_std": 0.02}


def run_cell(seed, epochs, strength, aug):
    import dataclasses

    from gaitpd.train.fbg_fog_driver import FbgFogArgs
    from gaitpd.train.fbg_fog_driver import main as fbg_main

    kw = dict(
        dataset="fog", modality="skeleton", wm="ce", alpha=0.0,
        epochs=epochs, synthetic=True, synthetic_strength=strength,
        synthetic_pose_per_joint=True, seed=seed, verbose=False,
    )
    if aug:
        kw.update(aug_mirror_p=aug["mirror_p"], aug_rot_deg=aug["rot_deg"],
                  aug_noise_std=aug["noise_std"])
    args = FbgFogArgs(**kw)
    assert dataclasses.is_dataclass(args)
    res = fbg_main(args)
    return float(res["skeleton"]["avg"])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--strength", type=float, default=5.0)
    p.add_argument("--seeds", nargs="+", type=int, default=list(range(16)))
    p.add_argument("--mirror_p", type=float, default=AUG["mirror_p"],
                   help="mirror negates x (and swaps left/right joint "
                        "pairs only on >=17-joint skeletons; the 7-keypoint "
                        "FoG poses measured here get just the sign flip) — "
                        "label-inconsistent when the signal is laterally "
                        "asymmetric")
    p.add_argument("--rot_deg", type=float, default=AUG["rot_deg"])
    p.add_argument("--noise_std", type=float, default=AUG["noise_std"])
    p.add_argument("--out", default="artifacts/parity/aug_ablation_report.json")
    ns = p.parse_args()
    out = Path(ns.out)
    out.parent.mkdir(parents=True, exist_ok=True)

    aug_cfg = {"mirror_p": ns.mirror_p, "rot_deg": ns.rot_deg,
               "noise_std": ns.noise_std}
    report = {"epochs": ns.epochs, "strength": ns.strength,
              "aug": aug_cfg, "seeds": {}}
    if out.exists():
        prev = json.loads(out.read_text())
        if (prev.get("epochs") == ns.epochs
                and prev.get("strength") == ns.strength
                and prev.get("aug") == report["aug"]):
            report["seeds"] = dict(prev.get("seeds", {}))
            print(f"[merge] {len(report['seeds'])} seeds present", flush=True)
        else:
            print("[merge] config mismatch (epochs/strength/aug) — "
                  "starting fresh", flush=True)

    for seed in ns.seeds:
        if str(seed) in report["seeds"]:
            continue
        base = run_cell(seed, ns.epochs, ns.strength, aug=None)
        aug = run_cell(seed, ns.epochs, ns.strength, aug=aug_cfg)
        report["seeds"][str(seed)] = {"base": base, "aug": aug}
        print(f"[seed {seed}] base={base:.2f}% aug={aug:.2f}% "
              f"delta={aug - base:+.2f}", flush=True)
        out.write_text(json.dumps(report, indent=1))

    from parity_check import paired_stats

    b = [v["base"] for v in report["seeds"].values()]
    a = [v["aug"] for v in report["seeds"].values()]
    report["summary"] = {
        "base_mean": float(np.mean(b)),
        "aug_mean": float(np.mean(a)),
        "delta": float(np.mean(a) - np.mean(b)),
        "stats": paired_stats(a, b),
    }
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report["summary"], indent=1))


if __name__ == "__main__":
    main()
