"""WearGait driver parity: run the torch REFERENCE weargait_train.run_cv
(unmodified logic, CPU) and the gaitpd driver on the SAME synthetic subject
streams, and compare macro accuracies and the 7-subset masked evals.

The synthetic streams are materialised as the per-subject pickles the
reference loader reads (tuple-packed insole/imu columns, *_matTURN.csv
discovery markers), so the reference runs its own full pipeline: fold-local
stats, windowing, sync pairing, CAGrad-on-shared + private grads, masked
eval. wm defaults to class_wt; --wm gcl runs the reference's GCL flagship
loss too (its CUDA-only tensors are aliased to CPU in the oracle process,
and per-subject stream lengths vary so class window counts are imbalanced,
keeping the reference's unguarded GCL margin finite).

Run: python scripts/parity_weargait.py [--epochs 10] [--seeds 0]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import types
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def materialize_reference_layout(streams, pd_ids, hc_ids, root: Path):
    """Write per-subject stream pickles + discovery CSVs in the layout the
    reference expects (preproc pkl dir + {PD,HC}/*_matTURN.csv markers)."""
    import pandas as pd

    out = root / "WearGait_preproc_SPmT_30Hz"
    pd_dir = root / "PD"
    hc_dir = root / "HC"
    for d in (out, pd_dir, hc_dir):
        d.mkdir(parents=True, exist_ok=True)

    insole_cols = [
        "LTotalForce_BW", "RTotalForce_BW", "SumForce_BW",
        "LCoP_X", "LCoP_Y", "RCoP_X", "RCoP_Y",
    ]
    imu_sites = [
        "L_Ankle", "R_Ankle", "L_DorsalFoot", "R_DorsalFoot",
        "L_MidLatThigh", "R_MidLatThigh", "L_LatShank", "R_LatShank",
    ]
    for sid, sub in streams.items():
        marker_dir = pd_dir if sid in set(pd_ids) else hc_dir
        (marker_dir / f"{sid}_SelfPace_matTURN.csv").write_text("")
        # float32 columns: the reference's apply_stats mutates
        # to_numpy(dtype=float) output in place, which must be a fresh copy
        w = np.nan_to_num(sub["walkway"], nan=0.0).astype(np.float32)
        dfw = pd.DataFrame(
            {"L Foot Pressure_BW": w[:, 0], "R Foot Pressure_BW": w[:, 1]}
        )
        dfw.to_pickle(out / f"{sid.lower()}_walkway.pkl")
        i = sub["insole"].astype(np.float32)
        dfi = pd.DataFrame({c: i[:, j] for j, c in enumerate(insole_cols)})
        dfi["Linsole_Acc"] = list(map(tuple, i[:, 7:10]))
        dfi["Rinsole_Acc"] = list(map(tuple, i[:, 10:13]))
        dfi.to_pickle(out / f"{sid.lower()}_insole.pkl")
        m = sub["imu"].astype(np.float32)
        dfm = pd.DataFrame()
        for k, site in enumerate(imu_sites):
            dfm[f"{site}_FreeAcc"] = list(map(tuple, m[:, 3 * k : 3 * k + 3]))
        dfm.to_pickle(out / f"{sid.lower()}_imu.pkl")
    return out, pd_dir, hc_dir


def ref_args(seed, epochs, n_folds, per_class, async_loading, wm,
             single_mod=None, baseline=None):
    return types.SimpleNamespace(
        n_folds=n_folds, test_per_class=per_class, win_len=64, hop_len=64,
        batch_size=64, num_workers=0, epochs=epochs, patience=50,
        num_classes=2, lr=1e-3, seed=seed, async_loading=async_loading,
        single_mod=single_mod, proj_ch=16, enc_out_ch=12, backbone_dim=8,
        shared_out_ch=16, use_norm=False, use_cosine=False, baseline=baseline,
        wm=wm, gcl_m=0.2, gcl_s=25.0, noise_mul=0.0, drw_warmup=0,
        alpha=0.5,
    )


def run_reference(streams, pd_ids, hc_ids, seed, epochs, n_folds, per_class,
                  async_loading, workdir: Path, wm="class_wt",
                  single_mod=None, baseline=None):
    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF))
    sys.path.insert(0, str(REF / "data" / "WearGait"))
    import torch

    torch.set_num_threads(1)
    # LDAM/GCL hard-code torch.cuda.FloatTensor (classification_losses.py:
    # 60,83) — alias to the CPU tensor type for this oracle process.
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor
    import pandas as pd

    # pandas>=3 returns read-only views from Series.to_numpy; the reference's
    # apply_stats mutates that array in place (dataloader_weargait.py:220)
    # and would crash on ANY data under this pandas. Compatibility shim for
    # the oracle process only — semantics unchanged, just a copy.
    if not getattr(pd.Series.to_numpy, "_gaitpd_writable", False):
        _orig_to_numpy = pd.Series.to_numpy

        def _to_numpy_writable(self, *a, **k):
            x = _orig_to_numpy(self, *a, **k)
            if isinstance(x, np.ndarray) and not x.flags.writeable:
                x = x.copy()
            return x

        _to_numpy_writable._gaitpd_writable = True
        pd.Series.to_numpy = _to_numpy_writable

    import weargait_train as wt  # noqa: E402

    out, pd_dir, hc_dir = materialize_reference_layout(
        streams, pd_ids, hc_ids, workdir
    )
    wt.pd_path = str(pd_dir)
    wt.hc_path = str(hc_dir)
    wt.output_dir = str(out)

    import io
    from contextlib import redirect_stdout

    args = ref_args(seed, epochs, n_folds, per_class, async_loading, wm,
                    single_mod=single_mod, baseline=baseline)
    buf = io.StringIO()
    with redirect_stdout(buf):
        wt.run_cv(args)
    text = buf.getvalue()
    # parse "Macro acc mean ± std: X% ± Y%" and the per-mask table
    macro = None
    masks = {}
    for line in text.splitlines():
        if line.startswith("Macro acc mean"):
            macro = float(line.split(":")[1].split("%")[0])
        if line.startswith("[") and "] " in line and "%" in line and "±" in line:
            key = line[1:].split("]")[0].strip()
            try:
                masks[key] = float(line.split("]")[1].split("%")[0])
            except ValueError:
                pass
    return {"macro": macro, "masks": masks, "stdout_tail": text[-800:]}


def run_gaitpd(streams, pd_ids, hc_ids, seed, epochs, n_folds, per_class,
               async_loading, wm="class_wt", single_mod=None, baseline=None,
               baseline_torch_init=False):
    import gaitpd.train.weargait_driver as wd
    from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

    orig = wd.get_streams
    wd.get_streams = lambda args: (streams, pd_ids, hc_ids)
    try:
        res = run_cv(WearGaitArgs(
            n_folds=n_folds, test_per_class=per_class, epochs=epochs,
            patience=50, wm=wm, alpha=0.5, seed=seed,
            async_loading=async_loading, verbose=False,
            single_mod=single_mod, baseline=baseline,
            baseline_torch_init=baseline_torch_init,
        ))
    finally:
        wd.get_streams = orig
    return res


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--seeds", nargs="+", type=int, default=[0])
    p.add_argument("--n_folds", type=int, default=2)
    p.add_argument("--per_class", type=int, default=3)
    p.add_argument("--async_loading", action="store_true")
    p.add_argument("--strength", type=float, default=0.8,
                   help="PD-vs-HC signal strength of the synthetic streams. "
                        "Historically this flag was recorded but unused "
                        "(the generator was fixed at 0.8); legacy reports "
                        "recording 0.5 actually ran at 0.8 and merge as "
                        "such")
    p.add_argument("--wm", default="class_wt", choices=["class_wt", "ce", "gcl"])
    p.add_argument("--baseline", default=None,
                   choices=["early_fusion", "late_fusion", "shared_latent",
                            "cheap_xattn", "deepav_lite", "focal", "taca"],
                   help="race the reference's baseline zoo through its own "
                        "WearGait CV/mask protocol (weargait_train.py:"
                        "458-524; TACA's flatten path :176-181, no-CAGrad/"
                        "no-DRW gating :150,527-532) against gaitpd's "
                        "weargait_driver with the same --baseline")
    p.add_argument("--baseline_torch_init", action="store_true",
                   help="attribution experiment: run gaitpd's DeepAV with "
                        "the torch patch-embed init law (kaiming_uniform "
                        "kernel + uniform bias) instead of the default "
                        "lecun_normal + zero bias — isolates whether the "
                        "relaxed-input mask-cell gap is the patch-embed "
                        "init law (models/baselines.py::PatchEmbed1D)")
    p.add_argument("--single_mod", default=None,
                   choices=["walkway", "insole", "imu"],
                   help="race the single-modality sub-drivers (reference "
                        "weargait_train.py:250-297,579-588: CE-only, pooled "
                        "accuracy, fresh per-epoch SGD); use --wm ce so the "
                        "reference's criterions[0] (the walkway branch's "
                        "class weights) matches the trained modality")
    p.add_argument("--tie_free", action="store_true",
                   help="PD/HC stream lengths from disjoint ranges so "
                        "per-class train window counts never tie (the "
                        "reference GCLLoss is 0/0=NaN on exact ties)")
    p.add_argument("--out", default="artifacts/parity/parity_weargait_report.json")
    ns = p.parse_args()

    from gaitpd.data.synthetic import make_weargait_streams

    report = {"epochs": ns.epochs, "async": ns.async_loading, "wm": ns.wm,
              "tie_free": ns.tie_free, "n_folds": ns.n_folds,
              "per_class": ns.per_class, "strength": ns.strength,
              "single_mod": ns.single_mod, "baseline": ns.baseline,
              "baseline_torch_init": ns.baseline_torch_init,
              "strength_effective": True,  # --strength reaches the generator
              "seeds": {}}
    # seed-merge mode (r4): extend an existing report with new seeds instead
    # of rerunning everything in one invocation. Seeds are keyed per-seed so
    # the merge is exact; config fields must match. A field absent from a
    # previous report is tolerated (pre-r4b reports only ever ran at the
    # defaults above) but warned about explicitly — don't assume silently
    # (ADVICE r4).
    config_keys = ("epochs", "async", "wm", "tie_free", "n_folds",
                   "per_class", "strength", "single_mod", "baseline",
                   "baseline_torch_init")
    out_path = Path(ns.out)
    if out_path.exists():
        prev = json.loads(out_path.read_text())
        missing = [k for k in config_keys if k not in prev]
        if missing:
            print(f"[merge] WARNING: previous report lacks config fields "
                  f"{missing}; assuming they were run at the current values "
                  f"{[report[k] for k in missing]} (pre-r4b reports only "
                  "ever used CLI defaults)", flush=True)

        def prev_val(k):
            v = prev.get(k, report[k])
            if (k == "strength" and v == 0.5
                    and not prev.get("strength_effective")):
                # legacy (pre-r5) reports recorded the then-unused flag
                # default; the generator actually ran at its fixed 0.8.
                # Post-fix reports carry strength_effective=True and a
                # recorded 0.5 is a genuine 0.5 run — never normalize it.
                return 0.8
            return v

        same = all(prev_val(k) == report[k] for k in config_keys)
        if same:
            report["seeds"] = dict(prev.get("seeds", {}))
            print(f"[merge] extending {ns.out} "
                  f"({len(report['seeds'])} seeds already present)",
                  flush=True)
        else:
            print(f"[merge] {ns.out} exists with a DIFFERENT config — "
                  "starting fresh", flush=True)
    for seed in ns.seeds:
        if str(seed) in report["seeds"] or seed in report["seeds"]:
            print(f"[merge] seed {seed} already present, skipping", flush=True)
            continue
        n = ns.n_folds * ns.per_class + 2
        streams, pd_ids, hc_ids = make_weargait_streams(
            n_pd=n, n_hc=n, t_frames=500, seed=seed, tie_free=ns.tie_free,
            strength=ns.strength,
        )
        print(f"=== seed {seed}: gaitpd ===", flush=True)
        ours = run_gaitpd(streams, pd_ids, hc_ids, seed, ns.epochs,
                          ns.n_folds, ns.per_class, ns.async_loading, ns.wm,
                          single_mod=ns.single_mod, baseline=ns.baseline,
                          baseline_torch_init=ns.baseline_torch_init)
        print(f"=== seed {seed}: torch reference ===", flush=True)
        with tempfile.TemporaryDirectory() as td:
            ref = run_reference(streams, pd_ids, hc_ids, seed, ns.epochs,
                                ns.n_folds, ns.per_class, ns.async_loading,
                                Path(td), ns.wm, single_mod=ns.single_mod,
                                baseline=ns.baseline)
        # str keys on insert: merged dicts otherwise mix JSON-loaded str
        # keys with in-session int keys (ADVICE r4)
        report["seeds"][str(seed)] = {
            "gaitpd_macro": ours["macro"][0],
            "reference_macro": ref["macro"],
            "gaitpd_masks": ours["masks"],
            "reference_masks": ref["masks"],
        }
        print(f"[seed {seed}] gaitpd macro={ours['macro'][0]:.2f}% "
              f"reference macro={ref['macro']:.2f}%", flush=True)
        Path(ns.out).write_text(
            json.dumps(report, indent=1, default=str)
        )

    # paired per-seed statistics (VERDICT r1 item 10)
    sys.path.insert(0, str(Path(__file__).parent))
    from parity_check import paired_stats

    g = [v["gaitpd_macro"] for v in report["seeds"].values()]
    r = [v["reference_macro"] for v in report["seeds"].values()]
    report["macro_summary"] = {
        "gaitpd_mean": float(np.mean(g)),
        "reference_mean": float(np.mean(r)),
        "gap": float(np.mean(g) - np.mean(r)),
        "stats": paired_stats(g, r),
    }
    print(json.dumps(report["macro_summary"], indent=1))
    Path(ns.out).write_text(
        json.dumps(report, indent=1, default=str)
    )


if __name__ == "__main__":
    main()
