"""Init-stream swap for the e100 skeleton failure-rate gap (VERDICT r4
item 7 — the last unattributed number in the parity matrix).

Context: the 48-seed discriminative skeleton row (`skeleton_ce_joint`,
100 epochs, strength 5.0, parity_skel_joint_e100_report.json) shows
+5.63 [+1.3, +9.9] driven by a latching-failure-rate difference (gaitpd
4/48 seeds < 85% vs reference 11/48). Matched-init+order training is 12/12
fold-exact and every stochastic input law is verified equal, so the gap is
realized by one of the two distribution-matched non-goal streams: the INIT
draws or the BATCH-ORDER draws. This harness names the stream:

  cell "native": parity_check.run_reference's exact protocol (one
                 set_random_seed per seed, native torch init and order) —
                 the neutrality control; its per-seed values must reproduce
                 the recorded report's reference column bit-for-bit.
  cell "swap":   identical, except each fold's torch model init is
                 OVERWRITTEN with the init gaitpd's native run draws for
                 that seed (jax.random.PRNGKey(seed), the same variables
                 for every fold — gaitpd/train/loop.py::init_train_state).
                 The torch data order is untouched (the model construction
                 still consumes its native RNG draws before the overwrite).
                 If the failure rate drops toward gaitpd's 4/48, the INIT
                 stream realizes the gap; if it stays at ~11/48, the
                 BATCH-ORDER stream does (by elimination — step math is
                 matched-proof exact at this config).

Run:
  python scripts/parity_initswap.py --cell native --seeds 0 1 2 3
  python scripts/parity_initswap.py --cell swap --seeds $(seq 0 47)
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

FAIL_THRESHOLD = 85.0  # per-seed mean acc below this = latching failure
EPOCHS = 100
STRENGTH = 5.0


def _gaitpd_native_init(seed):
    """The exact init gaitpd's native skeleton run uses for this seed:
    PRNGKey(seed), identical across folds (fbg_fog_driver.py passes
    seed=args.seed to init_train_state for every fold)."""
    import jax
    import jax.numpy as jnp

    from gaitpd.config import FBG_FOG_DIMS
    from gaitpd.models.multitask import SkelModalityModel

    dims = FBG_FOG_DIMS["fog"]
    fmodel = SkelModalityModel(
        skeleton_output_dim=dims.skeleton_output_dim,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
    )
    return fmodel.init(
        jax.random.PRNGKey(seed), jnp.zeros((2, dims.pose_length, 21), jnp.float32)
    )


def run_cell(cell: str, seed: int):
    """parity_check.run_reference's skeleton_ce_joint protocol, with the
    optional init transplant. Returns per-fold avg accs."""
    sys.path.insert(0, str(REF / "train"))
    sys.path.insert(0, str(REF))
    import torch

    torch.set_num_threads(1)
    if not torch.cuda.is_available():
        torch.cuda.FloatTensor = torch.FloatTensor

    import fbg_fog_train as ref_driver
    import utilities as ref_utils
    from data_processing import dataloader_fbg_fog as ref_loader

    from gaitpd.data.synthetic import make_fog_reader
    from parity_matched import _transplant_skel

    reader = make_fog_reader(seed=seed, strength=STRENGTH, pose_per_joint=True)

    orig_loaders = ref_loader.create_fusion_loaders
    orig_choose = ref_utils.choose_model

    def create_loaders(*args, **kwargs):
        kwargs["num_workers"] = 0
        return orig_loaders(*args, **kwargs)

    variables = _gaitpd_native_init(seed) if cell == "swap" else None

    def choose_swapped(cargs, params, device):
        model = orig_choose(cargs, params, device)
        if cell == "swap":
            return _transplant_skel(model, variables)
        return model

    import types

    args = types.SimpleNamespace(
        dataset="fog", modality="skeleton", consistency_lambda=1.0,
        wm="ce", synchronized_loading=False, alpha=0.0, max_norm=1.0,
        ldam_s=30.0, ldam_m=0.5, gcl_m=0.2, gcl_s=25.0, noise_mul=0.0,
        drw_warmup=0, use_norm_and_cos=False, save_loss_plots=False,
        seed=seed,
    )
    try:
        from configs import FBG_FOG_PARAMS
    except ImportError:
        from train.configs import FBG_FOG_PARAMS
    FBG_FOG_PARAMS["fog"]["epochs"] = EPOCHS

    ref_driver.create_fusion_loaders = create_loaders
    ref_driver.choose_model = choose_swapped
    try:
        ref_utils.set_random_seed(seed)
        folds = ref_utils.generate_class_stratified_folds(reader, "fog")
        results = []
        for idx, (t, e) in enumerate(folds, 1):
            buf = io.StringIO()
            with redirect_stdout(buf):
                results.append(ref_driver.train_one_fold(idx, reader, args, t, e))
    finally:
        ref_driver.create_fusion_loaders = ref_loader.create_fusion_loaders
        ref_driver.choose_model = orig_choose
    return [float(r[2]) for r in results]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cell", choices=["swap", "native"], default="swap")
    p.add_argument("--seeds", nargs="+", type=int, default=list(range(48)))
    p.add_argument("--out", default=None)
    ns = p.parse_args()
    out = Path(ns.out or f"artifacts/parity/parity_initswap_{ns.cell}_report.json")
    out.parent.mkdir(parents=True, exist_ok=True)

    report = {"cell": ns.cell, "epochs": EPOCHS, "strength": STRENGTH,
              "fail_threshold": FAIL_THRESHOLD, "seeds": {}}
    if out.exists():
        prev = json.loads(out.read_text())
        if prev.get("cell") == ns.cell and prev.get("epochs") == EPOCHS:
            report["seeds"] = dict(prev.get("seeds", {}))
            print(f"[merge] {len(report['seeds'])} seeds present", flush=True)

    for seed in ns.seeds:
        if str(seed) in report["seeds"]:
            continue
        accs = run_cell(ns.cell, seed)
        report["seeds"][str(seed)] = {
            "folds": accs, "mean": float(np.mean(accs)),
        }
        print(f"[{ns.cell}][seed {seed}] mean={np.mean(accs):.2f}% "
              f"folds={[round(a, 1) for a in accs]}", flush=True)
        out.write_text(json.dumps(report, indent=1))

    means = np.array([v["mean"] for v in report["seeds"].values()])
    report["summary"] = {
        "n_seeds": int(len(means)),
        "mean": float(means.mean()),
        "failures_below_85": int((means < FAIL_THRESHOLD).sum()),
        "seeds_at_99_plus": int((means >= 99.0).sum()),
    }
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report["summary"], indent=1))


if __name__ == "__main__":
    main()
