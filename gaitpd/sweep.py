"""Sweep runner: one process drives the whole (config x seed) grid on the
local mesh.

Replaces the reference's bash job farm (run_all.sh:9-31: fusion_type x 10
seeds round-robined over GPUs with nohup + stdout logs). Jobs run
sequentially against the single TPU mesh (data parallelism happens inside
each job); every job writes a JSON result file and is skipped on re-run if
that file exists — the restartability story the reference gets from
skip-if-done logs (SURVEY.md §5 failure detection).

    python -m gaitpd.sweep --mode fusion --dataset fbg --synchronized_loading \
        --fusion_types early late share_latent cheap_xattn \
        --seeds 0 1 2 3 4 40 41 42 43 44 --out sweeps/fusion_fbg
"""

from __future__ import annotations

import argparse
import json
import time
import traceback
from pathlib import Path


def run_job(mode: str, job_args: dict, out_path: Path) -> dict:
    t0 = time.time()
    try:
        if mode == "fusion":
            from gaitpd.train.baseline_drivers import BaselineArgs, main

            result = main(BaselineArgs(kind="fusion", **job_args))
        elif mode in ("deepav", "focal", "taca"):
            from gaitpd.train.baseline_drivers import BaselineArgs, main

            result = main(BaselineArgs(kind=mode, **job_args))
        elif mode == "weargait":
            from gaitpd.train.weargait_driver import WearGaitArgs, run_cv

            result = run_cv(WearGaitArgs(**job_args))
        elif mode == "fbg_fog":
            from gaitpd.train.fbg_fog_driver import FbgFogArgs, main

            result = main(FbgFogArgs(**job_args))
        else:
            raise ValueError(mode)
        status = "ok"
    except Exception:  # noqa: BLE001 — a failed job must not kill the sweep
        result = {"traceback": traceback.format_exc()}
        status = "failed"
    payload = {
        "status": status,
        "mode": mode,
        "args": {k: v for k, v in job_args.items()},
        "result": result,
        "runtime_s": round(time.time() - t0, 1),
    }
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(payload, indent=2, default=str))
    return payload


def main(argv=None):
    p = argparse.ArgumentParser("gaitpd sweep runner")
    p.add_argument("--mode", default="fusion",
                   choices=["fusion", "deepav", "focal", "taca", "weargait", "fbg_fog"])
    p.add_argument("--dataset", default="fbg")
    # reference run_all.sh:9-13 grid defaults
    p.add_argument("--fusion_types", nargs="+",
                   default=["early", "late", "share_latent", "cheap_xattn"])
    p.add_argument("--seeds", nargs="+", type=int,
                   default=[0, 1, 2, 3, 4, 40, 41, 42, 43, 44])
    p.add_argument("--synchronized_loading", action="store_true")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--n_folds_cap", type=int, default=None)
    p.add_argument("--wm", default="ce")
    p.add_argument("--out", default="sweeps/run")
    p.add_argument("--rerun", action="store_true", help="ignore existing results")
    p.add_argument("--vmap_seeds", action="store_true",
                   help="fusion/deepav/focal/taca: train every (seed x fold) "
                        "instance of a configuration in ONE vmapped compiled "
                        "program instead of sequential jobs (the TPU-native "
                        "replacement for run_all.sh's GPU job farm)")
    ns = p.parse_args(argv)

    out_root = Path(ns.out)
    variants = ns.fusion_types if ns.mode == "fusion" else [ns.mode]

    if ns.vmap_seeds and ns.mode in ("fusion", "deepav", "focal", "taca"):
        return _vmap_seeds_sweep(ns, out_root, variants)

    jobs = [(v, s) for v in variants for s in ns.seeds]
    print(f"[SWEEP] {len(jobs)} jobs -> {out_root}")
    done = skipped = failed = 0
    for variant, seed in jobs:
        name = f"{ns.mode}_{ns.dataset}_{variant}_seed{seed}.json"
        out_path = out_root / name
        if out_path.exists() and not ns.rerun:
            print(f"[SKIP] {name}")
            skipped += 1
            continue
        job_args = dict(dataset=ns.dataset, seed=seed, synthetic=ns.synthetic,
                        verbose=False)
        if ns.mode == "fusion":
            job_args.update(fusion_type=variant, synced=ns.synchronized_loading,
                            epochs=ns.epochs, n_folds_cap=ns.n_folds_cap)
        elif ns.mode in ("deepav", "focal", "taca"):
            job_args.update(synced=ns.synchronized_loading, wm=ns.wm,
                            epochs=ns.epochs, n_folds_cap=ns.n_folds_cap)
        elif ns.mode == "weargait":
            job_args.pop("dataset")
            job_args.update(wm=ns.wm, epochs=ns.epochs or 50,
                            n_folds_cap=ns.n_folds_cap)
        elif ns.mode == "fbg_fog":
            job_args.update(wm=ns.wm, synchronized_loading=ns.synchronized_loading,
                            epochs=ns.epochs, n_folds_cap=ns.n_folds_cap)
        print(f"[RUN ] {name}")
        payload = run_job(ns.mode, job_args, out_path)
        if payload["status"] == "ok":
            done += 1
        else:
            failed += 1
            print(f"[FAIL] {name}")
    print(f"[SWEEP] done={done} skipped={skipped} failed={failed}")
    return {"done": done, "skipped": skipped, "failed": failed}


def _vmap_seeds_sweep(ns, out_root: Path, variants) -> dict:
    """One vmapped program per configuration trains every pending (seed x
    fold) instance simultaneously (gaitpd.train.vmap_cv). Result files keep
    the sequential sweep's schema, so skip-if-done/resume interoperate."""
    from gaitpd.train.vmap_cv import run_baseline_seeds_vmapped

    done = skipped = failed = 0
    for variant in variants:
        pending = []
        for seed in ns.seeds:
            name = f"{ns.mode}_{ns.dataset}_{variant}_seed{seed}.json"
            if (out_root / name).exists() and not ns.rerun:
                print(f"[SKIP] {name}")
                skipped += 1
            else:
                pending.append(seed)
        if not pending:
            continue
        print(f"[RUN ] {variant}: {len(pending)} seeds vmapped")
        t0 = time.time()
        try:
            results = run_baseline_seeds_vmapped(
                ns.dataset, ns.mode if ns.mode != "fusion" else "fusion",
                variant, pending, synced=ns.synchronized_loading, wm=ns.wm,
                epochs=ns.epochs, n_folds_cap=ns.n_folds_cap,
                synthetic=ns.synthetic,
            )
            status = "ok"
        except Exception:  # noqa: BLE001 — a failed variant must not kill the sweep
            print(f"[FAIL] {variant}\n{traceback.format_exc()}")
            failed += len(pending)
            continue
        dt = round(time.time() - t0, 1)
        out_root.mkdir(parents=True, exist_ok=True)
        for seed in pending:
            name = f"{ns.mode}_{ns.dataset}_{variant}_seed{seed}.json"
            payload = {
                "status": status,
                "mode": ns.mode,
                "args": dict(dataset=ns.dataset, seed=seed,
                             synthetic=ns.synthetic, verbose=False,
                             fusion_type=variant, wm=ns.wm,
                             synced=ns.synchronized_loading, epochs=ns.epochs,
                             n_folds_cap=ns.n_folds_cap, vmap_seeds=True),
                "result": results[seed],
                # the whole batch trains in ONE vmapped program, so the
                # honest per-seed share is dt/n; the batch total is kept
                # under its own name for wall-clock accounting
                "runtime_s": round(dt / max(1, len(pending)), 3),
                "runtime_s_batch": dt,
            }
            (out_root / name).write_text(json.dumps(payload, indent=2,
                                                    default=str))
            done += 1
    print(f"[SWEEP] done={done} skipped={skipped} failed={failed}")
    return {"done": done, "skipped": skipped, "failed": failed}


if __name__ == "__main__":
    main()
