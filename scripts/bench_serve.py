"""Serving-path latency: WearGaitEngine.predict_windows p50/p99 on the
current platform, for single-window and batched requests, full vs any-subset
modality masks (the relaxed-input serving path — one compiled fn for all
masks, no recompiles between requests).

Usage: python scripts/bench_serve.py [--reps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.serve import WearGaitEngine

    rng = np.random.default_rng(0)
    model = WearGaitThreeModal(synchronized=True)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 64, 2)), jnp.zeros((2, 64, 13)), jnp.zeros((2, 64, 24)),
    )
    engine = WearGaitEngine(params)  # latency is params-independent
    print(f"platform: {jax.devices()[0].platform}")
    for batch in (1, 64, 1024):
        windows = {
            m: rng.normal(size=(batch, 64, c)).astype(np.float32)
            for m, c in (("walkway", 2), ("insole", 13), ("imu", 24))
        }
        for mask_name, mask in (("W+I+M", None), ("I+M", ("insole", "imu"))):
            sel = (
                windows
                if mask is None
                else {m: v for m, v in windows.items() if m in mask}
            )
            engine.predict_windows(sel)  # warmup/compile
            lats = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = engine.predict_windows(sel)
                np.asarray(out)
                lats.append((time.perf_counter() - t0) * 1e3)
            lats = np.sort(lats)
            print(
                json.dumps(
                    {
                        "batch": batch,
                        "mask": mask_name,
                        "p50_ms": round(float(lats[len(lats) // 2]), 3),
                        "p99_ms": round(float(lats[int(len(lats) * 0.99)]), 3),
                        "windows_per_s_p50": round(
                            batch / (lats[len(lats) // 2] / 1e3), 1
                        ),
                    }
                )
            )


if __name__ == "__main__":
    main()
