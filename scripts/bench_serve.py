"""Serving-path benchmarks on the current platform.

Latency mode (default): WearGaitEngine.predict_windows p50/p99 for
single-window and batched requests, full vs any-subset modality masks (the
relaxed-input serving path — one compiled fn for all masks, no recompiles
between requests).

Throughput mode (--throughput N): N concurrent StreamingSessions push raw
frames through the native C++ ring buffers; poll_sessions drains them into
ONE batched predict per modality-subset group (vs one dispatch per session).
Emits windows/s for both strategies so the serving path has a
chip-utilization number, not just p50 latency (VERDICT r2 item 10).

Usage: python scripts/bench_serve.py [--reps 200] [--throughput 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_throughput(engine, n_sessions: int, rounds: int = 8):
    """Stream n_sessions concurrent subjects (mixed modality subsets) through
    the ring buffers; classify every complete window per round, batched vs
    per-session. Reports end-to-end (push+pop+predict) windows/s."""
    from gaitpd.serve import StreamingSession, poll_sessions

    rng = np.random.default_rng(0)
    subsets = [("walkway", "insole", "imu"), ("insole", "imu"), ("imu",)]
    chans = {"walkway": 2, "insole": 13, "imu": 24}

    def fresh():
        return [
            StreamingSession(engine, modalities=subsets[i % len(subsets)])
            for i in range(n_sessions)
        ]

    # each round pushes 2 windows' worth of frames per session (64*2=128)
    frames = {
        i: {m: rng.normal(size=(128, chans[m])).astype(np.float32)
            for m in subsets[i % len(subsets)]}
        for i in range(n_sessions)
    }

    def run(batched: bool):
        sessions = fresh()
        # warmup (compile every mask group)
        for i, s in enumerate(sessions):
            for m, x in frames[i].items():
                s.push(m, x)
        (poll_sessions(sessions) if batched
         else [s.poll() for s in sessions])
        n_windows = 0
        t0 = time.perf_counter()
        for _ in range(rounds):
            for i, s in enumerate(sessions):
                for m, x in frames[i].items():
                    s.push(m, x)
            if batched:
                outs = poll_sessions(sessions)
            else:
                outs = [s.poll() for s in sessions]
            n_windows += sum(
                o["window_probs"].shape[0] for o in outs if o is not None
            )
        dt = time.perf_counter() - t0
        return n_windows / dt, n_windows

    per_session_wps, n = run(batched=False)
    batched_wps, _ = run(batched=True)
    print(json.dumps({
        "mode": "throughput",
        "n_sessions": n_sessions,
        "windows_classified": n,
        "per_session_poll_windows_per_s": round(per_session_wps, 1),
        "batched_poll_windows_per_s": round(batched_wps, 1),
        "amortization_x": round(batched_wps / per_session_wps, 2),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--throughput", type=int, default=0, metavar="N_SESSIONS",
                    help="run throughput mode with N concurrent sessions")
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
    if args.throughput:
        bench_throughput(engine, args.throughput)
        return
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
