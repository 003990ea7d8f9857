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


def bench_ondevice(engine, batch: int, reps: int = 1000):
    """What the serving predict costs ON THE CHIP, separated from the relay
    round-trip (VERDICT r3 item 10): one dispatch runs a lax.scan of `reps`
    dependency-chained predicts (each iteration's inputs are perturbed by
    0 x the previous probabilities, which serialises the chain without
    changing the numbers), then a device->host copy of a scalar closes the
    timing. The end-to-end numbers elsewhere in this script include the
    ~30 ms tunnel round-trip per dispatch; this one amortises it 1/reps."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    xs = tuple(
        jnp.asarray(rng.normal(size=(batch, 64, c)), jnp.float32)
        for c in (2, 13, 24)
    )
    mask = jnp.asarray([True, True, True])
    model = engine.model

    @jax.jit
    def chained(params, xw, xi, xm, mask):
        def body(carry, _):
            cw, ci, cm = carry
            lgs = model.apply(params, cw, ci, cm)
            probs = jnp.stack([jax.nn.softmax(lg, -1) for lg in lgs])
            mk = mask.astype(probs.dtype)[:, None, None]
            p = jnp.sum(probs * mk, 0) / jnp.maximum(jnp.sum(mk), 1.0)
            eps = jnp.sum(p) * 0.0
            return (cw + eps, ci + eps, cm + eps), ()
        (cw, _, _), _ = jax.lax.scan(body, (xw, xi, xm), None, length=reps)
        return jnp.sum(cw[..., 0])

    # warm TWICE with the chain closed by float(): on this container's TPU
    # relay the remote compile is asynchronous and block_until_ready can
    # return before it completes — the first closed-chain call absorbs the
    # compile (measured: 96 s at batch 64), the second is steady-state.
    float(chained(engine.params, *xs, mask))
    float(chained(engine.params, *xs, mask))
    t0 = time.perf_counter()
    out = chained(engine.params, *xs, mask)
    float(out)  # device->host copy closes the dependency chain
    dt = time.perf_counter() - t0
    # at reps=1000 the ~30 ms relay round-trip is <3% of any total here
    per_predict_ms = dt / reps * 1e3
    out = {
        "mode": "ondevice",
        "batch": batch,
        "chained_reps": reps,
        "ondevice_predict_ms": round(per_predict_ms, 4),
        "ondevice_windows_per_s": round(batch / (per_predict_ms / 1e3), 1),
    }
    print(json.dumps(out))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--throughput", type=int, default=0, metavar="N_SESSIONS",
                    help="run throughput mode with N concurrent sessions")
    ap.add_argument("--ondevice", action="store_true",
                    help="time the batched predict on-chip via a "
                         "dependency-chained scan (excludes the relay "
                         "round-trip that dominates the e2e numbers)")
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
    if args.ondevice:
        for batch in (64, 1024, 8192):
            bench_ondevice(engine, batch)
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
