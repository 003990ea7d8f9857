"""Headline benchmark: gait windows/sec/chip for the fused
(z-score + window + 3-stream forward) WearGait pipeline.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "windows/sec/chip", "vs_baseline": N}

value        — throughput of the jit-fused JAX pipeline on the default
               platform (the TPU chip under the driver).
vs_baseline  — ratio vs a torch-CPU implementation of the same computation
               (the reference stack is torch; BASELINE.md north star is
               >=10x windows/sec/chip over the CPU baseline).
"""

from __future__ import annotations

import json
import time

import numpy as np

N_SUBJECTS = 192
T_FRAMES = 64 * 64  # -> 64 windows per subject per modality
WIN = HOP = 64
CHANNELS = {"walkway": 2, "insole": 13, "imu": 24}
ITERS = 20


def make_raw(rng):
    return {
        m: rng.normal(size=(N_SUBJECTS, T_FRAMES, c)).astype(np.float32)
        for m, c in CHANNELS.items()
    }


def bench_jax(raw) -> float:
    import jax
    import jax.numpy as jnp

    from gaitpd.data.pipeline import window_stream, zscore
    from gaitpd.models.multitask import WearGaitThreeModal

    model = WearGaitThreeModal(synchronized=True)
    stats = {
        m: (jnp.zeros(c, jnp.float32), jnp.ones(c, jnp.float32))
        for m, c in CHANNELS.items()
    }
    dev_raw = {m: jnp.asarray(v) for m, v in raw.items()}
    n_windows = N_SUBJECTS * (T_FRAMES // HOP)

    def preproc(x, mean, std):
        z = zscore(x, mean, std)
        wins = jax.vmap(lambda s: window_stream(s, WIN, HOP))(z)
        return wins.reshape(-1, WIN, x.shape[-1])

    sample = {m: preproc(dev_raw[m][:2], *stats[m]) for m in CHANNELS}
    params = model.init(
        jax.random.PRNGKey(0), sample["walkway"], sample["insole"], sample["imu"]
    )

    @jax.jit
    def pipeline(params, raw):
        xw = preproc(raw["walkway"], *stats["walkway"])
        xi = preproc(raw["insole"], *stats["insole"])
        xm = preproc(raw["imu"], *stats["imu"])
        lw, li, lm = model.apply(params, xw, xi, xm)
        probs = (
            jax.nn.softmax(lw) + jax.nn.softmax(li) + jax.nn.softmax(lm)
        ) / 3.0
        return jnp.argmax(probs, -1)

    out = pipeline(params, dev_raw)
    jax.block_until_ready(out)  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = pipeline(params, dev_raw)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return n_windows * ITERS / dt


def bench_torch_cpu(raw) -> float:
    """Reference-style torch-CPU pipeline on the same computation (numpy
    z-score + windowing, small conv encoders + shared backbone forward)."""
    import torch
    import torch.nn as nn

    torch.set_num_threads(1)

    class Stream(nn.Module):
        def __init__(self, c_in, deep=False):
            super().__init__()
            self.deep = deep
            if deep:
                self.c1 = nn.Conv1d(c_in, 24, 5, padding=2)
                self.c2 = nn.Conv1d(24, 12, 3, padding=1)
                self.skip = nn.Conv1d(24, 12, 1)
            else:
                self.c1 = nn.Conv1d(c_in, 12, 3, padding=1)
            self.ln = nn.LayerNorm(12)

        def forward(self, x):  # (B, T, C)
            x = x.transpose(1, 2)
            if self.deep:
                h = torch.nn.functional.gelu(self.c1(x))
                y = torch.nn.functional.gelu(self.c2(h) + self.skip(h))
            else:
                y = torch.nn.functional.gelu(self.c1(x))
            return self.ln(y.transpose(1, 2))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.enc = nn.ModuleDict(
                {
                    "walkway": Stream(2),
                    "insole": Stream(13, deep=True),
                    "imu": Stream(24),
                }
            )
            self.bb = nn.Conv1d(12, 16, 3, padding=1)
            self.head = nn.Linear(128, 2)

        def one(self, x, m):
            z = torch.relu(self.bb(self.enc[m](x).transpose(1, 2)))
            z = torch.nn.functional.adaptive_avg_pool1d(z, 8)
            return self.head(z.flatten(1))

        def forward(self, xs):
            return [self.one(xs[m], m) for m in xs]

    net = Net().eval()
    # subset: torch CPU on one core is slow; scale by measured per-window time
    n_sub = 8
    n_windows = n_sub * (T_FRAMES // HOP)

    def run_once():
        xs = {}
        for m, c in CHANNELS.items():
            x = raw[m][:n_sub]
            mean = x.reshape(-1, c).mean(0)
            std = x.reshape(-1, c).std(0) + 1e-6
            z = (x - mean) / std
            wins = z.reshape(n_sub, T_FRAMES // WIN, WIN, c).reshape(-1, WIN, c)
            xs[m] = torch.from_numpy(wins)
        with torch.no_grad():
            logits = net(xs)
            probs = sum(torch.softmax(l, 1) for l in logits) / 3.0
            return probs.argmax(1)

    run_once()  # warmup
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run_once()
    dt = time.perf_counter() - t0
    return n_windows * reps / dt


def main():
    rng = np.random.default_rng(0)
    raw = make_raw(rng)
    jax_tput = bench_jax(raw)
    cpu_tput = bench_torch_cpu(raw)
    print(
        json.dumps(
            {
                "metric": "weargait_preproc_fwd_throughput",
                "value": round(jax_tput, 1),
                "unit": "windows/sec/chip",
                "vs_baseline": round(jax_tput / cpu_tput, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
