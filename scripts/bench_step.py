"""Time the full WearGait CAGrad train step (fwd + 3 cotangent bwd + in-graph
QP + SGD) at a range of batch sizes on the current platform.

Usage: python scripts/bench_step.py [--batches 1024,4096,8192] [--iters 50]

Reports per-step wall time, trained windows/s, and an MFU estimate from an
analytic FLOP count of the 3-stream model (VERDICT r1 item 9: the gap between
3.5M preproc-only and 139k trained windows/s is the perf frontier).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_PEAK_FLOPS = 394e12  # bf16; f32 ~ 197e12


def _apply_fn(model, fused: bool):
    if fused:
        from gaitpd.models.fused import make_fused_weargait_apply

        return make_fused_weargait_apply(model)
    return model.apply


def build_step(batch_size: int, precision: str = "highest",
               fused: bool = False, input_dtype: str = "float32",
               remat: str = "none", augment: bool = False):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", precision)

    from gaitpd.learning.mtl import make_method
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings,
        make_apply_adapters,
        make_loss_ctx,
        make_train_step,
    )

    b, t = batch_size, 64
    dt = jnp.dtype(input_dtype)
    rng = np.random.default_rng(0)
    xs = tuple(
        jnp.asarray(rng.normal(size=(b, t, c)), dt) for c in (2, 13, 24)
    )
    ys = tuple(jnp.asarray(rng.integers(0, 2, size=b), jnp.int32) for _ in range(3))

    model = WearGaitThreeModal(synchronized=True)
    aug_specs = aug_params = None
    if augment:
        from gaitpd.data.augment import AugmentSpec, make_aug_params

        aug_specs = (AugmentSpec(noise=True, axis_mask=True),) * 3
        aug_params = tuple(
            make_aug_params(noise_std=0.1, axis_p=0.2) for _ in range(3)
        )
    settings = StepSettings(
        n_streams=3, wm="gcl", synchronized=True,
        private_grads="sum_plus_own", remat=remat, augment=aug_specs,
    )
    ctx = make_loss_ctx(settings, [(5, 3)] * 3, aug_params=aug_params)
    tx = sgd_torch(1e-3)
    mtl = make_method("cagrad", 3, c=0.5)
    state, partition = init_train_state(model, tx, mtl, tuple(x[:2] for x in xs))
    train_apply, _ = make_apply_adapters(_apply_fn(model, fused), settings)
    train_step = make_train_step(train_apply, tx, settings, mtl, partition)
    step = jax.jit(train_step, donate_argnums=(0,))
    batch = {"xs": xs, "ys": ys, "valid": jnp.ones((b,), jnp.float32)}
    return step, state, batch, ctx


def build_step_foldvmap(n_folds: int, batch_size: int,
                        precision: str = "highest", fused: bool = False,
                        input_dtype: str = "float32", remat: str = "none"):
    """The vmapped-CV hot loop (gaitpd/train/vmap_cv.py): F independent fold
    states trained by ONE compiled step, fold axis stacked on top of the
    batch axis — effective batch F x B (VERDICT r2 item 4: the free
    utilization the single-fold knee leaves on the table)."""
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", precision)

    from gaitpd.learning.mtl import make_method
    from gaitpd.models.multitask import WearGaitThreeModal
    from gaitpd.train.loop import init_train_state
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings,
        make_apply_adapters,
        make_loss_ctx,
        make_train_step,
    )

    f, b, t = n_folds, batch_size, 64
    dt = jnp.dtype(input_dtype)
    rng = np.random.default_rng(0)
    xs = tuple(
        jnp.asarray(rng.normal(size=(f, b, t, c)), dt)
        for c in (2, 13, 24)
    )
    ys = tuple(
        jnp.asarray(rng.integers(0, 2, size=(f, b)), jnp.int32) for _ in range(3)
    )

    model = WearGaitThreeModal(synchronized=True)
    settings = StepSettings(
        n_streams=3, wm="gcl", synchronized=True,
        private_grads="sum_plus_own", remat=remat,
    )
    ctx = make_loss_ctx(settings, [(5, 3)] * 3)
    tx = sgd_torch(1e-3)
    mtl = make_method("cagrad", 3, c=0.5)
    states, partition = [], None
    for fold in range(f):
        st, partition = init_train_state(
            model, tx, mtl, tuple(x[fold, :2] for x in xs), seed=fold
        )
        states.append(st)
    state = jax.tree_util.tree_map(lambda *a: jnp.stack(a), *states)
    train_apply, _ = make_apply_adapters(_apply_fn(model, fused), settings)
    train_step = make_train_step(train_apply, tx, settings, mtl, partition)
    step = jax.jit(
        jax.vmap(train_step, in_axes=(0, 0, 0, None)), donate_argnums=(0,)
    )
    batch = {"xs": xs, "ys": ys, "valid": jnp.ones((f, b), jnp.float32)}
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(f))
    return step, state, batch, ctx, keys


def model_flops_per_window(t: int = 64) -> float:
    """Analytic forward FLOPs per window for WearGaitThreeModal (defaults:
    enc_out 12, insole hidden 24, backbone 16ch/k3 -> pool 8).
    Backward ~2x forward; CAGrad runs 3 cotangent passes -> fwd + 3*2*fwd."""
    conv = lambda cin, cout, k, tt: 2 * cin * cout * k * tt
    enc = (
        conv(2, 12, 3, t)  # walkway
        + conv(13, 24, 5, t) + conv(24, 12, 3, t) + conv(24, 12, 1, t)  # insole
        + conv(24, 12, 3, t)  # imu
    )
    backbone = 3 * conv(12, 16, 3, t)
    pool = 3 * 2 * 16 * t * 8
    heads = 3 * 2 * 128 * 2
    fwd = enc + backbone + pool + heads
    return fwd * (1 + 3 * 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,2048,4096,8192,16384")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--folds", type=int, default=0,
                    help="vmap the step over F stacked fold states "
                         "(effective batch F x B)")
    ap.add_argument("--fused", action="store_true",
                    help="use the block-diagonal fused forward "
                         "(gaitpd/models/fused.py)")
    ap.add_argument("--input_dtype", default="float32",
                    help="HBM dtype of the input windows (bfloat16 halves "
                         "the dominant bandwidth term of this tiny-channel "
                         "model; params/optimizer state stay f32)")
    ap.add_argument("--remat", default="none",
                    choices=["none", "dots", "nothing"],
                    help="jax.checkpoint policy on the forward inside the 3 "
                         "cotangent pullbacks (VERDICT r3 item 1: trade the "
                         "~80x FLOP headroom for the dominant HBM traffic — "
                         "backward-pass re-reads of forward intermediates)")
    ap.add_argument("--augment", action="store_true",
                    help="enable the on-device augmentation stage "
                         "(noise+channel-mask on all 3 streams) inside the "
                         "step to measure its throughput cost")
    ap.add_argument("--cost_analysis", action="store_true",
                    help="also print the XLA-compiled step's own cost model "
                         "(FLOPs + HBM bytes accessed) and the implied "
                         "bandwidth-bound step-time floor at v5e peak")
    args = ap.parse_args()

    import jax

    if args.augment and args.folds:
        print("note: --augment applies to the single-fold step only; "
              "ignoring it for --folds")
    print(f"platform: {jax.devices()[0].platform} x{len(jax.devices())}")
    fpw = model_flops_per_window()
    for b in [int(x) for x in args.batches.split(",")]:
        if args.folds:
            step, state, batch, ctx, keys = build_step_foldvmap(
                args.folds, b, args.precision, fused=args.fused,
                input_dtype=args.input_dtype, remat=args.remat,
            )
            fold_in = jax.vmap(jax.random.fold_in, in_axes=(0, None))
            windows_per_step = args.folds * b
        else:
            step, state, batch, ctx = build_step(
                b, args.precision, fused=args.fused,
                input_dtype=args.input_dtype, remat=args.remat,
                augment=args.augment,
            )
            keys = jax.random.PRNGKey(0)
            fold_in = jax.random.fold_in
            windows_per_step = b
        if args.cost_analysis:
            ca = step.lower(state, batch, keys, ctx).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", 0.0))
            hbm = float(ca.get("bytes accessed", 0.0))
            print(json.dumps({
                "batch": b,
                "xla_flops_per_step": flops,
                "xla_hbm_bytes_per_step": hbm,
                "hbm_bytes_per_window": round(hbm / max(1, windows_per_step)),
                "bandwidth_floor_ms_at_819GBs": round(hbm / 819e9 * 1e3, 3),
                "compute_floor_ms_at_peak": round(
                    flops / V5E_PEAK_FLOPS * 1e3, 3
                ),
            }))
        t0 = time.perf_counter()
        state, metrics = step(state, batch, keys, ctx)
        jax.block_until_ready(metrics["losses"])
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step(state, batch, fold_in(keys, i), ctx)
        jax.block_until_ready(metrics["losses"])
        dt = (time.perf_counter() - t0) / args.iters
        tput = windows_per_step / dt
        mfu = tput * fpw / V5E_PEAK_FLOPS
        print(
            json.dumps(
                {
                    "batch": b,
                    **({"folds": args.folds} if args.folds else {}),
                    "step_ms": round(dt * 1e3, 3),
                    "trained_windows_per_s": round(tput, 1),
                    "mfu_pct_bf16peak": round(100 * mfu, 4),
                    "compile_s": round(compile_s, 1),
                }
            )
        )


if __name__ == "__main__":
    main()
