"""Trajectory diagnostic for the matched-run GCL gap: per-epoch eval curves.

Runs one seed of the matched harness with the reference's per-epoch eval
accuracies parsed from its own prints, and the gaitpd replay instrumented to
record the same curve. Shows WHERE in training the two frameworks diverge.
"""
import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from parity_matched import run_reference_instrumented  # noqa: E402

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 7
EPOCHS = int(sys.argv[2]) if len(sys.argv) > 2 else 25
ALPHA = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0

import parity_matched as pm  # noqa: E402

# patch run_reference_instrumented's redirect to keep the buffer: simplest is
# to re-run its body inline — instead, monkeypatch io.StringIO to keep refs.
bufs = []
_orig_stringio = io.StringIO


class KeepBuf(_orig_stringio):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        bufs.append(self)


pm.io.StringIO = KeepBuf

from gaitpd.data.synthetic import make_fog_reader  # noqa: E402

sys.path.insert(0, "/root/reference/train")
import utilities as ref_utils  # noqa: E402

reader = make_fog_reader(seed=SEED, strength=0.6)
folds = ref_utils.generate_class_stratified_folds(reader, "fog")
print(f"seed {SEED}: running reference instrumented ({len(folds)} folds)...")
ref_folds = run_reference_instrumented(reader, SEED, EPOCHS, folds, alpha=ALPHA)

pat = re.compile(
    r"Eval loss=([-\d.]+)\s+skel=([-\d.]+)% sen=([-\d.]+)% avg=([-\d.]+)%")
ref_curves = []
for buf in bufs:
    rows = [(float(m.group(2)), float(m.group(3)), float(m.group(4)))
            for m in pat.finditer(buf.getvalue())]
    if rows:
        ref_curves.append(rows)
print(f"parsed {len(ref_curves)} reference curves of lengths "
      f"{[len(c) for c in ref_curves]}")


# gaitpd replay with per-epoch curve recording: inline copy of
# run_gaitpd_on_stream's loop with instrumentation
def gaitpd_curve(fold_rec, epochs, alpha):
    import jax
    import jax.numpy as jnp

    from gaitpd.config import FBG_FOG_DIMS
    from gaitpd.learning.mtl import build_flat_partition, make_method
    from gaitpd.models.multitask import MultiModalMultiTask
    from gaitpd.train.optim import sgd_torch
    from gaitpd.train.step import (
        StepSettings, TrainState, make_apply_adapters, make_loss_ctx,
        make_train_step,
    )

    dims = FBG_FOG_DIMS["fog"]
    model = MultiModalMultiTask(
        skeleton_output_dim=dims.skeleton_output_dim,
        sensor_out_channels=dims.sensor_out_channels,
        sensor_length=dims.sensor_length,
        pose_length=dims.pose_length,
        shared_out_channels=dims.shared_out_channels,
        backbone_dim=dims.backbone_dim,
        num_classes=dims.num_classes,
        use_norm=True, use_cosine=True, synchronized_loading=False,
    )
    variables = fold_rec["variables"]

    def flatten_skel(x):
        x = np.asarray(x, np.float32)
        return x.reshape(x.shape[0], x.shape[1], -1)

    def unpack(b):
        xs = (jnp.asarray(flatten_skel(b["skeleton"])),
              jnp.asarray(np.asarray(b["sensor"], np.float32)))
        ys = (jnp.asarray(np.asarray(b["label_skeleton"]), jnp.int32),
              jnp.asarray(np.asarray(b["label_sensor"]), jnp.int32))
        return xs, ys

    counts_pass = fold_rec["train_passes"][0]
    sk_counts = np.zeros(dims.num_classes, np.int64)
    se_counts = np.zeros(dims.num_classes, np.int64)
    for b in counts_pass:
        sk_counts += np.bincount(np.asarray(b["label_skeleton"]).ravel(),
                                 minlength=dims.num_classes)
        se_counts += np.bincount(np.asarray(b["label_sensor"]).ravel(),
                                 minlength=dims.num_classes)

    settings = StepSettings(
        n_streams=2, wm="gcl", synchronized=False, gcl_m=0.2, gcl_s=25.0,
        noise_mul=0.0, drw_warmup=0, consistency_lambda=1.0,
        private_grads="sum",
    )
    ctx = make_loss_ctx(settings, [sk_counts, se_counts])
    tx = sgd_torch(1e-3, 0.9, 1e-4)
    mtl = partition = None
    if alpha > 0:
        mtl = make_method("cagrad", 2, c=alpha, max_norm=1.0)
        bound = model.bind(variables)
        partition = build_flat_partition(
            variables, bound.shared_modules, bound.task_modules)
    state = TrainState(
        params=variables, opt_state=tx.init(variables),
        mtl_state=mtl.init_state() if mtl is not None else {},
        epoch=jnp.zeros((), jnp.int32),
    )
    train_apply, eval_apply = make_apply_adapters(model.apply, settings)
    step = jax.jit(make_train_step(train_apply, tx, settings, mtl, partition))
    eval_jit = jax.jit(lambda v, xs: eval_apply(v, xs, 0))

    train_epochs = fold_rec["train_passes"][1:]
    curve = []
    key = jax.random.PRNGKey(0)
    for ep, batches in enumerate(train_epochs):
        state = state.replace(epoch=jnp.asarray(ep, jnp.int32))
        for b in batches:
            xs, ys = unpack(b)
            batch = {"xs": xs, "ys": ys,
                     "valid": jnp.ones((xs[0].shape[0],), jnp.float32)}
            key, k = jax.random.split(key)
            state, _ = step(state, batch, k, ctx)
        ev = fold_rec["eval_passes"][ep] if ep < len(fold_rec["eval_passes"]) \
            else fold_rec["eval_passes"][-1]
        corr = np.zeros(2)
        tot = np.zeros(2)
        for b in ev:
            xs, ys = unpack(b)
            lg = eval_jit(state.params, xs)
            for i in range(2):
                corr[i] += int((np.argmax(np.asarray(lg[i]), -1)
                                == np.asarray(ys[i])).sum())
                tot[i] += ys[i].shape[0]
        vsk, vse = 100.0 * corr / np.maximum(tot, 1)
        curve.append((float(vsk), float(vse), float((vsk + vse) / 2)))
    return curve


for fi, fr in enumerate(ref_folds):
    ours = gaitpd_curve(fr, EPOCHS, ALPHA)
    theirs = ref_curves[fi] if fi < len(ref_curves) else []
    print(f"\n==== fold {fi} (ref best_avg={fr['best_avg']:.2f}, "
          f"ours best={max(c[2] for c in ours):.2f}) ====")
    print(f"{'ep':>3} {'g_sk':>6} {'r_sk':>6} {'g_se':>6} {'r_se':>6} "
          f"{'g_avg':>6} {'r_avg':>6}  d_avg")
    for ep in range(len(ours)):
        g = ours[ep]
        r = theirs[ep] if ep < len(theirs) else (np.nan,) * 3
        print(f"{ep:>3} {g[0]:>6.1f} {r[0]:>6.1f} {g[1]:>6.1f} {r[1]:>6.1f} "
              f"{g[2]:>6.1f} {r[2]:>6.1f}  {g[2]-r[2]:+.1f}")
