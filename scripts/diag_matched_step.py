"""Per-step divergence diagnostic: replay the recorded stream through BOTH
frameworks step by step (alpha=0, GCL async multimodal) and compare the loss
and max parameter rel-diff after every optimizer step of the first epochs.

Uses the reference's own build_branch_losses/apply_gcl_drw so the torch side
is exactly its training computation.
"""
import sys
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 7
FOLD = int(sys.argv[2]) if len(sys.argv) > 2 else 2
EPOCHS_RECORD = int(sys.argv[3]) if len(sys.argv) > 3 else 3

from parity_matched import run_reference_instrumented  # noqa: E402
from gaitpd.data.synthetic import make_fog_reader  # noqa: E402

sys.path.insert(0, "/root/reference/train")
sys.path.insert(0, "/root/reference")
import torch  # noqa: E402

torch.set_num_threads(1)
if not torch.cuda.is_available():
    torch.cuda.FloatTensor = torch.FloatTensor

import utilities as ref_utils  # noqa: E402

reader = make_fog_reader(seed=SEED, strength=0.6)
folds = ref_utils.generate_class_stratified_folds(reader, "fog")
ref_folds = run_reference_instrumented(reader, SEED, EPOCHS_RECORD, folds,
                                       alpha=0.0)
fr = ref_folds[FOLD]
print(f"fold {FOLD}: ref best_avg={fr['best_avg']:.2f}; "
      f"{len(fr['train_passes'])-1} train epochs recorded")

# ---------------------------------------------------------------- torch side
from gaitpd.config import FBG_FOG_DIMS  # noqa: E402
from gaitpd.models.multitask import MultiModalMultiTask  # noqa: E402
import fbg_fog_train as ref_driver  # noqa: E402
from parity_matched import _transplant  # noqa: E402

dims = FBG_FOG_DIMS["fog"]
args = types.SimpleNamespace(
    dataset="fog", modality="multimodal", consistency_lambda=1.0,
    wm="gcl", synchronized_loading=False, alpha=0.0, max_norm=1.0,
    ldam_s=30.0, ldam_m=0.5, gcl_m=0.2, gcl_s=25.0, noise_mul=0.0,
    drw_warmup=0, use_norm_and_cos=True, save_loss_plots=False, seed=SEED,
)
try:
    from configs import FBG_FOG_PARAMS
except ImportError:
    from train.configs import FBG_FOG_PARAMS
params = FBG_FOG_PARAMS["fog"]

tmodel = ref_driver.choose_model.__wrapped__(args, params, "cpu") \
    if hasattr(ref_driver.choose_model, "__wrapped__") \
    else ref_driver.choose_model(args, params, torch.device("cpu"))
_transplant(tmodel, fr["variables"])
topt = torch.optim.SGD(tmodel.parameters(), lr=params["learning_rate"],
                       momentum=0.9, weight_decay=1e-4)

counts_pass = fr["train_passes"][0]
sk_counts = np.zeros(dims.num_classes, np.int64)
se_counts = np.zeros(dims.num_classes, np.int64)
for b in counts_pass:
    sk_counts += np.bincount(np.asarray(b["label_skeleton"]).ravel(),
                             minlength=dims.num_classes)
    se_counts += np.bincount(np.asarray(b["label_sensor"]).ravel(),
                             minlength=dims.num_classes)
print("counts:", sk_counts, se_counts)

ldam_skel, ldam_sens, gcl_skel, gcl_sens, drw_weights = \
    ref_utils.build_branch_losses(args, list(sk_counts), list(se_counts),
                                  torch.device("cpu"))

# ------------------------------------------------------------------ jax side
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gaitpd.train.optim import sgd_torch  # noqa: E402
from gaitpd.train.step import (  # noqa: E402
    StepSettings, TrainState, make_apply_adapters, make_loss_ctx,
    make_train_step,
)

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
settings = StepSettings(
    n_streams=2, wm="gcl", synchronized=False, gcl_m=0.2, gcl_s=25.0,
    noise_mul=0.0, drw_warmup=0, consistency_lambda=1.0, private_grads="sum",
)
ctx = make_loss_ctx(settings, [sk_counts, se_counts])
tx = sgd_torch(1e-3, 0.9, 1e-4)
state = TrainState(params=fr["variables"], opt_state=tx.init(fr["variables"]),
                   mtl_state={}, epoch=jnp.zeros((), jnp.int32))
train_apply, eval_apply = make_apply_adapters(model.apply, settings)
step = jax.jit(make_train_step(train_apply, tx, settings, None, None))


def flatten_skel(x):
    x = np.asarray(x, np.float32)
    return x.reshape(x.shape[0], x.shape[1], -1)


def jax_param_map(variables):
    p = variables["params"]
    return {
        "skel.fc1.w": np.asarray(p["skeleton_encoder"]["TorchLinear_0"]["Dense_0"]["kernel"]).T,
        "skel.ln1.w": np.asarray(p["skeleton_encoder"]["LayerNorm_0"]["scale"]),
        "sens.conv.w": np.asarray(p["sensor_encoder"]["Conv1dSame_0"]["Conv_0"]["kernel"]).transpose(2, 1, 0),
        "bb.conv.w": np.asarray(p["backbone"]["Conv1dSame_0"]["Conv_0"]["kernel"]).transpose(2, 1, 0),
        "head_sk.cos": np.asarray(p["task_head_skel"]["CosineLinear_0"]["weight"]).T,
        "head_se.cos": np.asarray(p["task_head_sensor"]["CosineLinear_0"]["weight"]).T,
        "head_sk.ln.w": np.asarray(p["task_head_skel"]["LayerNorm_0"]["scale"]),
        "head_se.ln.w": np.asarray(p["task_head_sensor"]["LayerNorm_0"]["scale"]),
    }


def torch_param_map(m):
    return {
        "skel.fc1.w": m.skeleton_encoder.fc1.weight.detach().numpy(),
        "skel.ln1.w": m.skeleton_encoder.ln1.weight.detach().numpy(),
        "sens.conv.w": m.sensor_encoder.conv1d.weight.detach().numpy(),
        "bb.conv.w": m.backbone.conv1d.weight.detach().numpy(),
        "head_sk.cos": m.task_head_skel.fc.weight.detach().numpy(),
        "head_se.cos": m.task_head_sensor.fc.weight.detach().numpy(),
        "head_sk.ln.w": m.task_head_skel.norm.weight.detach().numpy(),
        "head_se.ln.w": m.task_head_sensor.norm.weight.detach().numpy(),
    }


key = jax.random.PRNGKey(0)
gstep = 0
ref_utils.apply_gcl_drw(args, 0, FOLD + 1, gcl_skel, gcl_sens, drw_weights)
print("torch gcl_skel.weight:", None if gcl_skel.weight is None
      else gcl_skel.weight.numpy())
print("torch gcl_skel.m_list:", gcl_skel.m_list.numpy(),
      "m:", gcl_skel.m, "s:", gcl_skel.s, "noise_mul:", gcl_skel.noise_mul,
      "train_cls:", gcl_skel.train_cls, "gamma:", gcl_skel.gamma)
print("jax ctx:", jax.tree.map(lambda x: np.asarray(x), ctx))

# one-off loss decomposition on the first recorded batch at the init params
b0 = fr["train_passes"][1][0]
xs_sk0 = torch.from_numpy(flatten_skel(b0["skeleton"]))
xs_se0 = torch.from_numpy(np.asarray(b0["sensor"], np.float32))
y_sk0 = torch.from_numpy(np.asarray(b0["label_skeleton"])).long()
y_se0 = torch.from_numpy(np.asarray(b0["label_sensor"])).long()
tmodel.train()
with torch.no_grad():
    p0_sk, p0_se = tmodel(xs_sk0, xs_se0)
    tl_sk = float(gcl_skel(p0_sk, y_sk0))
    tl_se = float(gcl_sens(p0_se, y_se0))
xs0 = (jnp.asarray(flatten_skel(b0["skeleton"])),
       jnp.asarray(np.asarray(b0["sensor"], np.float32)))
ys0 = (jnp.asarray(np.asarray(b0["label_skeleton"]), jnp.int32),
       jnp.asarray(np.asarray(b0["label_sensor"]), jnp.int32))
lg0 = train_apply(state.params, xs0, jax.random.PRNGKey(1), 0)
from gaitpd.learning.losses import gcl_loss  # noqa: E402
print("logit diff sk:", float(np.max(np.abs(np.asarray(lg0[0]) - p0_sk.numpy()))),
      "se:", float(np.max(np.abs(np.asarray(lg0[1]) - p0_se.numpy()))))
print(f"branch losses at init: torch sk={tl_sk:.6f} se={tl_se:.6f}")

for ep, batches in enumerate(fr["train_passes"][1:]):
    ref_utils.apply_gcl_drw(args, ep, FOLD + 1, gcl_skel, gcl_sens,
                            drw_weights)
    state = state.replace(epoch=jnp.asarray(ep, jnp.int32))
    tmodel.train()
    for b in batches:
        # torch step
        xs_sk = torch.from_numpy(flatten_skel(b["skeleton"]))
        xs_se = torch.from_numpy(np.asarray(b["sensor"], np.float32))
        y_sk = torch.from_numpy(np.asarray(b["label_skeleton"])).long()
        y_se = torch.from_numpy(np.asarray(b["label_sensor"])).long()
        p_skel, p_sens = tmodel(xs_sk, xs_se)
        l_skel = gcl_skel(p_skel, y_sk)
        l_sens = gcl_sens(p_sens, y_se)
        tloss = (l_skel + l_sens) / 2
        topt.zero_grad()
        tloss.backward()
        topt.step()

        # jax step
        xs = (jnp.asarray(flatten_skel(b["skeleton"])),
              jnp.asarray(np.asarray(b["sensor"], np.float32)))
        ys = (jnp.asarray(np.asarray(b["label_skeleton"]), jnp.int32),
              jnp.asarray(np.asarray(b["label_sensor"]), jnp.int32))
        batch = {"xs": xs, "ys": ys,
                 "valid": jnp.ones((xs[0].shape[0],), jnp.float32)}
        key, k = jax.random.split(key)
        if gstep == 0:
            from gaitpd.train.step import make_multitask_loss_fn
            lf = make_multitask_loss_fn(train_apply, settings)
            ls0, _ = lf(state.params, xs, ys, batch["valid"], ctx, k,
                        state.epoch)
            print(f"  [step0] torch branches: sk={float(l_skel):.6f} "
                  f"se={float(l_sens):.6f}; jax loss_fn branches: "
                  f"sk={float(ls0[0]):.6f} se={float(ls0[1]):.6f}")
            from gaitpd.learning import losses as L
            lg_d = train_apply(state.params, xs, k, 0)
            for wname, wv in [("drw", ctx[0]["drw_base"]), ("ones", None)]:
                v_sk = L.gcl_loss(lg_d[0], ys[0], ctx[0]["gcl_m"], k,
                                  m=0.2, s=25.0, noise_mul=0.0, weight=wv)
                v_se = L.gcl_loss(lg_d[1], ys[1], ctx[1]["gcl_m"], k,
                                  m=0.2, s=25.0, noise_mul=0.0, weight=wv)
                print(f"  [step0] direct gcl_loss weight={wname}: "
                      f"sk={float(v_sk):.6f} se={float(v_se):.6f}")
            # torch with weight=None for reference
            with torch.no_grad():
                import torch.nn.functional as TF
                cs = torch.from_numpy(np.asarray(lg_d[0]))
                tg = torch.from_numpy(np.asarray(ys[0])).long()
                idx = torch.zeros_like(cs, dtype=torch.bool)
                idx.scatter_(1, tg.view(-1, 1), True)
                outp = torch.where(idx, cs - 0.2, cs)
                print(f"  [step0] torch-on-jax-logits weighted: "
                      f"{float(TF.cross_entropy(25.0 * outp, tg, weight=gcl_skel.weight)):.6f} "
                      f"unweighted: {float(TF.cross_entropy(25.0 * outp, tg)):.6f}")
        state, info = step(state, batch, k, ctx)
        jloss = float(np.mean(np.asarray(info["losses"]))) \
            if isinstance(info, dict) and "losses" in info else float("nan")

        jp = jax_param_map(state.params)
        tp = torch_param_map(tmodel)
        rel = {k2: float(np.max(np.abs(jp[k2] - tp[k2]))
                         / (np.max(np.abs(tp[k2])) + 1e-12))
               for k2 in jp}
        worst = max(rel, key=rel.get)
        print(f"ep{ep} step{gstep}: t_loss={float(tloss):.6f} "
              f"j_loss={jloss:.6f} d_loss={abs(float(tloss)-jloss):.2e} "
              f"worst_param={worst} rel={rel[worst]:.2e}")
        gstep += 1
