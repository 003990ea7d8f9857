"""HP-vmap runner (gaitpd/train/hp_search.py): a grid of (lr, gcl_m, gcl_s)
values trains as one vmapped program; the row holding the CLI defaults must
reproduce the plain vmapped-CV run exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from gaitpd.train.hp_search import make_grid, run_weargait_hp_vmapped
from gaitpd.train.vmap_cv import run_cv_vmapped
from gaitpd.train.weargait_driver import WearGaitArgs

KW = dict(
    n_folds=2, test_per_class=3, epochs=3, patience=50, synthetic=True,
    verbose=False, seed=0, wm="gcl", alpha=0.5,
)


def test_hp_vmap_defaults_row_matches_run_cv_vmapped():
    args = WearGaitArgs(**KW)
    base = run_cv_vmapped(args)
    res = run_weargait_hp_vmapped(
        args, [{"lr": args.lr, "gcl_m": args.gcl_m, "gcl_s": args.gcl_s}]
    )
    row = res["table"][0]
    np.testing.assert_allclose(
        row["per_fold"], base["per_fold_macro"], atol=1e-6
    )


def test_hp_vmap_lr_axis_trains_distinct_instances():
    """Two lr values in one program: the defaults row still reproduces the
    plain run, and a near-zero lr row diverges from it (its weights barely
    move, so its best macro differs)."""
    args = WearGaitArgs(**KW)
    base = run_cv_vmapped(args)
    res = run_weargait_hp_vmapped(
        args,
        [{"lr": args.lr}, {"lr": 1e-8}],
    )
    rows = {r["hp"]["lr"]: r for r in res["table"]}
    np.testing.assert_allclose(
        rows[args.lr]["per_fold"], base["per_fold_macro"], atol=1e-6
    )
    assert rows[1e-8]["per_fold"] != rows[args.lr]["per_fold"]


def test_gcl_scale_ctx_override_equals_static_setting():
    """branch_loss with ctx-resident gcl_m/s scalars == the static-settings
    path (the mechanism the HP axis rides on)."""
    import jax

    from gaitpd.train.step import StepSettings, branch_loss, make_loss_ctx

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 3, size=16))
    valid = jnp.ones((16,), jnp.float32)
    key = jax.random.PRNGKey(7)

    s_static = StepSettings(n_streams=1, wm="gcl", gcl_m=0.35, gcl_s=17.0)
    s_other = StepSettings(n_streams=1, wm="gcl", gcl_m=0.2, gcl_s=25.0)
    ctx = make_loss_ctx(s_static, [(9, 4, 2)])[0]
    ctx_r = {**ctx, "drw_w": jnp.ones((3,))}

    ref = branch_loss(s_static, logits, labels, ctx_r, key, valid)
    ovr = branch_loss(
        s_other, logits, labels,
        {**ctx_r, "gcl_m_scale": jnp.float32(0.35),
         "gcl_s_scale": jnp.float32(17.0)},
        key, valid,
    )
    np.testing.assert_allclose(np.asarray(ref), np.asarray(ovr), rtol=1e-6)


def test_hp_vmap_alpha_axis():
    """CAGrad strength as a state-resident knob: the row holding the CLI
    --alpha still reproduces the plain run (state path == static path), and
    an extreme alpha row trains differently."""
    args = WearGaitArgs(**KW)
    base = run_cv_vmapped(args)
    res = run_weargait_hp_vmapped(
        args, [{"alpha": args.alpha}, {"alpha": 25.0}]
    )
    rows = {r["hp"]["alpha"]: r for r in res["table"]}
    np.testing.assert_allclose(
        rows[args.alpha]["per_fold"], base["per_fold_macro"], atol=1e-6
    )
    assert rows[25.0]["per_fold"] != rows[args.alpha]["per_fold"]


def test_cagrad_state_resident_c_equals_static():
    """CAGrad.combine with c in mtl_state == CAGrad(c=that value)."""
    from gaitpd.learning.mtl import make_method

    rng = np.random.default_rng(3)
    j = jnp.asarray(rng.normal(size=(3, 40)), jnp.float32)
    losses = jnp.asarray([1.0, 2.0, 0.5], jnp.float32)
    gram = j @ j.T
    key = None
    a = make_method("cagrad", 3, c=0.7)
    b = make_method("cagrad", 3, c=0.123)  # wrong static, overridden by state
    ga, _, _, _ = a.combine(losses, j, gram, {}, key)
    gb, _, _, _ = b.combine(
        losses, j, gram, {"cagrad_c": jnp.float32(0.7)}, key
    )
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-6)


def test_make_grid_product():
    g = make_grid([1e-3, 1e-4], [0.2], [25.0, 30.0])
    assert len(g) == 4
    assert {"lr": 1e-4, "gcl_m": 0.2, "gcl_s": 30.0} in g
    # unsupplied knobs are omitted (runner falls back to driver defaults)
    assert make_grid(None, None, None) == [{}]
    assert make_grid(alphas=[0.1, 0.5]) == [{"alpha": 0.1}, {"alpha": 0.5}]


def test_fog_hp_vmap_axes():
    """FBG/FoG HP-vmap: a grid row whose explicit values equal the driver
    defaults matches the empty row (state-resident knobs == static knobs),
    and an extreme-lr row trains differently."""
    from gaitpd.train.fbg_fog_driver import FbgFogArgs
    from gaitpd.train.hp_search import run_fbg_fog_hp_vmapped

    args = FbgFogArgs(
        dataset="fog", modality="multimodal", wm="gcl", use_norm_and_cos=True,
        synthetic=True, epochs=3, n_folds_cap=2, verbose=False, seed=0,
    )
    res = run_fbg_fog_hp_vmapped(
        args,
        [{}, {"lr": 1e-3, "alpha": args.alpha}, {"lr": 10.0}],
    )
    rows = {tuple(sorted(r["hp"].items())): r for r in res["table"]}
    default_row = rows[()]
    explicit_row = rows[tuple(sorted({"lr": 1e-3, "alpha": args.alpha}.items()))]
    np.testing.assert_allclose(
        explicit_row["per_fold"], default_row["per_fold"], atol=1e-6
    )
    assert rows[tuple(sorted({"lr": 10.0}.items()))]["per_fold"] != \
        default_row["per_fold"]
    assert default_row["acc_mean"] > 35.0  # off 33% chance on synthetic


def test_hp_vmap_instance_sharded_mesh_matches_single_device():
    """(hp x fold) = 4 x 2 = 8 instances sharded over the 8-device mesh
    reproduce the single-device grid exactly (instance-parallel HP search)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gaitpd.runtime.mesh import make_mesh

    grid = [{"lr": lr, "gcl_m": m}
            for lr in (1e-3, 3e-3) for m in (0.1, 0.2)]
    base = run_weargait_hp_vmapped(WearGaitArgs(**KW), grid)
    meshed = run_weargait_hp_vmapped(
        WearGaitArgs(mesh=make_mesh(8), **KW), grid
    )
    key = lambda r: tuple(sorted(r["hp"].items()))  # noqa: E731
    base_rows = {key(r): r for r in base["table"]}
    for rm in meshed["table"]:
        np.testing.assert_allclose(
            rm["per_fold"], base_rows[key(rm)]["per_fold"], atol=1e-5
        )


def test_fog_hp_vmap_mesh_matches_single_device():
    """FoG HP grid sharded over the 8-device mesh == single-device."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from gaitpd.runtime.mesh import make_mesh
    from gaitpd.train.fbg_fog_driver import FbgFogArgs
    from gaitpd.train.hp_search import run_fbg_fog_hp_vmapped

    kw = dict(
        dataset="fog", modality="multimodal", wm="gcl", use_norm_and_cos=True,
        synthetic=True, epochs=2, n_folds_cap=2, verbose=False, seed=0,
    )
    grid = [{"lr": lr, "gcl_m": m}
            for lr in (1e-3, 3e-3) for m in (0.1, 0.2)]
    base = run_fbg_fog_hp_vmapped(FbgFogArgs(**kw), grid)
    meshed = run_fbg_fog_hp_vmapped(FbgFogArgs(mesh=make_mesh(8), **kw), grid)
    key = lambda r: tuple(sorted(r["hp"].items()))  # noqa: E731
    base_rows = {key(r): r for r in base["table"]}
    for rm in meshed["table"]:
        np.testing.assert_allclose(
            rm["per_fold"], base_rows[key(rm)]["per_fold"], atol=1e-5
        )


def test_hp_vmap_baseline_defaults_row_matches_run_cv_vmapped():
    """--baseline under --vmap_hp (r4: closes the VERDICT r3 item 7
    refusal): the defaults row of a TACA grid reproduces the plain vmapped
    baseline run (adapters + dropout rng + no CAGrad), and a near-zero lr
    row diverges."""
    args = WearGaitArgs(baseline="taca", **KW)
    base = run_cv_vmapped(args)
    res = run_weargait_hp_vmapped(args, [{"lr": args.lr}, {"lr": 1e-9}])
    rows = {r["hp"]["lr"]: r for r in res["table"]}
    np.testing.assert_allclose(
        rows[args.lr]["per_fold"], base["per_fold_macro"], atol=1e-6
    )
    assert rows[1e-9]["per_fold"] != rows[args.lr]["per_fold"]


def test_hp_vmap_single_mod_defaults_row_matches_run_cv_vmapped():
    """--single_mod under --vmap_hp (r4): the defaults row reproduces the
    vmapped single-modality sub-driver exactly; an lr axis trains distinct
    instances; an alpha axis still refuses (no CAGrad in single-mod)."""
    args = WearGaitArgs(single_mod="insole", **KW)
    base = run_cv_vmapped(args)
    res = run_weargait_hp_vmapped(args, [{"lr": args.lr}, {"lr": 1e-9}])
    rows = {r["hp"]["lr"]: r for r in res["table"]}
    np.testing.assert_allclose(
        rows[args.lr]["per_fold"], base["per_fold_macro"], atol=1e-6
    )
    assert rows[1e-9]["per_fold"] != rows[args.lr]["per_fold"]
    with pytest.raises(ValueError, match="alpha"):
        run_weargait_hp_vmapped(args, [{"alpha": 0.5}])


def test_fog_hp_vmap_modality_both_runs_per_modality_grids():
    """--modality both under --vmap_hp (r4): one ranked grid per concrete
    modality, each equal to the directly-invoked single-modality grid."""
    from gaitpd.train.fbg_fog_driver import FbgFogArgs
    from gaitpd.train.hp_search import run_fbg_fog_hp_vmapped

    kw = dict(
        dataset="fog", wm="ce", synthetic=True, epochs=2, n_folds_cap=2,
        verbose=False, seed=0,
    )
    grid = [{"lr": 1e-3}, {"lr": 3e-3}]
    res = run_fbg_fog_hp_vmapped(FbgFogArgs(modality="both", **kw), grid)
    assert set(res) == {"skeleton", "sensor"}
    direct = run_fbg_fog_hp_vmapped(FbgFogArgs(modality="sensor", **kw), grid)
    key = lambda r: tuple(sorted(r["hp"].items()))  # noqa: E731
    direct_rows = {key(r): r for r in direct["table"]}
    for r in res["sensor"]["table"]:
        np.testing.assert_allclose(
            r["per_fold"], direct_rows[key(r)]["per_fold"], atol=1e-6
        )


def test_hp_vmap_rejects_ignored_alpha_axis():
    """An alpha axis with CAGrad disabled must refuse, not silently no-op."""
    kw = {**KW, "alpha": 0.0}
    args = WearGaitArgs(**kw)
    with pytest.raises(ValueError, match="alpha"):
        run_weargait_hp_vmapped(args, [{"alpha": 0.5}])
