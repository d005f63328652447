"""Integration: the single-jit train step on synthetic data (BASELINE config 4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu import configs, train
from indirect_learning_pose_shape_tpu.data import synthetic
from tests.test_network import small_model_cfg
import pytest


def tiny_train_cfg(image_size=32, batch_size=4, **kw):
    return dataclasses.replace(
        configs.CONFIG4_FULL,
        model=small_model_cfg(image_size=image_size),
        batch_size=batch_size,
        learning_rate=3e-4,
        **kw,
    )


def test_synthetic_batch_targets_consistent(tiny_asset):
    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    batch = jax.jit(
        lambda k: synthetic.generate_batch(k, 4, consts, cfg.model, cfg.synthetic)
    )(jax.random.PRNGKey(7))
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["silhouette"].shape == (4, 32, 32)
    assert batch["part_labels"].dtype == jnp.int32
    # Silhouette target and part labels must agree: fg pixels have labels > 0.
    sil = np.asarray(batch["silhouette"])
    lab = np.asarray(batch["part_labels"])
    agree = ((sil > 0.5) == (lab > 0)).mean()
    assert agree > 0.95
    # Image in [-1, 1], some foreground present.
    img = np.asarray(batch["image"])
    assert img.min() >= -1.0 - 1e-5 and img.max() <= 1.0 + 1e-5
    assert sil.mean() > 0.01


def test_parts31_preset_trains(tiny_asset):
    """The UP-S31-style 31-part label space (config4_parts31 preset): one
    fused step runs with 31 foreground classes end to end."""
    cfg = dataclasses.replace(
        tiny_train_cfg(),
        model=small_model_cfg(image_size=32, num_parts=31),
    )
    assert "config4_parts31" in configs.PRESETS
    assert configs.PRESETS["config4_parts31"].model.raster.num_parts == 31
    ts, consts = train.init_state(cfg, tiny_asset)
    fused = train.compile_fused_step(cfg, consts)
    ts, terms = fused(ts)
    assert np.isfinite(float(terms["total"]))
    assert consts.part_layout.num_parts == 31


@pytest.mark.slow
def test_offcrop_keypoints_invisible_and_lossless(tiny_asset):
    """Geometric visibility: keypoints projected outside the crop get vis=0,
    and the masked keypoint loss passes them zero gradient."""
    from indirect_learning_pose_shape_tpu import losses

    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    # Extreme camera translation pushes part of the body off-crop.
    synth_cfg = dataclasses.replace(cfg.synthetic, cam_trans_std=1.5, kp_visibility=1.0)
    batch = jax.jit(
        lambda k: synthetic.generate_batch(k, 8, consts, cfg.model, synth_cfg)
    )(jax.random.PRNGKey(3))
    kp = np.asarray(batch["kp2d"])
    vis = np.asarray(batch["kp_vis"])
    size = cfg.model.image_size
    off = ~np.all((kp >= 0.0) & (kp <= size - 1.0), axis=-1)
    assert off.any(), "fixture must push some keypoints off-crop"
    assert np.all(vis[off] == 0.0)
    assert np.all(vis[~off] == 1.0)  # kp_visibility=1.0: on-crop all visible

    # Zero gradient through invisible keypoints.
    g = jax.grad(
        lambda pred: losses.keypoint_l2(pred, batch["kp2d"], batch["kp_vis"], size)
    )(batch["kp2d"] + 1.0)
    g = np.asarray(g)
    assert np.all(g[off] == 0.0)
    assert np.any(g[~off] != 0.0)


def test_train_loss_decreases(tiny_asset):
    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    gen_fn, step_fn = train.compile_train_fns(cfg, consts)
    hist = []
    for _ in range(30):
        batch = gen_fn(ts.rng, ts.step)
        ts, terms = step_fn(ts, batch)
        hist.append(float(terms["total"]))
    first, last = np.mean(hist[:5]), np.mean(hist[-5:])
    assert last < first, f"loss did not decrease: {first} -> {last}"


@pytest.mark.slow
def test_train_deterministic(tiny_asset):
    cfg = tiny_train_cfg()

    def run():
        ts, consts = train.init_state(cfg, tiny_asset)
        gen_fn, step_fn = train.compile_train_fns(cfg, consts)
        for _ in range(3):
            batch = gen_fn(ts.rng, ts.step)
            ts, terms = step_fn(ts, batch)
        return float(terms["total"])

    assert run() == run()


def test_steps_per_call_chunking_matches_single(tiny_asset):
    """K scan-chunked steps == K single fused dispatches (same step-indexed
    data stream, same params), so chunking is a pure dispatch optimization."""
    cfg1 = tiny_train_cfg()
    ts1, consts = train.init_state(cfg1, tiny_asset)
    fused1 = train.compile_fused_step(cfg1, consts)
    for _ in range(4):
        ts1, terms1 = fused1(ts1)

    cfgk = tiny_train_cfg(steps_per_call=4)
    tsk, _ = train.init_state(cfgk, tiny_asset)
    fusedk = train.compile_fused_step(cfgk, consts)
    tsk, termsk = fusedk(tsk)

    assert int(tsk.step) == int(ts1.step) == 4
    # The scan and inlined graphs fuse differently, so float reordering
    # (~5e-7 at step 1, measured) compounds through the optimizer to ~1e-3
    # relative loss by step 4. A real chunking bug (same batch each iter,
    # dropped BN/opt state, wrong step indexing) shifts the step-4 loss at
    # O(0.1) — the batch at step 4 would be a different sample entirely.
    # Params are NOT compared element-wise: Adam moves every param ±lr per
    # step regardless of gradient magnitude, so reorder-level grad noise
    # flips update signs on near-zero-gradient params; only the aggregate
    # drift (≾ lr per step) is bounded.
    np.testing.assert_allclose(
        float(termsk["total"]), float(terms1["total"]), rtol=1e-2
    )
    lr = cfg1.learning_rate
    for a, b in zip(jax.tree.leaves(ts1.params), jax.tree.leaves(tsk.params)):
        assert float(jnp.max(jnp.abs(a - b))) < 12 * lr


@pytest.mark.slow
def test_fit_chunked_entrypoint(tiny_asset, tmp_path):
    """fit() with steps_per_call: non-divisible budget (remainder singles),
    chunk-boundary logging, finite loss."""
    cfg = tiny_train_cfg(
        steps_per_call=3, log_every=3, metrics_path=str(tmp_path / "mc.jsonl")
    )
    ts, terms = train.fit(cfg, asset=tiny_asset, num_steps=7)
    assert int(ts.step) == 7
    assert np.isfinite(terms["total"])
    lines = (tmp_path / "mc.jsonl").read_text().strip().splitlines()
    assert len(lines) == 3  # log_every crossings at 3, 6 + final


@pytest.mark.slow
def test_fit_log_every_cadence(tiny_asset, tmp_path):
    """log_every thins the metrics stream: 8 steps at cadence 4 write the
    crossed multiples plus the final step, nothing per-step."""
    cfg = tiny_train_cfg(log_every=4, metrics_path=str(tmp_path / "le.jsonl"))
    train.fit(cfg, asset=tiny_asset, num_steps=8)
    lines = (tmp_path / "le.jsonl").read_text().strip().splitlines()
    import json

    steps = [json.loads(ln)["step"] for ln in lines]
    assert steps == [3, 7], steps  # last step before each crossing + final


@pytest.mark.slow
def test_fit_entrypoint_smoke(tiny_asset, tmp_path):
    cfg = tiny_train_cfg(metrics_path=str(tmp_path / "m.jsonl"))
    _, terms = train.fit(cfg, asset=tiny_asset, num_steps=3)
    assert "total" in terms and np.isfinite(terms["total"])
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 1


@pytest.mark.slow
def test_grad_clip_and_weight_decay(tiny_asset):
    cfg = dataclasses.replace(
        tiny_train_cfg(), grad_clip_norm=1.0, weight_decay=1e-4,
        lr_schedule="cosine", warmup_steps=2, num_steps=8,
    )
    _, terms = train.fit(cfg, asset=tiny_asset, num_steps=4)
    assert np.isfinite(terms["total"])


def test_cli_overrides_reach_config(monkeypatch):
    """The experiment flags (--lr-schedule/--grad-clip/--weight-decay/
    --loss-weight/--seed) land in TrainConfig; unknown loss names refuse."""
    captured = {}

    def fake_fit(cfg, num_steps=None, metrics_path=None):
        captured["cfg"] = cfg
        return None, {"total": 0.0}

    monkeypatch.setattr(train, "fit", fake_fit)
    monkeypatch.setattr(
        "sys.argv",
        [
            "train",
            "--preset", "config4_full",
            "--lr-schedule", "cosine",
            "--warmup-steps", "7",
            "--grad-clip", "1.5",
            "--weight-decay", "1e-4",
            "--seed", "9",
            "--loss-weight", "shape_reg=0",
            "--loss-weight", "kp=10",
        ],
    )
    train.main()
    cfg = captured["cfg"]
    assert cfg.lr_schedule == "cosine" and cfg.warmup_steps == 7
    assert cfg.grad_clip_norm == 1.5 and cfg.weight_decay == 1e-4
    assert cfg.seed == 9
    w = cfg.loss_weight_dict
    assert w["shape_reg"] == 0.0 and w["kp"] == 10.0 and w["part_ce"] == 1.0

    monkeypatch.setattr("sys.argv", ["train", "--loss-weight", "nosuch=1"])
    with pytest.raises(SystemExit):
        train.main()


def test_cli_synthetic_overrides(monkeypatch):
    """--synthetic FIELD=VALUE lands in TrainConfig.synthetic (incl. the
    cam_scale_range LO,HI form); unknown fields and disk-data combinations
    refuse loudly."""
    captured = {}

    def fake_fit(cfg, num_steps=None, metrics_path=None):
        captured["cfg"] = cfg
        return None, {"total": 0.0}

    monkeypatch.setattr(train, "fit", fake_fit)
    monkeypatch.setattr(
        "sys.argv",
        [
            "train",
            "--synthetic", "pose_std=0.35",
            "--synthetic", "cam_scale_range=0.5,1.3",
        ],
    )
    train.main()
    syn = captured["cfg"].synthetic
    assert syn.pose_std == 0.35
    assert syn.cam_scale_range == (0.5, 1.3)
    assert syn.shape_std == 1.0  # untouched fields keep preset defaults

    monkeypatch.setattr("sys.argv", ["train", "--synthetic", "nosuch=1"])
    with pytest.raises(SystemExit):
        train.main()
    monkeypatch.setattr(
        "sys.argv",
        ["train", "--synthetic", "pose_std=0.3", "--dataset", "x.npz"],
    )
    with pytest.raises(SystemExit):
        train.main()


def test_ema_params_polyak_average(tiny_asset):
    """ts.ema_params is exactly the Polyak average of the param trajectory,
    initialized at the step-0 params (TrainConfig.ema_decay)."""
    d = 0.5  # short horizon so three steps move the shadow measurably
    cfg = tiny_train_cfg(ema_decay=d)
    ts, consts = train.init_state(cfg, tiny_asset)
    assert ts.ema_params is not None
    fused = train.compile_fused_step(cfg, consts)
    shadow = jax.tree.map(lambda x: np.asarray(x, np.float64), ts.params)
    for _ in range(3):
        ts, _ = fused(ts)
        shadow = jax.tree.map(
            lambda e, p: d * e + (1 - d) * np.asarray(p, np.float64),
            shadow,
            ts.params,
        )
    errs = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.max(np.abs(a - np.asarray(b, np.float64)))),
            shadow,
            ts.ema_params,
        )
    )
    assert max(errs) < 1e-6
    # And the shadow genuinely differs from the raw params (it trails them).
    diffs = jax.tree.leaves(
        jax.tree.map(
            lambda e, p: float(np.max(np.abs(np.asarray(e) - np.asarray(p)))),
            ts.ema_params,
            ts.params,
        )
    )
    assert max(diffs) > 1e-6


def test_ema_checkpointed_and_served(tiny_asset, tmp_path):
    """The EMA shadow rides checkpoints; load_model(ema=True) serves it;
    a no-EMA checkpoint refuses --ema loudly."""
    from indirect_learning_pose_shape_tpu.predict import load_model

    ck = str(tmp_path / "ck_ema")
    cfg = tiny_train_cfg(ema_decay=0.9, checkpoint_every=2, checkpoint_dir=ck)
    ts, _ = train.fit(cfg, asset=tiny_asset, num_steps=4)

    p_ema, state, _ = load_model(cfg, ck, tiny_asset, ema=True)
    errs = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            p_ema,
            ts.ema_params,
        )
    )
    assert max(errs) == 0.0
    p_raw, _, _ = load_model(cfg, ck, tiny_asset)
    raw_vs_ema = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
            p_raw,
            p_ema,
        )
    )
    assert max(raw_vs_ema) > 0.0

    # Resume continues the shadow (structure round-trips through orbax).
    ts2, _ = train.fit(cfg, asset=tiny_asset, num_steps=6)
    assert int(ts2.step) == 6 and ts2.ema_params is not None

    # A run without EMA writes no shadow: --ema must refuse, not silently
    # serve raw params.
    ck0 = str(tmp_path / "ck_noema")
    cfg0 = tiny_train_cfg(checkpoint_every=2, checkpoint_dir=ck0)
    train.fit(cfg0, asset=tiny_asset, num_steps=2)
    with pytest.raises((ValueError, KeyError)):
        load_model(cfg0, ck0, tiny_asset, ema=True)


def test_load_model_step_selection(tiny_asset, tmp_path):
    """load_model(step=N) serves a specific checkpoint, not just the latest."""
    from indirect_learning_pose_shape_tpu.predict import load_model

    ck = str(tmp_path / "ck_steps")
    cfg = tiny_train_cfg(checkpoint_every=2, checkpoint_dir=ck)
    train.fit(cfg, asset=tiny_asset, num_steps=4)
    p2, _, _ = load_model(cfg, ck, tiny_asset, step=2)
    p4, _, _ = load_model(cfg, ck, tiny_asset)  # latest = 4
    diff = max(
        jax.tree.leaves(
            jax.tree.map(
                lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))),
                p2,
                p4,
            )
        )
    )
    assert diff > 0.0


def test_generate_batch_include_3d_consistent(tiny_asset):
    """include_3d returns the generator's own SMPL outputs: re-running the
    forward on gt (pose, betas) reproduces gt_joints3d/gt_verts exactly."""
    from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod

    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    batch = jax.jit(
        lambda k: synthetic.generate_batch(
            k, 4, consts, cfg.model, cfg.synthetic, include_3d=True
        )
    )(jax.random.PRNGKey(11))
    assert batch["gt_joints3d"].shape == (4, consts.smpl.num_joints, 3)
    assert batch["gt_rotmats"].shape == (4, consts.smpl.num_joints, 3, 3)
    out = smpl_mod.smpl_forward(consts.smpl, batch["gt_pose"], batch["gt_betas"])
    np.testing.assert_allclose(
        np.asarray(batch["gt_joints3d"]), np.asarray(out["joints"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(batch["gt_verts"]), np.asarray(out["verts"]), atol=1e-5
    )


def test_mixed_supervision_fused_step(tiny_asset):
    """Direct 3D terms (j3d/rotmat/betas_l2) ride the fused synthetic step:
    make_batch emits the gt targets, losses report the terms, and they
    carry gradient (loss decreases over a few steps)."""
    cfg = tiny_train_cfg()
    w = dict(cfg.loss_weights)
    w.update(j3d=5.0, rotmat=1.0, betas_l2=0.1)
    cfg = dataclasses.replace(cfg, loss_weights=tuple(w.items()))
    ts, consts = train.init_state(cfg, tiny_asset)
    fused = train.compile_fused_step(cfg, consts)
    hist = []
    for _ in range(12):
        ts, terms = fused(ts)
        hist.append(float(terms["j3d"]))
    assert {"j3d", "rotmat", "betas_l2"} <= set(terms)
    assert all(np.isfinite(hist))
    assert np.mean(hist[-3:]) < np.mean(hist[:3]), f"j3d did not decrease: {hist}"


def test_mixed_preset_registered():
    """config4_mixed ships the measured-best mixed recipe (BASELINE.md):
    live j3d/rotmat/betas_l2 weights, shape_reg retired (direct beta
    supervision replaces the mean-anchor prior), cosine schedule."""
    cfg = configs.PRESETS["config4_mixed"]
    w = cfg.loss_weight_dict
    assert w["j3d"] > 0 and w["rotmat"] > 0 and w["betas_l2"] > 0
    assert w["shape_reg"] == 0.0
    assert cfg.lr_schedule == "cosine" and cfg.grad_clip_norm > 0
    assert cfg.model.encoder.depth == 34
    assert cfg.model.ief.rotation_format == "rot6d"


def test_direct_weight_without_targets_raises(tiny_asset):
    """A direct weight on a dataset batch with no 3D labels is refused
    loudly (KeyError naming the missing target), not silently skipped."""
    import pytest as _pytest

    cfg = tiny_train_cfg()
    w = dict(cfg.loss_weights)
    w.update(j3d=1.0)
    cfg = dataclasses.replace(cfg, loss_weights=tuple(w.items()))
    ts, consts = train.init_state(cfg, tiny_asset)
    size = cfg.model.image_size
    batch = {
        "image": jnp.zeros((2, size, size, 3)),
        "silhouette": jnp.zeros((2, size, size)),
        "part_labels": jnp.zeros((2, size, size), jnp.int32),
        "kp2d": jnp.zeros((2, 19, 2)),
        "kp_vis": jnp.ones((2, 19)),
    }
    with _pytest.raises(KeyError, match="j3d"):
        train.loss_and_metrics(ts.params, ts.model_state, consts, batch, cfg)


def test_preprocess_raw_batch_3d_passthrough_and_augment_refusal(tiny_asset):
    """Disk batches with 3D labels: crop-invariant passthrough without
    augmentation; loud refusal when the mirror would desync them."""
    import pytest as _pytest

    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    B, S = 2, 48
    raw = {
        "images": jnp.zeros((B, S, S, 3), jnp.uint8),
        "masks": jnp.zeros((B, S, S), jnp.int32).at[:, 10:30, 10:30].set(1),
        "kp2d": jnp.ones((B, 19, 2)) * 20.0,
        "kp_vis": jnp.ones((B, 19)),
        "joints3d": jnp.ones((B, 24, 3)),
        "betas": jnp.zeros((B, 10)),
    }
    batch = train.preprocess_raw_batch(raw, consts, cfg)
    np.testing.assert_array_equal(np.asarray(batch["joints3d"]), np.asarray(raw["joints3d"]))
    np.testing.assert_array_equal(np.asarray(batch["betas"]), np.asarray(raw["betas"]))

    aug_cfg = dataclasses.replace(
        cfg, augment=dataclasses.replace(cfg.augment, enabled=True)
    )
    with _pytest.raises(ValueError, match="3D targets"):
        train.preprocess_raw_batch(raw, consts, aug_cfg, key=jax.random.PRNGKey(0))
    # β alone is mirror-invariant and allowed through.
    raw_b = {k: v for k, v in raw.items() if k != "joints3d"}
    out = train.preprocess_raw_batch(raw_b, consts, aug_cfg, key=jax.random.PRNGKey(0))
    assert "betas" in out


def test_synthetic_override_bad_value_message():
    """A malformed numeric value gets the same descriptive FIELD=VALUE
    framing as an unknown field (ADVICE r3), not a bare float() error."""
    with pytest.raises(ValueError, match="synthetic override 'pose_std=abc'"):
        synthetic.apply_overrides(synthetic.SyntheticConfig(), ["pose_std=abc"])


@pytest.mark.slow
def test_fit_dataset_log_every_cadence(tiny_asset, tmp_path):
    """The disk fit path honors log_every (VERDICT r3 weak #3): 8 steps at
    cadence 4 write steps 0, 4 and the final step — not one line per step."""
    import json

    from indirect_learning_pose_shape_tpu.data import dataset as ds_lib

    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=16, source_size=48, asset=tiny_asset
    )
    cfg = tiny_train_cfg(log_every=4, metrics_path=str(tmp_path / "dle.jsonl"))
    ds = ds_lib.NpzDataset(arrays, batch_size=cfg.batch_size, seed=3)
    train.fit_dataset(cfg, ds, asset=tiny_asset, num_steps=8)
    lines = (tmp_path / "dle.jsonl").read_text().strip().splitlines()
    steps = [json.loads(ln)["step"] for ln in lines]
    assert steps == [0, 4, 7], steps


@pytest.mark.slow
def test_fit_preprocessed_log_every_cadence(tiny_asset, tmp_path):
    """Same cadence contract on the host-preprocessed (image-dir) path."""
    import json

    from indirect_learning_pose_shape_tpu.data import dataset as ds_lib, image_dir

    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=8, source_size=64, asset=tiny_asset
    )
    root = str(tmp_path / "imgdir")
    image_dir.export_image_dir(arrays, root)
    cfg = tiny_train_cfg(log_every=3, metrics_path=str(tmp_path / "ple.jsonl"))
    ds = image_dir.ImageDirDataset(
        root, batch_size=cfg.batch_size, image_size=32, num_parts=24
    )
    train.fit_preprocessed(cfg, ds, asset=tiny_asset, num_steps=6)
    lines = (tmp_path / "ple.jsonl").read_text().strip().splitlines()
    steps = [json.loads(ln)["step"] for ln in lines]
    assert steps == [0, 3, 5], steps


def test_robust_preset_is_the_measured_recipe(tiny_asset):
    """config4_robust == config4_mixed + the exact hardapp CLI knobs the
    BASELINE.md robust rows were trained with (the measured-best recipe
    must be one --preset away, not a prose incantation); one fused step
    runs with hard targets + full appearance randomization."""
    from indirect_learning_pose_shape_tpu.data import synthetic as syn

    cli = dataclasses.replace(
        configs.CONFIG4_MIXED,
        synthetic=syn.apply_overrides(
            configs.CONFIG4_MIXED.synthetic,
            ["targets=hard", "bg_mode=texture", "color_jitter=0.08",
             "shading=0.6", "occluders=2"],
        ),
    )
    assert configs.PRESETS["config4_robust"] == cli
    cfg = dataclasses.replace(
        tiny_train_cfg(),
        synthetic=configs.CONFIG4_ROBUST.synthetic,
        loss_weights=configs.CONFIG4_ROBUST.loss_weights,
    )
    ts, consts = train.init_state(cfg, tiny_asset)
    fused = train.compile_fused_step(cfg, consts)
    ts, terms = fused(ts)
    assert float(terms["total"]) > 0 and float(terms["j3d"]) >= 0
