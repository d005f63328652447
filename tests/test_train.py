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


@pytest.mark.slow
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
