"""Checkpoint/resume roundtrip (SURVEY.md §2.12, §5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu import train
from indirect_learning_pose_shape_tpu.utils.checkpoint import Checkpointer
from tests.test_train import tiny_train_cfg
import pytest


@pytest.mark.slow
def test_save_restore_roundtrip(tiny_asset, tmp_path):
    cfg = tiny_train_cfg()
    ts, consts = train.init_state(cfg, tiny_asset)
    gen_fn, step_fn = train.compile_train_fns(cfg, consts)
    for _ in range(2):
        batch = gen_fn(ts.rng, ts.step)
        ts, _ = step_fn(ts, batch)

    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(2, dataclasses.asdict(ts), wait=True)

    # Restore into an abstract state built from a fresh init.
    ts2, _ = train.init_state(cfg, tiny_asset)
    restored = ckpt.restore(dataclasses.asdict(ts2))
    ckpt.close()

    for a, b in zip(jax.tree.leaves(dataclasses.asdict(ts)), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_final_state_checkpointed_on_uneven_budget(tiny_asset, tmp_path):
    """A step budget that is not a multiple of checkpoint_every still leaves
    the FINAL state on disk (a crash-resume run killed between periodic
    saves otherwise silently serves a stale model to evaluate/predict)."""
    cfg = dataclasses.replace(
        tiny_train_cfg(),
        checkpoint_every=2,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    train.fit(cfg, asset=tiny_asset, num_steps=5)
    ckpt = Checkpointer(cfg.checkpoint_dir)
    assert ckpt.latest_step() == 5
    ckpt.close()


@pytest.mark.slow
def test_resume_continues_stream(tiny_asset, tmp_path):
    """Training 4 steps straight == training 2, checkpointing, resuming 2."""
    cfg = tiny_train_cfg()

    def steps(ts, consts, n):
        gen_fn, step_fn = train.compile_train_fns(cfg, consts)
        terms = {}
        for _ in range(n):
            batch = gen_fn(ts.rng, ts.step)
            ts, terms = step_fn(ts, batch)
        return ts, terms

    ts, consts = train.init_state(cfg, tiny_asset)
    ts4, terms4 = steps(ts, consts, 4)

    ts_a, _ = train.init_state(cfg, tiny_asset)
    ts2, _ = steps(ts_a, consts, 2)
    ckpt = Checkpointer(str(tmp_path / "ckpt"))
    ckpt.save(2, dataclasses.asdict(ts2), wait=True)
    ts_b, _ = train.init_state(cfg, tiny_asset)
    restored = ckpt.restore(dataclasses.asdict(ts_b))
    ckpt.close()
    ts_resumed = train.TrainState(**restored)
    ts4_resumed, terms4_resumed = steps(ts_resumed, consts, 2)

    np.testing.assert_allclose(
        float(terms4["total"]), float(terms4_resumed["total"]), rtol=1e-5
    )
    assert int(ts4.step) == int(ts4_resumed.step) == 4


@pytest.mark.slow
def test_fit_dataset_auto_resumes(tiny_asset, tmp_path):
    """Disk-data training checkpoints and resumes to the same endpoint as an
    uninterrupted run (the stream restarts at the restored step via
    batches(start_step); ADVICE.md round-1 medium finding)."""
    from indirect_learning_pose_shape_tpu.data import dataset as ds_lib

    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=16, source_size=48, asset=tiny_asset
    )
    base = tiny_train_cfg()

    def run(ckdir, num_steps):
        cfg = dataclasses.replace(
            base, checkpoint_every=2, checkpoint_dir=ckdir, num_steps=6
        )
        ds = ds_lib.NpzDataset(arrays, batch_size=cfg.batch_size, seed=3)
        return train.fit_dataset(cfg, ds, asset=tiny_asset, num_steps=num_steps)

    ts_full, terms_full = run(str(tmp_path / "ck_ref"), 6)
    run(str(tmp_path / "ck"), 4)  # "crashed" at step 4
    ts_res, terms_res = run(str(tmp_path / "ck"), 6)  # same command, resumes
    assert int(ts_res.step) == int(ts_full.step) == 6
    np.testing.assert_allclose(
        float(terms_res["total"]), float(terms_full["total"]), rtol=1e-5
    )


@pytest.mark.slow
def test_fit_preprocessed_auto_resumes(tiny_asset, tmp_path):
    """Host-preprocessed (image-dir genre) training also checkpoints/resumes."""
    from indirect_learning_pose_shape_tpu.data import dataset as ds_lib, image_dir

    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=8, source_size=64, asset=tiny_asset
    )
    root = str(tmp_path / "imgdir")
    image_dir.export_image_dir(arrays, root)
    base = tiny_train_cfg()

    def run(ckdir, num_steps):
        cfg = dataclasses.replace(
            base, checkpoint_every=2, checkpoint_dir=ckdir, num_steps=4
        )
        ds = image_dir.ImageDirDataset(
            root, batch_size=cfg.batch_size, image_size=32, num_parts=24
        )
        return train.fit_preprocessed(cfg, ds, asset=tiny_asset, num_steps=num_steps)

    ts_full, terms_full = run(str(tmp_path / "ck_ref"), 4)
    run(str(tmp_path / "ck"), 2)
    ts_res, terms_res = run(str(tmp_path / "ck"), 4)
    assert int(ts_res.step) == int(ts_full.step) == 4
    np.testing.assert_allclose(
        float(terms_res["total"]), float(terms_full["total"]), rtol=1e-5
    )


@pytest.mark.slow
def test_fit_auto_resumes_from_checkpoint_dir(tiny_asset, tmp_path):
    """Crash recovery: rerunning fit with the same checkpoint dir restores
    the latest checkpoint and trains only the remaining steps to the same
    endpoint as an uninterrupted run."""
    ckdir = str(tmp_path / "ck")
    cfg = dataclasses.replace(
        tiny_train_cfg(), checkpoint_every=2, checkpoint_dir=ckdir, num_steps=6
    )
    # Uninterrupted run to step 6.
    ts_full, terms_full = train.fit(
        dataclasses.replace(cfg, checkpoint_dir=str(tmp_path / "ck_ref")),
        asset=tiny_asset,
    )
    # "Crashed" run: stops at step 4 (checkpointed at 2 and 4)...
    train.fit(cfg, asset=tiny_asset, num_steps=4)
    # ...rerun with the SAME command: must restore step 4, train 2 more.
    ts_resumed, terms_resumed = train.fit(cfg, asset=tiny_asset)
    assert int(ts_resumed.step) == int(ts_full.step) == 6
    np.testing.assert_allclose(
        float(terms_resumed["total"]), float(terms_full["total"]), rtol=1e-5
    )


@pytest.mark.slow
def test_load_model_is_optimizer_agnostic(tiny_asset, tmp_path):
    """predict.load_model restores a checkpoint written with a DIFFERENT
    optimizer structure (clip-chained AdamW vs the preset's plain Adam):
    eval must not depend on the training run's opt_state pytree."""
    from indirect_learning_pose_shape_tpu import evaluate as eval_mod
    from indirect_learning_pose_shape_tpu.predict import load_model
    from tests.test_train import tiny_train_cfg

    train_cfg = dataclasses.replace(
        tiny_train_cfg(),
        grad_clip_norm=1.0,
        weight_decay=1e-4,
        lr_schedule="cosine",
        num_steps=2,
        checkpoint_every=1,
        checkpoint_dir=str(tmp_path / "ck"),
    )
    ts, _ = train.fit(train_cfg, asset=tiny_asset, num_steps=2)

    eval_cfg = tiny_train_cfg()  # plain Adam, no clip — different opt_state
    params, state, consts = load_model(eval_cfg, str(tmp_path / "ck"), tiny_asset)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(params)[0]),
        np.asarray(jax.tree.leaves(ts.params)[0]),
    )
    m = eval_mod.evaluate(params, state, consts, eval_cfg, num_batches=1)
    assert np.isfinite(m["pve"])


@pytest.mark.slow
def test_checkpoint_cross_mesh_portability(tiny_asset, tmp_path):
    """Checkpoints are mesh-portable (SURVEY.md §5 failure table: elasticity
    across restarts): a run checkpointed on the 8-device mesh resumes on 1
    device — and the reverse — landing on the same loss trajectory as an
    unbroken run. Restore happens pre-replication by design (train.fit), so
    the restored arrays simply pick up the new run's sharding."""
    base = tiny_train_cfg(batch_size=8)
    ref_cfg = dataclasses.replace(
        base, num_devices=1, checkpoint_every=2,
        checkpoint_dir=str(tmp_path / "ref"),
    )
    ts_ref, terms_ref = train.fit(ref_cfg, asset=tiny_asset, num_steps=4)

    # 8-device segment, then continue the SAME checkpoint dir on 1 device.
    cfg8 = dataclasses.replace(
        base, num_devices=8, checkpoint_every=2, checkpoint_dir=str(tmp_path / "a")
    )
    train.fit(cfg8, asset=tiny_asset, num_steps=2)
    ts_a, terms_a = train.fit(
        dataclasses.replace(cfg8, num_devices=1), asset=tiny_asset, num_steps=4
    )
    assert int(ts_a.step) == int(ts_ref.step) == 4
    # Sharded-vs-single reduction order differs at f32 epsilon and compounds
    # through Adam (see test_steps_per_call_chunking_matches_single's note).
    np.testing.assert_allclose(
        float(terms_a["total"]), float(terms_ref["total"]), rtol=1e-2
    )

    # Reverse direction: 1-device segment resumed onto the 8-device mesh.
    cfg1 = dataclasses.replace(
        base, num_devices=1, checkpoint_every=2, checkpoint_dir=str(tmp_path / "b")
    )
    train.fit(cfg1, asset=tiny_asset, num_steps=2)
    ts_b, terms_b = train.fit(
        dataclasses.replace(cfg1, num_devices=8), asset=tiny_asset, num_steps=4
    )
    assert int(ts_b.step) == 4
    np.testing.assert_allclose(
        float(terms_b["total"]), float(terms_ref["total"]), rtol=1e-2
    )
