"""Data pipeline tests: on-device preprocess, disk dataset, prefetch, native
host preprocessor (SURVEY.md §2.8)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu.data import dataset as ds_lib
from indirect_learning_pose_shape_tpu.data import native_preprocess as npp
from indirect_learning_pose_shape_tpu.data import preprocess as pp
from indirect_learning_pose_shape_tpu import train
from tests.test_train import tiny_train_cfg


def test_crop_resize_identity(rng):
    """Full-frame bbox + same out size == identity (up to f32)."""
    img = rng.randint(0, 255, (1, 32, 32, 3)).astype(np.float32)
    bbox = np.array([[16.0, 16.0, 32.0]], np.float32)  # continuous centre
    out = pp.crop_resize(jnp.asarray(img), jnp.asarray(bbox), 32)
    np.testing.assert_allclose(np.asarray(out), img, atol=1e-3)


def test_crop_resize_extracts_quadrant(rng):
    img = np.zeros((1, 64, 64, 3), np.float32)
    img[0, :32, :32] = 200.0
    bbox = np.array([[16.0, 16.0, 32.0]], np.float32)  # top-left quadrant
    out = np.asarray(pp.crop_resize(jnp.asarray(img), jnp.asarray(bbox), 16))
    assert out.mean() > 190.0


def test_keypoints_follow_crop(rng):
    kp = np.array([[[40.0, 20.0]]], np.float32)  # (x, y) source pixel indices
    # Crop centred on the point's continuous position (40.5, 20.5).
    bbox = np.array([[20.5, 40.5, 32.0]], np.float32)
    out = np.asarray(pp.transform_keypoints(jnp.asarray(kp), jnp.asarray(bbox), 64))
    np.testing.assert_allclose(out[0, 0], [31.5, 31.5], atol=1e-4)


def test_bbox_from_mask():
    mask = np.zeros((40, 40), np.float32)
    mask[10:20, 5:15] = 1.0
    bbox = np.asarray(pp.bbox_from_mask(jnp.asarray(mask), pad=1.0))
    np.testing.assert_allclose(bbox, [15.0, 10.0, 10.0], atol=1e-4)


def test_dataset_roundtrip_and_determinism(tiny_asset, tmp_path):
    path = str(tmp_path / "ds.npz")
    ds_lib.make_synthetic_dataset(path, num_examples=8, source_size=48, asset=tiny_asset)
    ds = ds_lib.NpzDataset(path, batch_size=4, seed=1)
    assert ds.steps_per_epoch() == 2
    a = [b["images"].sum() for _, b in zip(range(4), ds.batches())]
    b = [b["images"].sum() for _, b in zip(range(4), ds.batches())]
    assert a == b  # deterministic stream
    # Resume mid-stream: batches(2) continues exactly where step 2 would be.
    c = [b["images"].sum() for _, b in zip(range(2), ds.batches(start_step=2))]
    assert c == a[2:]


def test_prefetch_to_device(tiny_asset, tmp_path):
    arrays = ds_lib.make_synthetic_dataset(None, num_examples=4, source_size=48, asset=tiny_asset)
    ds = ds_lib.NpzDataset(arrays, batch_size=2)
    batches = list(ds_lib.prefetch_to_device(ds.epoch(0), size=2))
    assert len(batches) == 2
    assert isinstance(batches[0]["images"], jax.Array)


@pytest.mark.slow
def test_fit_dataset_runs_and_descends(tiny_asset, tmp_path):
    cfg = tiny_train_cfg()
    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=16, source_size=48, asset=tiny_asset
    )
    ds = ds_lib.NpzDataset(arrays, batch_size=cfg.batch_size)
    _, terms = train.fit_dataset(cfg, ds, asset=tiny_asset, num_steps=6)
    assert np.isfinite(terms["total"])


def test_native_lib_search_order(tmp_path):
    """Loader search: ILPS_NATIVE_LIB -> packaged-next-to-module -> native/.

    Pins the packaging contract (setup.py copies the .so into the package;
    installed trees have no repo-root native/): an explicit override wins,
    and the packaged location is consulted before the dev checkout's."""
    pkg_so = os.path.join(os.path.dirname(npp.__file__), "libilps_preprocess.so")
    dev_so = os.path.join(npp._NATIVE_DIR, "libilps_preprocess.so")
    override = tmp_path / "custom.so"
    override.write_bytes(b"")
    orig = npp._LIB_CANDIDATES[0]
    try:
        npp._LIB_CANDIDATES[0] = str(override)
        assert npp._find_lib() == str(override)
        npp._LIB_CANDIDATES[0] = ""
        found = npp._find_lib()
        if os.path.exists(pkg_so):
            assert found == pkg_so
        elif os.path.exists(dev_so):
            assert found == dev_so
    finally:
        npp._LIB_CANDIDATES[0] = orig


def test_native_matches_numpy_fallback(rng):
    imgs = [rng.randint(0, 255, (70 + 13 * i, 50 + 7 * i, 3)).astype(np.uint8) for i in range(3)]
    masks = [(rng.rand(*im.shape[:2]) > 0.6).astype(np.uint8) * (i + 1) for i, im in enumerate(imgs)]
    bboxes = np.stack([npp.bbox_from_mask(m) for m in masks])

    out_imgs = npp.crop_resize_normalize(imgs, bboxes, 32)
    out_masks = npp.crop_resize_mask(masks, bboxes, 32)
    # Numpy fallback reference.
    ref_imgs = np.stack(
        [npp._np_crop_resize(im, bb, 32) for im, bb in zip(imgs, bboxes)]
    ).astype(np.float32) / 127.5 - 1.0
    ref_masks = np.stack(
        [npp._np_crop_resize(m, bb, 32, nearest=True) for m, bb in zip(masks, bboxes)]
    )
    np.testing.assert_allclose(out_imgs, ref_imgs, atol=1e-4)
    if npp.USE_NATIVE:
        np.testing.assert_array_equal(out_masks, ref_masks)
    assert out_imgs.min() >= -1.0 and out_imgs.max() <= 1.0


@pytest.mark.slow
def test_fit_dataset_sharded_over_mesh(tiny_asset):
    """Disk-data path runs data-parallel over the fake 8-device mesh."""
    cfg = dataclasses.replace(tiny_train_cfg(batch_size=8), num_devices=8)
    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=16, source_size=48, asset=tiny_asset
    )
    ds = ds_lib.NpzDataset(arrays, batch_size=cfg.batch_size)
    _, terms = train.fit_dataset(cfg, ds, asset=tiny_asset, num_steps=3)
    assert np.isfinite(terms["total"])


@pytest.mark.slow
def test_fit_with_checkpointing(tiny_asset, tmp_path):
    """fit()'s in-loop orbax checkpointing writes a restorable checkpoint."""
    cfg = tiny_train_cfg(
        checkpoint_every=2, checkpoint_dir=str(tmp_path / "ck")
    )
    ts, _ = train.fit(cfg, asset=tiny_asset, num_steps=4)
    from indirect_learning_pose_shape_tpu.utils.checkpoint import Checkpointer

    ck = Checkpointer(str(tmp_path / "ck"))
    assert ck.latest_step() == 4
    ts2, _ = train.init_state(cfg, tiny_asset)
    restored = ck.restore(dataclasses.asdict(ts2))
    ck.close()
    assert int(restored["step"]) == 4


@pytest.mark.slow
def test_image_dir_dataset_roundtrip(tiny_asset, tmp_path):
    """Export -> ImageDirDataset -> host-preprocessed batches -> training."""
    from indirect_learning_pose_shape_tpu.data import image_dir

    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=8, source_size=64, asset=tiny_asset
    )
    root = str(tmp_path / "imgdir")
    image_dir.export_image_dir(arrays, root)
    ds = image_dir.ImageDirDataset(root, batch_size=4, image_size=32, num_parts=24)
    batch = next(ds.batches())
    assert batch["image"].shape == (4, 32, 32, 3)
    assert batch["image"].dtype == np.float32
    assert batch["part_labels"].max() <= 24
    assert ((batch["silhouette"] > 0.5) == (batch["part_labels"] > 0)).mean() > 0.99
    # Determinism + resume.
    a = [b["image"].sum() for _, b in zip(range(3), ds.batches())]
    b = [b["image"].sum() for _, b in zip(range(1), ds.batches(start_step=2))]
    assert a[2] == b[0]

    cfg = tiny_train_cfg()
    _, terms = train.fit_preprocessed(cfg, ds, asset=tiny_asset, num_steps=2)
    assert np.isfinite(terms["total"])


@pytest.mark.slow
def test_cosine_schedule_trains(tiny_asset):
    cfg = dataclasses.replace(
        tiny_train_cfg(), lr_schedule="cosine", warmup_steps=2, num_steps=10
    )
    _, terms = train.fit(cfg, asset=tiny_asset, num_steps=6)
    assert np.isfinite(terms["total"])


def test_sharded_dataset_stream_and_resume(tiny_asset, tmp_path):
    """ShardedNpzDataset: epoch coverage equals the source set, the stream
    is deterministic, resume is index-exact, and shards load lazily."""
    src = str(tmp_path / "big.npz")
    arrays = ds_lib.make_synthetic_dataset(
        src, num_examples=12, source_size=48, asset=tiny_asset
    )
    paths = ds_lib.shard_npz(src, str(tmp_path / "shards"), shard_size=4)
    assert len(paths) == 3
    ds = ds_lib.ShardedNpzDataset(str(tmp_path / "shards"), batch_size=2, seed=3)
    assert ds.num_examples == 12 and ds.steps_per_epoch() == 6
    assert "gt_pose" in ds.keys

    # One epoch covers every example exactly once (two-level shuffle is a
    # permutation of the whole set when batch divides shard size).
    epoch = list(ds.epoch(0))
    seen = np.concatenate([b["images"].reshape(2, -1).sum(axis=1) for b in epoch])
    want = np.sort(arrays["images"].reshape(12, -1).sum(axis=1))
    np.testing.assert_array_equal(np.sort(seen), want)
    # Different epochs draw different orders (shard AND example shuffles).
    e1 = np.concatenate(
        [b["images"].reshape(2, -1).sum(axis=1) for b in ds.epoch(1)]
    )
    assert not np.array_equal(seen, e1)
    np.testing.assert_array_equal(np.sort(e1), want)

    # Determinism + resume by index arithmetic.
    a = [b["images"].sum() for _, b in zip(range(9), ds.batches())]
    b = [b["images"].sum() for _, b in zip(range(9), ds.batches())]
    assert a == b
    c = [b["images"].sum() for _, b in zip(range(5), ds.batches(start_step=4))]
    assert c == a[4:]

    # open_dataset dispatch: file -> NpzDataset, dir/glob -> sharded.
    assert isinstance(ds_lib.open_dataset(src, 2), ds_lib.NpzDataset)
    assert isinstance(
        ds_lib.open_dataset(str(tmp_path / "shards"), 2), ds_lib.ShardedNpzDataset
    )
    assert isinstance(
        ds_lib.open_dataset(str(tmp_path / "shards" / "*.npz"), 2),
        ds_lib.ShardedNpzDataset,
    )


@pytest.mark.slow
def test_fit_and_eval_on_sharded_dataset(tiny_asset, tmp_path):
    """The training and eval loops run unchanged over the sharded loader."""
    from indirect_learning_pose_shape_tpu import evaluate as ev

    cfg = tiny_train_cfg()
    src = str(tmp_path / "src.npz")
    ds_lib.make_synthetic_dataset(src, num_examples=16, source_size=48, asset=tiny_asset)
    ds_lib.shard_npz(src, str(tmp_path / "sh"), shard_size=8)
    ds = ds_lib.ShardedNpzDataset(str(tmp_path / "sh"), batch_size=cfg.batch_size)
    ts, terms = train.fit_dataset(cfg, ds, asset=tiny_asset, num_steps=5)
    assert np.isfinite(terms["total"])
    m = ev.evaluate_dataset(
        ts.params, ts.model_state,
        train.init_state(cfg, tiny_asset)[1], cfg, ds, max_batches=2,
    )
    assert "pve" in m and np.isfinite(m["pve"])  # gt_* keys rode the shards


def test_synthetic_dataset_include_3d_keys(tiny_asset):
    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=4, source_size=48, asset=tiny_asset, include_3d=True
    )
    assert arrays["joints3d"].shape == (4, 24, 3)
    assert arrays["rotmats"].shape == (4, 24, 3, 3)
    # betas is NOT duplicated: betas_l2 training reads gt_betas through
    # fit_dataset's alias pull (ADVICE r3); verts3d is opt-in (size).
    assert "betas" not in arrays and "verts3d" not in arrays
    assert arrays["gt_betas"].shape[1] == 10
    av = ds_lib.make_synthetic_dataset(
        None, num_examples=2, source_size=48, asset=tiny_asset,
        include_verts3d=True,
    )
    assert av["verts3d"].ndim == 3 and av["verts3d"].shape[2] == 3


@pytest.mark.slow
def test_fit_dataset_mixed_supervision(tiny_asset):
    """End-to-end disk mixed supervision: the 3D label keys survive the
    prefetch filter (including the gt_betas → betas alias: the file stores
    no bare 'betas' array) and the j3d/rotmat/betas_l2 terms ride the
    dataset train step."""
    cfg = tiny_train_cfg()
    w = dict(cfg.loss_weights)
    w.update(j3d=5.0, rotmat=1.0, betas_l2=0.02)
    cfg = dataclasses.replace(cfg, loss_weights=tuple(w.items()))
    arrays = ds_lib.make_synthetic_dataset(
        None, num_examples=8, source_size=48, asset=tiny_asset, include_3d=True
    )
    assert "betas" not in arrays  # exercised: the alias pull, not a dup key
    ds = ds_lib.NpzDataset(arrays, batch_size=cfg.batch_size)
    _, terms = train.fit_dataset(cfg, ds, asset=tiny_asset, num_steps=3)
    assert {"j3d", "rotmat", "betas_l2"} <= set(terms)
    assert np.isfinite(terms["total"]) and np.isfinite(terms["j3d"])
