"""On-device augmentation (data/augment.py): mirror correctness + jitter.

The mirror test checks the three label spaces together: pixel content flips,
keypoint x-coordinates mirror with left/right identities swapped, and
left/right part ids swap in the mask — and that flip∘flip is the identity.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu.data import augment as aug


def _raw(rng, B=4, H=24, W=32, K=19):
    masks = np.zeros((B, H, W), np.uint8)
    masks[:, 4:20, 6:12] = 17  # L shoulder blob on the left side of frame
    masks[:, 4:20, 20:26] = 18  # R shoulder... (SMPL joint 16/17 -> ids 17/18)
    return {
        "images": rng.randint(0, 255, (B, H, W, 3)).astype(np.uint8),
        "masks": masks,
        "kp2d": (rng.rand(B, K, 2) * [W, H]).astype(np.float32),
        "kp_vis": (rng.rand(B, K) > 0.3).astype(np.float32),
    }


def test_mirror_flips_all_label_spaces(rng):
    raw = {k: jnp.asarray(v) for k, v in _raw(rng).items()}
    cfg = aug.AugmentConfig(enabled=True, flip_prob=1.0)
    out = aug.mirror_raw_batch(raw, jax.random.PRNGKey(0), cfg)

    W = raw["images"].shape[2]
    np.testing.assert_array_equal(
        np.asarray(out["images"]), np.asarray(raw["images"])[:, :, ::-1]
    )
    # Part ids swap: the blob that was left-of-frame with id 17 (L shoulder)
    # lands right-of-frame with id 18 (R shoulder).
    m = np.asarray(out["masks"])
    assert (m[:, 4:20, W - 12 : W - 6] == 18).all()
    assert (m[:, 4:20, W - 26 : W - 20] == 17).all()
    # Keypoints: x mirrored AND identities swapped (R ankle <-> L ankle).
    kp = np.asarray(out["kp2d"])
    src = np.asarray(raw["kp2d"])
    np.testing.assert_allclose(kp[:, 0, 0], W - 1.0 - src[:, 5, 0], rtol=1e-6)
    np.testing.assert_allclose(kp[:, 0, 1], src[:, 5, 1], rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(out["kp_vis"])[:, 3], np.asarray(raw["kp_vis"])[:, 2]
    )

    # Involution: flipping twice is the identity in every array (kp2d up to
    # one f32 rounding of W-1-x).
    back = aug.mirror_raw_batch(out, jax.random.PRNGKey(1), cfg)
    for k in raw:
        np.testing.assert_allclose(
            np.asarray(back[k]), np.asarray(raw[k]), atol=1e-5
        )


def test_kp_flip_perm_conventions():
    """Swap tables are involutions that pair left/right across all three
    known conventions; unknown counts are refused."""
    for k in (19, 17, 14):
        perm = aug.kp_flip_perm(k)
        assert perm.shape == (k,)
        np.testing.assert_array_equal(perm[perm], np.arange(k))  # involution
        assert sorted(perm) == list(range(k))  # a true permutation
    # COCO-17: L shoulder (5) <-> R shoulder (6); nose (0) fixed.
    p17 = aug.kp_flip_perm(17)
    assert p17[5] == 6 and p17[6] == 5 and p17[0] == 0
    # LSP-14: R ankle (0) <-> L ankle (5); head top (13) fixed.
    p14 = aug.kp_flip_perm(14)
    assert p14[0] == 5 and p14[5] == 0 and p14[13] == 13
    with pytest.raises(ValueError, match="flip_prob=0"):
        aug.kp_flip_perm(21)


def test_mirror_prob_zero_is_identity(rng):
    raw = {k: jnp.asarray(v) for k, v in _raw(rng).items()}
    cfg = aug.AugmentConfig(enabled=True, flip_prob=0.0)
    out = aug.mirror_raw_batch(raw, jax.random.PRNGKey(0), cfg)
    for k in raw:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(raw[k]))


def test_jitter_bboxes_bounds(rng):
    cfg = aug.AugmentConfig(enabled=True, scale_jitter=0.1, trans_jitter=0.05)
    boxes = jnp.asarray(
        np.stack([np.full(64, 50.0), np.full(64, 60.0), np.full(64, 100.0)], axis=1)
    )
    out = np.asarray(aug.jitter_bboxes(boxes, jax.random.PRNGKey(0), cfg))
    assert (out[:, 2] >= 90.0 - 1e-4).all() and (out[:, 2] <= 110.0 + 1e-4).all()
    assert (np.abs(out[:, 0] - 50.0) <= 5.0 + 1e-4).all()
    assert (np.abs(out[:, 1] - 60.0) <= 5.0 + 1e-4).all()
    assert np.std(out[:, 2]) > 1.0  # actually random


@pytest.mark.slow
def test_train_step_with_augmentation(tiny_asset):
    """data_train_step compiles + runs with augmentation enabled, and the
    augmentation key is step-indexed (same ts -> same batch transform)."""
    from indirect_learning_pose_shape_tpu import train
    from tests.test_train import tiny_train_cfg

    cfg = dataclasses.replace(
        tiny_train_cfg(), augment=aug.AugmentConfig(enabled=True)
    )
    ts, consts = train.init_state(cfg, tiny_asset)
    rng = np.random.RandomState(7)
    raw = {
        "images": jnp.asarray(rng.randint(0, 255, (cfg.batch_size, 40, 40, 3)).astype(np.uint8)),
        "masks": jnp.asarray((rng.rand(cfg.batch_size, 40, 40) > 0.7).astype(np.uint8) * 3),
        "kp2d": jnp.asarray((rng.rand(cfg.batch_size, 19, 2) * 40).astype(np.float32)),
        "kp_vis": jnp.asarray(np.ones((cfg.batch_size, 19), np.float32)),
    }
    b1 = train.preprocess_raw_batch(raw, consts, cfg, key=jax.random.fold_in(ts.rng, 0))
    b2 = train.preprocess_raw_batch(raw, consts, cfg, key=jax.random.fold_in(ts.rng, 0))
    np.testing.assert_array_equal(np.asarray(b1["image"]), np.asarray(b2["image"]))

    ts2, terms = jax.jit(
        lambda t, r: train.data_train_step(t, r, consts, cfg)
    )(ts, raw)
    assert np.isfinite(float(terms["total"]))
    assert int(ts2.step) == 1
