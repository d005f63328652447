"""Loss function sanity + invariance tests."""

import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu import losses


def test_bce_minimum_at_target(rng):
    t = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)
    near = jnp.clip(jnp.asarray(t), 1e-4, 1 - 1e-4)
    far = jnp.clip(jnp.asarray(1.0 - t), 1e-4, 1 - 1e-4)
    assert float(losses.silhouette_bce(near, t)) < float(losses.silhouette_bce(far, t))


def test_iou_perfect_is_zero(rng):
    t = (rng.rand(2, 8, 8) > 0.5).astype(np.float32)
    assert float(losses.silhouette_iou(jnp.asarray(t), t)) < 1e-5
    assert float(losses.silhouette_iou(jnp.asarray(1 - t), t)) > 0.9


def test_part_ce_prefers_correct_class(rng):
    labels = rng.randint(0, 4, size=(2, 8, 8))
    probs = np.full((2, 8, 8, 4), 0.1, np.float32)
    np.put_along_axis(probs, labels[..., None], 0.7, axis=-1)
    good = float(losses.part_seg_ce(jnp.asarray(probs), jnp.asarray(labels)))
    uniform = np.full_like(probs, 0.25)
    assert good < float(losses.part_seg_ce(jnp.asarray(uniform), jnp.asarray(labels)))


def test_keypoint_visibility_masking(rng):
    pred = rng.randn(2, 5, 2).astype(np.float32)
    target = pred.copy()
    target[:, 0] += 100.0  # huge error on joint 0
    vis_all = np.ones((2, 5), np.float32)
    vis_masked = vis_all.copy()
    vis_masked[:, 0] = 0.0
    l_all = float(losses.keypoint_l2(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(vis_all), 64))
    l_masked = float(losses.keypoint_l2(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(vis_masked), 64))
    assert l_masked < 1e-6 < l_all


def test_total_loss_skips_zero_weight_terms(rng):
    outputs = {
        "silhouette": jnp.asarray(rng.rand(1, 4, 4).astype(np.float32)),
        "kp2d": jnp.zeros((1, 3, 2)),
        "pose": jnp.zeros((1, 6)),
        "betas": jnp.ones((1, 2)),
    }
    targets = {
        "silhouette": jnp.asarray((rng.rand(1, 4, 4) > 0.5).astype(np.float32)),
        "kp2d": jnp.zeros((1, 3, 2)),
        "kp_vis": jnp.ones((1, 3)),
    }
    total, terms = losses.total_loss(
        outputs, targets, {"sil_bce": 1.0, "kp": 0.0, "shape_reg": 2.0}, 4
    )
    assert "kp" not in terms and "sil_bce" in terms
    np.testing.assert_allclose(
        float(total), float(terms["sil_bce"]) + 2.0 * float(terms["shape_reg"]), rtol=1e-6
    )
