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


def test_part_ce_scores_equals_probs_form(rng):
    """part_seg_ce_scores (score form, no probs tensor) == part_seg_ce on the
    normalized probs, values AND gradients w.r.t. the scores."""
    import jax

    B, C, H, W = 2, 5, 8, 8
    bg = 1.0
    score_cp = jnp.asarray(rng.rand(B, C, H * W).astype(np.float32)) * 3.0
    labels = jnp.asarray(rng.randint(0, C + 1, (B, H, W)).astype(np.int32))

    def probs_form(score_cp):
        s_total = jnp.sum(score_cp, axis=1)
        denom = bg + s_total
        probs = jnp.concatenate(
            [ (bg / denom)[:, None], score_cp / denom[:, None] ], axis=1
        )  # [B, C+1, P]
        probs = jnp.moveaxis(probs, 1, 2).reshape(B, H, W, C + 1)
        return losses.part_seg_ce(probs, labels)

    def score_form(score_cp):
        s_total = jnp.sum(score_cp, axis=1)
        return losses.part_seg_ce_scores(score_cp, s_total, bg, labels)

    v1, g1 = jax.value_and_grad(probs_form)(score_cp)
    v2, g2 = jax.value_and_grad(score_form)(score_cp)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_total_loss_score_form_matches(rng):
    """total_loss dispatches to the score form when outputs carry score_cp,
    and the result matches the probs form."""
    B, C, H, W = 2, 4, 8, 8
    bg = 1.0
    score_cp = jnp.asarray(rng.rand(B, C, H * W).astype(np.float32)) * 2.0
    s_total = jnp.sum(score_cp, axis=1)
    denom = bg + s_total
    probs = jnp.moveaxis(
        jnp.concatenate([(bg / denom)[:, None], score_cp / denom[:, None]], axis=1),
        1, 2,
    ).reshape(B, H, W, C + 1)
    sil = (s_total / denom).reshape(B, H, W)
    common = {
        "kp2d": jnp.zeros((B, 3, 2)),
        "betas": jnp.zeros((B, 10)),
        "pose": jnp.zeros((B, 72)),
        "silhouette": sil,
    }
    targets = {
        "silhouette": (sil > 0.5).astype(jnp.float32),
        "part_labels": jnp.asarray(rng.randint(0, C + 1, (B, H, W)).astype(np.int32)),
        "kp2d": jnp.ones((B, 3, 2)),
        "kp_vis": jnp.ones((B, 3)),
    }
    w = {"sil_bce": 1.0, "part_ce": 1.0, "kp": 1.0}
    t1, _ = losses.total_loss(dict(common, probs=probs), targets, w, 8)
    t2, _ = losses.total_loss(
        dict(common, score_cp=score_cp, s_total=s_total, bg_gamma=bg),
        targets, w, 8,
    )
    np.testing.assert_allclose(float(t1), float(t2), rtol=1e-6)
