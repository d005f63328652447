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


def test_direct_losses_zero_at_target_positive_away(rng):
    """Direct-supervision terms (j3d/v3d/rotmat/betas_l2) are proper
    distances: zero at the target, positive away from it."""
    j = jnp.asarray(rng.randn(2, 24, 3).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 50, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(2, 10).astype(np.float32))
    R = jnp.broadcast_to(jnp.eye(3), (2, 24, 3, 3))
    assert float(losses.joints3d_l2(j, j)) == 0.0
    assert float(losses.verts3d_l2(v, v)) == 0.0
    assert float(losses.betas_l2(b, b)) == 0.0
    assert float(losses.rotmat_frob(R, R)) == 0.0
    assert float(losses.joints3d_l2(j + 1.0, j)) > 0.0
    assert float(losses.verts3d_l2(v + 1.0, v)) > 0.0
    assert float(losses.betas_l2(b + 1.0, b)) > 0.0


def test_rotmat_frob_monotone_in_geodesic_angle():
    """Frobenius distance to identity grows with the rotation angle —
    the smooth, acos-free proxy for geodesic supervision."""
    from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod

    angles = [0.1, 0.5, 1.0, 2.0]
    eye = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
    vals = []
    for a in angles:
        aa = jnp.array([[[a, 0.0, 0.0]]])
        R = smpl_mod.batch_rodrigues(aa)
        vals.append(float(losses.rotmat_frob(R, eye)))
    assert vals == sorted(vals) and vals[0] > 0.0


def test_total_loss_direct_terms(rng):
    """total_loss includes direct terms when weighted, skips them at 0."""
    B = 2
    outputs = {
        "silhouette": jnp.asarray(rng.rand(B, 4, 4).astype(np.float32)),
        "kp2d": jnp.zeros((B, 3, 2)),
        "pose": jnp.zeros((B, 72)),
        "betas": jnp.ones((B, 10)),
        "joints": jnp.asarray(rng.randn(B, 24, 3).astype(np.float32)),
        "verts": jnp.asarray(rng.randn(B, 30, 3).astype(np.float32)),
        "rotmats": jnp.broadcast_to(jnp.eye(3), (B, 24, 3, 3)),
    }
    targets = {
        "joints3d": outputs["joints"] + 1.0,
        "verts3d": outputs["verts"],
        "rotmats": outputs["rotmats"],
        "betas": jnp.zeros((B, 10)),
    }
    w = {"j3d": 2.0, "v3d": 1.0, "rotmat": 1.0, "betas_l2": 1.0}
    total, terms = losses.total_loss(outputs, targets, w, 8)
    assert {"j3d", "v3d", "rotmat", "betas_l2"} <= set(terms)
    np.testing.assert_allclose(float(terms["j3d"]), 3.0, rtol=1e-6)  # Σ over xyz
    np.testing.assert_allclose(float(terms["betas_l2"]), 10.0, rtol=1e-6)
    np.testing.assert_allclose(
        float(total), 2.0 * 3.0 + 10.0, rtol=1e-6
    )  # v3d/rotmat are exactly zero
    _, terms0 = losses.total_loss(outputs, targets, {"j3d": 0.0}, 8)
    assert "j3d" not in terms0
