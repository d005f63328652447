"""Indirect-supervision losses (SURVEY.md §2.7, §3.4).

Render losses on the soft-rasterized map (binary silhouette BCE, soft IoU,
and per-pixel categorical CE over body-part channels — the reference's two
possible formulations per SURVEY.md §0.1 item 3 are both provided), plus the
2D keypoint reprojection loss on visible joints and the usual parameter
regularizers. All losses are means so they are batch-size and
device-count invariant (required for data-parallel gradient averaging,
SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-7


def silhouette_bce(pred_sil: jax.Array, target_sil: jax.Array) -> jax.Array:
    """Binary cross-entropy. pred/target [B, H, W], pred in (0, 1)."""
    p = jnp.clip(pred_sil, _EPS, 1.0 - _EPS)
    return -jnp.mean(target_sil * jnp.log(p) + (1.0 - target_sil) * jnp.log1p(-p))


def silhouette_iou(pred_sil: jax.Array, target_sil: jax.Array) -> jax.Array:
    """Soft-IoU loss: 1 − |p∩t| / |p∪t|, per image then mean over batch."""
    inter = jnp.sum(pred_sil * target_sil, axis=(-2, -1))
    union = jnp.sum(pred_sil + target_sil - pred_sil * target_sil, axis=(-2, -1))
    return jnp.mean(1.0 - inter / (union + _EPS))


def part_seg_ce(pred_probs: jax.Array, target_labels: jax.Array) -> jax.Array:
    """Per-pixel categorical CE over C+1 channels (0 = background).

    pred_probs [B, H, W, C+1] (normalized), target_labels [B, H, W] int.
    Uses a dense one-hot mask rather than take_along_axis: the gather's
    backward is an XLA scatter over the [B,H,W,C+1] map (slow on TPU), while
    the mask form stays elementwise in both directions.
    """
    logp = jnp.log(jnp.clip(pred_probs, _EPS, 1.0))
    classes = jnp.arange(pred_probs.shape[-1], dtype=target_labels.dtype)
    mask = (target_labels[..., None] == classes).astype(logp.dtype)
    return -jnp.sum(mask * logp) / (mask.size // pred_probs.shape[-1])


def part_seg_ce_scores(
    score_cp: jax.Array,
    s_total: jax.Array,
    bg_gamma: float,
    target_labels: jax.Array,
) -> jax.Array:
    """part_seg_ce computed from RAW class scores (ops/raster.py
    soft_rasterize_train) without materializing the normalized probs:

        CE(pixel) = −log probs[label]
                  = log(bg_gamma + Σc score_c) − log(score_label or bg_gamma)

    score_cp [B, C, H*W] channel-first, s_total [B, H*W] = Σc score,
    target_labels [B, H, W] int (0 = background). The label pick uses the
    same dense-mask form as part_seg_ce (elementwise fwd AND bwd — a
    take_along_axis would put an XLA scatter over [B,C,P] in the backward);
    per-pixel log/normalization happens on [B,P] scalars, which is the
    entire point: one pass over the [B,C,P] score instead of three over
    [B,P,C+1] probs. Equal to part_seg_ce(soft probs) to f32 rounding
    (tested in test_losses.py).
    """
    B, C, P = score_cp.shape
    labels = target_labels.reshape(B, P)
    classes = jnp.arange(1, C + 1, dtype=labels.dtype)
    mask = (labels[:, None, :] == classes[:, None]).astype(score_cp.dtype)
    # dtype=f32 accumulation makes this exact even for bf16 scores
    # (RasterConfig.train_score_dtype): mask is one-hot over classes, so
    # the "sum" selects a single score per pixel — no accumulation error.
    picked = jnp.sum(mask * score_cp, axis=1, dtype=jnp.float32)  # [B, P]
    picked = jnp.where(labels == 0, bg_gamma, picked)
    ce = jnp.log(bg_gamma + s_total) - jnp.log(jnp.clip(picked, _EPS, None))
    return jnp.mean(ce)


def keypoint_l2(
    pred_kp2d: jax.Array, target_kp2d: jax.Array, visibility: jax.Array,
    image_size: int,
) -> jax.Array:
    """Visibility-masked mean squared 2D keypoint error, in normalized units.

    pred/target [B, K, 2] in pixels; visibility [B, K] in {0, 1}. Scaling by
    1/image_size makes the weight resolution-independent.
    """
    scale = 1.0 / image_size
    err = jnp.sum(((pred_kp2d - target_kp2d) * scale) ** 2, axis=-1)  # [B, K]
    num = jnp.sum(err * visibility)
    den = jnp.sum(visibility) + _EPS
    return num / den


def shape_reg(betas: jax.Array) -> jax.Array:
    """L2 prior pulling β toward the mean shape."""
    return jnp.mean(jnp.sum(betas * betas, axis=-1))


# --- Direct supervision (the genre's comparison axis) -----------------------
#
# The reference implements INDIRECT learning — silhouette/part render +
# 2D keypoint losses only (SURVEY.md §2.7) — and the genre's papers compare
# it against DIRECT supervision on the SMPL outputs themselves. These terms
# make that comparison (and mixed training) a config choice: all default to
# weight 0, so the shipped presets remain reference-faithful pure-indirect.
# They are parameterization-independent (3D joints / vertices / rotation
# matrices), so they apply equally to axis-angle and rot6d heads.


def joints3d_l2(pred_joints: jax.Array, target_joints: jax.Array) -> jax.Array:
    """Mean squared 3D joint error in model space. [B, J, 3] each."""
    return jnp.mean(jnp.sum((pred_joints - target_joints) ** 2, axis=-1))


def verts3d_l2(pred_verts: jax.Array, target_verts: jax.Array) -> jax.Array:
    """Mean squared 3D vertex error in model space. [B, V, 3] each."""
    return jnp.mean(jnp.sum((pred_verts - target_verts) ** 2, axis=-1))


def rotmat_frob(pred_rotmats: jax.Array, target_rotmats: jax.Array) -> jax.Array:
    """Mean squared Frobenius distance between per-joint rotation matrices.

    [B, J, 3, 3] each. ‖R₁−R₂‖²_F = 4·sin²(geodesic/2)·… — monotone in the
    geodesic angle, smooth everywhere (no acos), and representation-free:
    the same target supervises an axis-angle or a rot6d head.
    """
    d = pred_rotmats - target_rotmats
    return jnp.mean(jnp.sum(d * d, axis=(-2, -1)))


def betas_l2(pred_betas: jax.Array, target_betas: jax.Array) -> jax.Array:
    """Mean squared shape-coefficient error. [B, 10] each."""
    return jnp.mean(jnp.sum((pred_betas - target_betas) ** 2, axis=-1))


def pose_reg(pose_prior: jax.Array) -> jax.Array:
    """L2 prior on the body-pose deviation vector (global joint excluded).

    For axis-angle this is pose[..., 3:]; for rot6d it is the deviation from
    the identity encoding — the network provides the right vector as
    outputs['pose_prior'].
    """
    return jnp.mean(jnp.sum(pose_prior * pose_prior, axis=-1))


def total_loss(
    outputs: dict[str, jax.Array],
    targets: dict[str, jax.Array],
    weights: dict[str, float],
    image_size: int,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Weighted sum of the indirect-learning losses.

    outputs: silhouette [B,H,W], kp2d [B,K,2], pose [B,72], betas [B,10],
             and EITHER probs [B,H,W,C+1] (normalized, eval/predict path)
             OR score_cp [B,C,H*W] + s_total [B,H*W] + bg_gamma (score form,
             the training hot path — ops/raster.py soft_rasterize_train).
    targets: silhouette [B,H,W] and/or part_labels [B,H,W] int,
             kp2d [B,K,2], kp_vis [B,K]
    weights: keys among {'sil_bce','sil_iou','part_ce','kp','shape_reg',
             'pose_reg'} (indirect, the reference's set) and
             {'j3d','v3d','rotmat','betas_l2'} (direct 3D supervision, all
             default 0 — targets then need joints3d [B,J,3] / verts3d
             [B,V,3] / rotmats [B,J,3,3] / betas [B,10]); zero/absent terms
             are skipped at trace time.
    """
    terms: dict[str, jax.Array] = {}
    if weights.get("sil_bce", 0.0):
        terms["sil_bce"] = silhouette_bce(outputs["silhouette"], targets["silhouette"])
    if weights.get("sil_iou", 0.0):
        terms["sil_iou"] = silhouette_iou(outputs["silhouette"], targets["silhouette"])
    if weights.get("part_ce", 0.0):
        if "score_cp" in outputs:
            terms["part_ce"] = part_seg_ce_scores(
                outputs["score_cp"],
                outputs["s_total"],
                outputs["bg_gamma"],
                targets["part_labels"],
            )
        else:
            terms["part_ce"] = part_seg_ce(outputs["probs"], targets["part_labels"])
    if weights.get("kp", 0.0):
        terms["kp"] = keypoint_l2(
            outputs["kp2d"], targets["kp2d"], targets["kp_vis"], image_size
        )
    if weights.get("shape_reg", 0.0):
        terms["shape_reg"] = shape_reg(outputs["betas"])
    if weights.get("pose_reg", 0.0):
        terms["pose_reg"] = pose_reg(outputs.get("pose_prior", outputs["pose"]))
    # Direct supervision (targets present only when the dataset carries 3D
    # ground truth — the synthetic stream, or an npz with 3D labels).
    if weights.get("j3d", 0.0):
        terms["j3d"] = joints3d_l2(outputs["joints"], targets["joints3d"])
    if weights.get("v3d", 0.0):
        terms["v3d"] = verts3d_l2(outputs["verts"], targets["verts3d"])
    if weights.get("rotmat", 0.0):
        terms["rotmat"] = rotmat_frob(outputs["rotmats"], targets["rotmats"])
    if weights.get("betas_l2", 0.0):
        terms["betas_l2"] = betas_l2(outputs["betas"], targets["betas"])

    total = jnp.asarray(0.0, jnp.float32)
    for name, value in terms.items():
        total = total + weights[name] * value
    terms["total"] = total
    return total, terms
