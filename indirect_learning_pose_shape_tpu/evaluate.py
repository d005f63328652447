"""Evaluation metrics + loop (model-quality counterpart to the benchmarks).

Standard 3D pose/shape metrics of the reference's research genre, computed
against ground truth (available exactly on the synthetic stream):

- PVE: mean per-vertex error between predicted and GT SMPL surfaces (mm if
  the asset is metric).
- MPJPE: mean per-joint position error on the regressed 3D keypoints.
- PA-MPJPE: MPJPE after Procrustes alignment (rotation/translation/scale
  removed — isolates articulated-pose error from camera error).
- Silhouette IoU between the rendered prediction and the target mask.

All pure jittable functions; `evaluate()` runs them over a synthetic
validation stream with a fixed key, so eval is deterministic.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu import configs
from indirect_learning_pose_shape_tpu.data import synthetic
from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod


def pve(pred_verts: jax.Array, gt_verts: jax.Array) -> jax.Array:
    """Mean per-vertex Euclidean error. [B, V, 3] x2 -> scalar."""
    return jnp.mean(jnp.linalg.norm(pred_verts - gt_verts, axis=-1))


def mpjpe(pred_joints: jax.Array, gt_joints: jax.Array) -> jax.Array:
    """Mean per-joint position error. [B, K, 3] x2 -> scalar."""
    return jnp.mean(jnp.linalg.norm(pred_joints - gt_joints, axis=-1))


def procrustes_align(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Similarity-align pred to gt per batch item (Umeyama). [B, N, 3]."""
    mu_p = jnp.mean(pred, axis=1, keepdims=True)
    mu_g = jnp.mean(gt, axis=1, keepdims=True)
    pc, gc = pred - mu_p, gt - mu_g
    cov = jnp.einsum("bni,bnj->bij", gc, pc) / pred.shape[1]
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt))
    d = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # reflection fix
    rot = jnp.einsum("bij,bj,bjk->bik", u, d, vt)
    var_p = jnp.mean(jnp.sum(pc * pc, axis=-1), axis=1)
    scale = jnp.sum(s * d, axis=-1) / (var_p + 1e-12)
    aligned = scale[:, None, None] * jnp.einsum("bij,bnj->bni", rot, pc) + mu_g
    return aligned


def pa_mpjpe(pred_joints: jax.Array, gt_joints: jax.Array) -> jax.Array:
    return mpjpe(procrustes_align(pred_joints, gt_joints), gt_joints)


def silhouette_iou_metric(pred_sil: jax.Array, target_sil: jax.Array) -> jax.Array:
    """Hard IoU at 0.5 threshold. [B, H, W] x2 -> scalar."""
    p = pred_sil > 0.5
    t = target_sil > 0.5
    inter = jnp.sum(p & t, axis=(-2, -1))
    union = jnp.sum(p | t, axis=(-2, -1))
    return jnp.mean(inter / jnp.maximum(union, 1))


def evaluate(
    params,
    model_state,
    consts: net.ModelConsts,
    cfg: configs.TrainConfig,
    num_batches: int = 4,
    seed: int = 123,
) -> dict[str, float]:
    """Deterministic eval over the synthetic validation stream."""

    @jax.jit
    def eval_batch(key):
        batch = synthetic.generate_batch(
            key, cfg.batch_size, consts, cfg.model, cfg.synthetic
        )
        # train=False: metrics must reflect deployed inference behaviour
        # (BatchNorm running stats, not per-eval-batch statistics).
        outputs, _ = net.forward_train(
            params, model_state, consts, batch["image"], cfg.model, train=False
        )
        gt = smpl_mod.smpl_forward(
            consts.smpl, batch["gt_pose"], batch["gt_betas"], impl=cfg.model.smpl_impl
        )
        return {
            "pve": pve(outputs["verts"], gt["verts"]),
            "mpjpe": mpjpe(outputs["kp3d"], gt["kp3d"]),
            "pa_mpjpe": pa_mpjpe(outputs["kp3d"], gt["kp3d"]),
            "sil_iou": silhouette_iou_metric(
                outputs["silhouette"], batch["silhouette"]
            ),
        }

    keys = jax.random.split(jax.random.PRNGKey(seed), num_batches)
    acc: dict[str, float] = {}
    for k in keys:
        m = eval_batch(k)
        for name, v in m.items():
            acc[name] = acc.get(name, 0.0) + float(v) / num_batches
    return acc


def main():
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="config4_full", choices=sorted(configs.PRESETS))
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--batches", type=int, default=4)
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu.predict import load_model
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    cfg = configs.PRESETS[args.preset]
    params, state, consts = load_model(cfg, args.checkpoint, assets_lib.load_asset())
    metrics = evaluate(params, state, consts, cfg, num_batches=args.batches)
    print(json.dumps({k: round(v, 5) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
