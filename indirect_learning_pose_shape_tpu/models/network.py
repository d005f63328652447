"""Full network assembly (SURVEY.md §2.6): encoder → IEF → SMPL → projection
→ soft rasterizer, as one pure function.

`forward` is the inference path (images → params/verts/joints/kp2d) — the
metric path for images/sec/chip (BASELINE.json:2). `forward_train`
additionally renders the segmentation map for the indirect render loss; the
rasterizer is training-only supervision machinery (SURVEY.md §3.2).
"""

from __future__ import annotations

import dataclasses
import functools
import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu.models import encoder as enc
from indirect_learning_pose_shape_tpu.models import ief as ief_mod
from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod
from indirect_learning_pose_shape_tpu.ops import camera, raster, raster_hard
from indirect_learning_pose_shape_tpu.utils.assets import SMPLAsset


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    image_size: int = 256
    encoder: enc.EncoderConfig = enc.EncoderConfig()
    ief: ief_mod.IEFConfig = ief_mod.IEFConfig()
    raster: raster.RasterConfig = raster.RasterConfig()
    smpl_impl: str = "auto"  # 'xla' | 'pallas' | 'auto' (= xla; see smpl.py)
    raster_impl: str = "auto"  # 'separable' | 'xla' | 'pallas' | 'auto' (=separable)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["smpl", "part_layout", "hard"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ModelConsts:
    """Non-trainable constants: SMPL tensors + class-sorted part layout +
    face topology for the hard (z-buffered) target renderer."""

    smpl: smpl_mod.SMPLConsts
    part_layout: raster.PartLayout
    hard: raster_hard.HardConsts


def build_consts(asset: SMPLAsset, cfg: ModelConfig) -> ModelConsts:
    vlabels = np.minimum(asset.part_labels(), cfg.raster.num_parts - 1)
    return ModelConsts(
        smpl=smpl_mod.smpl_consts(asset),
        part_layout=raster.build_part_layout(
            vlabels,
            cfg.raster.num_parts,
            positions=asset.v_template,  # static spatial sort -> tighter culling
        ),
        # Same vertex→class map as the soft raster's channels, so hard and
        # soft targets share one label space (ops/raster_hard.py).
        hard=raster_hard.build_hard_consts(asset.faces, vlabels),
    )


def init(key, asset: SMPLAsset, cfg: ModelConfig) -> tuple[dict, dict, ModelConsts]:
    """Returns (params, state, consts)."""
    consts = build_consts(asset, cfg)
    k_enc, k_ief = jax.random.split(key)
    enc_params, enc_state = enc.encoder_init(k_enc, cfg.encoder)
    mean_theta = smpl_mod.mean_params(
        consts.smpl, cfg.ief.num_cam, cfg.ief.rotation_format
    )
    ief_params = ief_mod.ief_init(k_ief, cfg.ief, cfg.encoder.feature_dim, mean_theta)
    return {"encoder": enc_params, "ief": ief_params}, {"encoder": enc_state}, consts


def forward(
    params: dict,
    state: dict,
    consts: ModelConsts,
    images: jax.Array,
    cfg: ModelConfig,
    train: bool = False,
) -> tuple[dict, dict]:
    """Inference path. images [B, H, W, 3] -> outputs dict, new_state.

    Stages run under jax.named_scope so profiler traces attribute device
    time per component (tools/profile_step.py groups on these names).
    """
    with jax.named_scope("encoder"):
        feat, enc_state = enc.encoder_apply(
            params["encoder"], state["encoder"], images, cfg.encoder, train
        )
    outputs = head_from_features(params["ief"], consts, feat, cfg)
    return outputs, {"encoder": enc_state}


def head_from_features(
    ief_params: dict, consts: ModelConsts, feat: jax.Array, cfg: ModelConfig
) -> dict:
    """IEF → SMPL → projection from encoder features (the post-encoder tail).

    Split out of `forward` so alternative encoder paths — the int8
    post-training-quantized serving encoder (models/quantize.py) — reuse the
    identical head.
    """
    with jax.named_scope("ief"):
        theta = ief_mod.ief_apply(ief_params, feat, cfg.ief)
    pose, betas, cam = ief_mod.split_theta(theta, cfg.ief)
    B = pose.shape[0]
    J = consts.smpl.num_joints
    if cfg.ief.rotation_format == "rot6d":
        rotmats = smpl_mod.rot6d_to_rotmat(pose.reshape(B, J, 6))
        # Prior pulls toward the identity encoding; global joint excluded.
        identity6 = jnp.tile(
            jnp.array([1, 0, 0, 0, 1, 0], pose.dtype), (J,)
        )
        pose_prior = (pose - identity6)[:, 6:]
    else:
        rotmats = smpl_mod.batch_rodrigues(pose.reshape(B, J, 3))
        pose_prior = pose[:, 3:]
    with jax.named_scope("smpl"):
        smpl_out = smpl_mod.smpl_forward_rotmats(
            consts.smpl, rotmats, betas, impl=cfg.smpl_impl
        )
    kp2d = camera.project_pixel(smpl_out["kp3d"], cam, cfg.image_size)
    outputs = {
        "theta": theta,
        "pose": pose,
        "pose_prior": pose_prior,
        "rotmats": rotmats,
        "betas": betas,
        "cam": cam,
        "verts": smpl_out["verts"],
        "joints": smpl_out["joints"],
        "kp3d": smpl_out["kp3d"],
        "kp2d": kp2d,
    }
    return outputs


def forward_train(
    params: dict,
    state: dict,
    consts: ModelConsts,
    images: jax.Array,
    cfg: ModelConfig,
    train: bool = True,
    constrain=None,
    probs: bool = True,
) -> tuple[dict, dict]:
    """Training path: inference outputs + rendered soft seg map.

    train=False gives the rendered outputs with inference-mode BatchNorm
    (running statistics) — what evaluation must measure.

    `constrain` is the spatially-parallel rendering hook
    (parallel/render_sp.constrainer): on a ('data','render') mesh it shards
    the raster's image rows over the render axis, making the training-path
    render itself scale out (worthwhile at ≥512² render sizes — see
    docs/DESIGN.md §Parallelism).

    probs=False uses the score-form render (raster.soft_rasterize_train):
    outputs carry score_cp/s_total/bg_gamma instead of the [B,H,W,C+1]
    probs tensor, which losses.total_loss consumes directly — the training
    hot path. Eval/predict keep probs=True (part metrics and
    visualisations want normalized class probabilities).
    """
    outputs, new_state = forward(params, state, consts, images, cfg, train=train)
    return render_outputs(outputs, consts, cfg, constrain=constrain, probs=probs), new_state


def render_outputs(
    outputs: dict,
    consts: ModelConsts,
    cfg: ModelConfig,
    constrain=None,
    probs: bool = True,
) -> dict:
    """The raster tail of forward_train: outputs dict -> + rendered fields.

    Factored out so alternative forward paths (the int8 serving encoder,
    evaluate.py's quantized eval) can render supervision/metric maps from
    their own predictions without re-entering forward()."""
    verts2d = camera.project_pixel(outputs["verts"], outputs["cam"], cfg.image_size)
    with jax.named_scope("raster"):
        if probs:
            rendered = raster.soft_rasterize(
                verts2d,
                consts.part_layout,
                cfg.raster,
                impl=cfg.raster_impl,
                constrain=constrain,
            )
            outputs["probs"] = rendered["probs"]
        else:
            rendered = raster.soft_rasterize_train(
                verts2d,
                consts.part_layout,
                cfg.raster,
                impl=cfg.raster_impl,
                constrain=constrain,
            )
            outputs["score_cp"] = rendered["score_cp"]
            outputs["s_total"] = rendered["s_total"]
            outputs["bg_gamma"] = cfg.raster.bg_gamma
    outputs["verts2d"] = verts2d
    outputs["silhouette"] = rendered["silhouette"]
    return outputs
