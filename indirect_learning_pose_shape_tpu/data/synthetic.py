"""On-device synthetic training data (SURVEY.md §4.3, BASELINE.json:10).

Self-supervised fixture: sample ground-truth Θ = (θ, β, cam), run our own
SMPL + renderer to produce the target silhouette / body-part map and 2D
keypoints, and synthesize an input image from the part map (each part gets a
fixed color, plus lighting-ish noise). Everything is a pure jittable
function of a PRNG key — no disk, no host loop — which is exactly the
"on-device preprocessing + target-silhouette generation" required by
BASELINE.json:11, and it gives integration tests a train-to-recover-Θ task
with a known answer (no external dataset needed).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod
from indirect_learning_pose_shape_tpu.ops import camera, raster, raster_hard


@dataclasses.dataclass(frozen=True)
class SyntheticConfig:
    pose_std: float = 0.25  # axis-angle std for body joints
    global_std: float = 0.15  # std for global orientation
    shape_std: float = 1.0
    cam_scale_range: tuple = (0.7, 1.1)
    cam_trans_std: float = 0.08
    image_noise: float = 0.05
    kp_visibility: float = 0.9  # fraction of keypoints marked visible
    # --- target renderer ---------------------------------------------------
    # 'soft': thresholds/argmaxes of the differentiable soft-raster score
    # (fast; the model trains through the SAME renderer family — in-family
    # supervision). 'hard': z-buffered triangle render from the asset's
    # faces (ops/raster_hard.py) — hard edges, true occlusion, renderer-
    # independent of the training path; what a real dataset's annotation
    # masks look like (SURVEY.md §2.8 "target silhouette load-or-render").
    targets: str = "soft"
    # --- appearance randomization (the axis plain streams never vary) ------
    # Background: 'none' keeps the fixed dark palette color; 'noise' is
    # per-pixel colored noise; 'texture' is smooth random blotches + grain.
    bg_mode: str = "none"
    # Per-sample, per-part palette jitter std (breaks the fixed part→color
    # map the encoder could otherwise invert).
    color_jitter: float = 0.0
    # Lambertian flat-shading strength in [0, 1] from the hard render's face
    # normals under a per-sample random light (requires targets='hard').
    shading: float = 0.0
    # Random occluder rectangles painted over the IMAGE only — targets keep
    # labelling the full body, as dataset annotations do for occluded people.
    occluders: int = 0
    occluder_size: float = 0.25  # max half-size as a fraction of the image
    # Hard-renderer per-tile face budget (ops/raster_hard.py k_faces top_k
    # culling); 0 = dense/exact. k=512 is lossless on the stand-in's
    # ~1.8k-face hull mesh at 256² (zero overflow, test-gated:
    # tests/test_raster_hard.py) and ~30% faster in the full train step
    # (60.4 vs 85.9 ms/step b32 — BASELINE.md hard-target throughput
    # rows); dense stays the safe default because an undersized budget
    # silently DROPS faces (counted in the render's `overflow` — gate any
    # new mesh/budget with a dense-equality test before trusting it).
    hard_k_faces: int = 0


# Named eval distributions for the quality protocol (BASELINE.md round 4):
# every tool that scores a checkpoint accepts --eval-suite NAME so "scored
# on the hard-appearance stream" means the same FIELD=VALUE set everywhere.
# 'plain' is the default training stream; 'hard' swaps the soft-raster
# targets for renderer-independent z-buffer masks (and the input image is
# built from them); 'hardapp' additionally domain-randomizes appearance —
# the distribution-shift row the round-3 verdict asked for (textured
# backgrounds, per-part color jitter, normal shading, occluders).
EVAL_SUITES = {
    "plain": (),
    "hard": ("targets=hard",),
    "hardapp": (
        "targets=hard",
        "bg_mode=texture",
        "color_jitter=0.08",
        "shading=0.6",
        "occluders=2",
    ),
}


def apply_overrides(cfg: SyntheticConfig, specs) -> SyntheticConfig:
    """Apply CLI ``FIELD=VALUE`` overrides to a SyntheticConfig.

    The stream-hardness knobs (pose_std, cam_scale_range, ...) control the
    training/eval distribution; exposing them as flags makes
    distribution-hardness sweeps and out-of-distribution eval rows a CLI
    choice instead of a code edit (train/quality_eval --synthetic).
    Unknown fields are refused loudly (the repo's convention for label/
    convention knobs); `cam_scale_range` parses as ``lo,hi``.
    """
    valid = {f.name for f in dataclasses.fields(SyntheticConfig)}
    choices = {"targets": ("soft", "hard"), "bg_mode": ("none", "noise", "texture")}
    updates = {}
    for spec in specs:
        name, sep, value = spec.partition("=")
        if not sep or name not in valid:
            raise ValueError(
                f"synthetic override {spec!r}: expected FIELD=VALUE with "
                f"FIELD among {sorted(valid)}"
            )
        try:
            if name == "cam_scale_range":
                parts = value.split(",")
                if len(parts) != 2:
                    raise ValueError("takes LO,HI (e.g. cam_scale_range=0.5,1.3)")
                updates[name] = (float(parts[0]), float(parts[1]))
            elif name in choices:
                if value not in choices[name]:
                    raise ValueError(f"takes one of {choices[name]}")
                updates[name] = value
            elif name in ("occluders", "hard_k_faces"):
                updates[name] = int(value)
            else:
                updates[name] = float(value)
        except ValueError as e:
            # Re-raise float()/int()'s bare conversion error with the same
            # descriptive framing unknown fields get.
            raise ValueError(f"synthetic override {spec!r}: {e}") from None
    return dataclasses.replace(cfg, **updates)


def sample_theta(key, batch: int, consts: net.ModelConsts, cfg: SyntheticConfig):
    """Sample ground-truth (pose [B,72], betas [B,10], cam [B,3])."""
    kp, kg, kb, ks, kt = jax.random.split(key, 5)
    J = consts.smpl.num_joints
    pose = cfg.pose_std * jax.random.normal(kp, (batch, J * 3))
    glob = cfg.global_std * jax.random.normal(kg, (batch, 3))
    pose = pose.at[:, :3].set(glob)
    betas = cfg.shape_std * jax.random.normal(kb, (batch, consts.smpl.num_betas))
    lo, hi = cfg.cam_scale_range
    scale = jax.random.uniform(ks, (batch, 1), minval=lo, maxval=hi)
    trans = cfg.cam_trans_std * jax.random.normal(kt, (batch, 2))
    cam = jnp.concatenate([scale, trans], axis=1)
    return pose, betas, cam


def _part_palette(num_channels: int) -> jax.Array:
    """Fixed, distinct RGB color per channel (0 = background, dark)."""
    k = jax.random.PRNGKey(1234)
    colors = jax.random.uniform(k, (num_channels, 3), minval=0.15, maxval=1.0)
    return colors.at[0].set(jnp.array([0.05, 0.05, 0.08]))


def _background(key, batch: int, size: int, mode: str, palette) -> jax.Array | None:
    """Random background image [B, S, S, 3] in [0, 1], or None for 'none'.

    'noise' is i.i.d. per-pixel color; 'texture' is smooth random blotches
    (low-res field bilinearly upsampled) with fine grain on top — cheap
    stand-ins for the cluttered scenes real crops have behind the person.
    """
    if mode == "none":
        return None
    if mode == "noise":
        return jax.random.uniform(key, (batch, size, size, 3))
    if mode == "texture":
        k_low, k_grain = jax.random.split(key)
        low = jax.image.resize(
            jax.random.uniform(k_low, (batch, 8, 8, 3)),
            (batch, size, size, 3),
            method="bilinear",
        )
        grain = jax.random.uniform(k_grain, (batch, size, size, 3))
        return jnp.clip(0.8 * low + 0.2 * grain, 0.0, 1.0)
    raise ValueError(f"bg_mode {mode!r}: takes 'none' | 'noise' | 'texture'")


def _paint_occluders(key, image: jax.Array, cfg: SyntheticConfig) -> jax.Array:
    """Paint cfg.occluders random colored rectangles over the image (only —
    targets still label the whole body, as dataset annotations do)."""
    if not cfg.occluders:
        return image
    batch, size = image.shape[0], image.shape[1]
    coords = jnp.arange(size, dtype=jnp.float32)
    for i in range(cfg.occluders):
        k_pos, k_half, k_col = jax.random.split(jax.random.fold_in(key, i), 3)
        centre = jax.random.uniform(k_pos, (batch, 2), maxval=float(size))
        half = jax.random.uniform(
            k_half,
            (batch, 2),
            minval=0.04 * size,
            maxval=cfg.occluder_size * size,
        )
        color = jax.random.uniform(k_col, (batch, 1, 1, 3))
        in_x = jnp.abs(coords[None, :] - centre[:, 0:1]) < half[:, 0:1]  # [B,S]
        in_y = jnp.abs(coords[None, :] - centre[:, 1:2]) < half[:, 1:2]
        mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]  # [B,S,S,1]
        image = jnp.where(mask, color, image)
    return image


def generate_batch(
    key,
    batch: int,
    consts: net.ModelConsts,
    model_cfg: net.ModelConfig,
    cfg: SyntheticConfig = SyntheticConfig(),
    constrain=None,
    include_3d: bool = False,
) -> dict[str, jax.Array]:
    """One fully on-device batch: images + render/keypoint targets + gt Θ.

    `constrain` (parallel/render_sp.constrainer) row-shards the TARGET
    render over a ('data','render') mesh, so target generation scales with
    the prediction render instead of being computed replicated.

    `include_3d` additionally returns the generator's 3D ground truth
    (gt_joints3d / gt_verts / gt_rotmats) for DIRECT-supervision training
    (losses.py j3d/v3d/rotmat terms). Off by default: the pure-indirect
    paths then carry no extra HBM traffic on the two-dispatch (gen + step)
    routes, and the fused single-graph route DCEs unread outputs anyway.

    Returns dict:
      image       [B, S, S, 3] float32 in [-1, 1]
      silhouette  [B, S, S]    float32 target silhouette
      part_labels [B, S, S]    int32 target class map (0 = bg)
      kp2d        [B, 19, 2]   pixel keypoints
      kp_vis      [B, 19]      visibility mask
      gt_pose / gt_betas / gt_cam — for recovery-error metrics only.
      (+ gt_joints3d [B,J,3], gt_verts [B,V,3], gt_rotmats [B,J,3,3]
       when include_3d)
    """
    # k_app is fold_in-derived, NOT a wider split: the 3-way split keeps the
    # default stream bit-identical to earlier rounds (every protocol quality
    # row is scored on held-out batches of this stream — a key-split change
    # would silently shift all of them).
    k_theta, k_noise, k_vis = jax.random.split(key, 3)
    k_app = jax.random.fold_in(key, 0x0A99)
    size = model_cfg.image_size
    pose, betas, cam = sample_theta(k_theta, batch, consts, cfg)

    smpl_out = smpl_mod.smpl_forward(consts.smpl, pose, betas, impl=model_cfg.smpl_impl)
    verts2d = camera.project_pixel(smpl_out["verts"], cam, size)
    kp2d = camera.project_pixel(smpl_out["kp3d"], cam, size)
    if cfg.shading and cfg.targets != "hard":
        raise ValueError(
            "synthetic shading needs face normals, which only the hard "
            "z-buffer renderer computes — set targets=hard with shading"
        )

    # Per-sample appearance draws (no-ops when the knobs are 0/none).
    k_pal, k_bg, k_light, k_occ = jax.random.split(k_app, 4)
    palette = _part_palette(model_cfg.raster.num_parts + 1)  # [C+1, 3]
    if cfg.color_jitter:
        palette = jnp.clip(
            palette[None]
            + cfg.color_jitter * jax.random.normal(k_pal, (batch,) + palette.shape),
            0.0,
            1.0,
        )  # [B, C+1, 3]
    else:
        palette = jnp.broadcast_to(palette[None], (batch,) + palette.shape)
    bg_px = _background(k_bg, batch, size, cfg.bg_mode, palette)  # [B,S,S,3]|None

    if cfg.targets == "hard":
        # Renderer-independent targets: z-buffered triangle render from the
        # asset's faces. Dense (exact) face mode — the stand-in's per-part
        # hull mesh is ~1.8k faces. `constrain` row-shards the pixel work
        # over the 'render' mesh axis (tile bands ARE row bands; see
        # hard_raster's docstring), so render_devices training composes
        # with hard targets instead of silently replicating them.
        light = jnp.array([0.35, -0.5, 0.79]) + 0.6 * jax.random.normal(
            k_light, (batch, 3)
        )
        hr = raster_hard.hard_raster(
            verts2d,
            smpl_out["verts"][..., 2],
            consts.hard,
            size,
            k_faces=cfg.hard_k_faces or None,
            with_shade=cfg.shading > 0,
            light=light,
            constrain=constrain,
        )
        part_labels = hr["part_labels"]
        silhouette = hr["silhouette"]
        # Image from the hard labels: per-sample palette lookup (+ flat
        # shading), textured/noise background where uncovered.
        rgb = jnp.take_along_axis(
            palette[:, :, None], part_labels.reshape(batch, 1, -1, 1), axis=1
        )[:, 0].reshape(batch, size, size, 3)
        if cfg.shading:
            lit = 1.0 - cfg.shading + cfg.shading * hr["shade"][..., None]
            rgb = jnp.where(silhouette[..., None] > 0, rgb * lit, rgb)
        if bg_px is not None:
            rgb = jnp.where(silhouette[..., None] > 0, rgb, bg_px)
        image = rgb
    else:
        # Target render: pure data (argmax'd to labels / thresholded to a
        # mask, never differentiated), so the cheapest matmul precision
        # suffices — a ~1e-2 score error cannot move a 0.5 threshold or an
        # argmax except exactly on class boundaries, where either label is a
        # valid target.
        target_raster_cfg = dataclasses.replace(
            model_cfg.raster, matmul_precision="default"
        )
        # Target path: raw class scores only, in bf16 — no [B,H,W,C+1]
        # normalized-probability tensor. The targets are thresholds/argmaxes
        # of the scores and the synthetic image is an affine palette mix, so
        # the probs tensor the differentiated prediction path materializes is
        # pure HBM traffic here (identities, with denom = bg_gamma + Σc
        # score_c):
        #   argmax(probs)  == 0 if bg_gamma >= max_c score_c else argmax+1
        #   soft_sil > 0.5 ⇔  Σc score_c > bg_gamma
        #   probs @ palette == (bg_gamma·palette₀ + score @ palette₁₊)/denom
        # Channel-FIRST [B,C,H,W]: every consumer below reduces over the
        # class axis, which on the separable raster's native (H,W)-tiled
        # layout is a streaming reduce over a major dim — the channel-last
        # [B,H*W,C] form forced a physical re-tiling pass (1.23 ms at B=128)
        # before the same reductions.
        score = raster.raster_scores_cf(
            verts2d,
            consts.part_layout,
            target_raster_cfg,
            impl=model_cfg.raster_impl,
            constrain=constrain,
            out_dtype=jnp.bfloat16,
        )  # [B, C, S, S]

        bg = float(model_cfg.raster.bg_gamma)
        s_total = jnp.sum(score, axis=1, dtype=jnp.float32)  # [B, S, S]
        best = jnp.argmax(score, axis=1).astype(jnp.int32)
        mx = jnp.max(score, axis=1).astype(jnp.float32)
        part_labels = jnp.where(mx > bg, best + 1, 0)
        # Binarised silhouette target (what a dataset mask would look like).
        silhouette = (s_total > bg).astype(jnp.float32)

        # Palette mix as a broadcast multiply-reduce, NOT an einsum: a
        # 'bchw,cd->bhwd' dot_general (C=24 contraction, 3 output features)
        # is degenerate matmul work that XLA lowers badly in this layout
        # (measured 2.61 ms at B=128 vs 0.68 for this form). The reduce over
        # the class axis streams the (H,W)-tiled score once on the VPU, like
        # the other target reductions above.
        pal = palette[:, 1:].astype(score.dtype)  # [B, C, 3]
        mix = jnp.sum(
            score[:, :, :, :, None] * pal[:, :, None, None, :],
            axis=1,
            dtype=jnp.float32,
        )  # [B, S, S, 3]
        bg_rgb = bg_px if bg_px is not None else palette[:, 0][:, None, None, :]
        image = (bg * bg_rgb + mix) / (bg + s_total)[..., None]

    image = _paint_occluders(k_occ, image, cfg)
    image = image + cfg.image_noise * jax.random.normal(k_noise, image.shape)
    image = jnp.clip(image, 0.0, 1.0) * 2.0 - 1.0

    # Geometric visibility: keypoints projected outside the crop are
    # invisible (structured missingness, like a dataset's truncated bodies),
    # on top of the random dropout that models annotation gaps.
    in_crop = jnp.all((kp2d >= 0.0) & (kp2d <= size - 1.0), axis=-1)
    kp_vis = (
        in_crop & (jax.random.uniform(k_vis, kp2d.shape[:2]) < cfg.kp_visibility)
    ).astype(jnp.float32)

    out = {
        "image": image.astype(jnp.float32),
        "silhouette": silhouette,
        "part_labels": part_labels,
        "kp2d": kp2d,
        "kp_vis": kp_vis,
        "gt_pose": pose,
        "gt_betas": betas,
        "gt_cam": cam,
    }
    if include_3d:
        J = consts.smpl.num_joints
        out["gt_joints3d"] = smpl_out["joints"]
        out["gt_verts"] = smpl_out["verts"]
        # The generator samples axis-angle; the rotation-matrix form is the
        # representation-free target a rot6d head can be supervised with.
        out["gt_rotmats"] = smpl_mod.batch_rodrigues(pose.reshape(batch, J, 3))
    return out
