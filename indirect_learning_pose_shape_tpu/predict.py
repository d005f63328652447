"""Inference / demo entry point (SURVEY.md §2.11, §3.2).

Loads weights (orbax checkpoint, or fresh init for smoke runs), runs the
flagship forward — preprocess → encoder → IEF → SMPL — on one or more
images, and writes visualisations: the input with projected keypoints and
the predicted soft silhouette overlaid (matplotlib), plus the predicted
mesh as a Wavefront .obj. This doubles as the manual test harness, exactly
the role the reference's predict/vis scripts played.

Usage:
    python -m indirect_learning_pose_shape_tpu.predict --demo --out /tmp/vis
    python -m indirect_learning_pose_shape_tpu.predict \
        --dataset ds.npz --checkpoint /path/ckpt --out /tmp/vis
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu import configs
from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.ops import camera, raster
from indirect_learning_pose_shape_tpu.utils import assets as assets_lib


def load_model(
    cfg: configs.TrainConfig,
    checkpoint_dir: Optional[str] = None,
    asset=None,
    ema: bool = False,
    step: Optional[int] = None,
):
    """Returns (params, state, consts). Restores the latest checkpoint if given.

    Restores params + model (BN) state only — deliberately NOT the optimizer
    state, so a checkpoint written by a run with different optimizer
    plumbing (clip chain, AdamW, schedule) loads fine for evaluation.

    ema=True serves the Polyak-averaged shadow params instead of the raw
    ones (TrainConfig.ema_decay); refused loudly when the checkpoint was
    written by a run without EMA. step selects a specific checkpoint
    (default: latest) — quality here is horizon-dependent (BASELINE.md
    shape-prior corollary), so serving a mid-run checkpoint is a real
    deployment choice, not an afterthought.
    """
    from indirect_learning_pose_shape_tpu import train

    ts, consts = train.init_state(cfg, asset)
    if checkpoint_dir:
        from indirect_learning_pose_shape_tpu.utils.checkpoint import Checkpointer

        ckpt = Checkpointer(checkpoint_dir)
        abstract = dataclasses.asdict(ts)
        want = {"params": abstract["params"], "model_state": abstract["model_state"]}
        if ema:
            want["ema_params"] = abstract["params"]
        restored = ckpt.restore_partial(want, step=step)
        ckpt.close()
        params = restored["ema_params"] if ema else restored["params"]
        if ema and params is None:
            raise ValueError(
                f"checkpoint {checkpoint_dir!r} holds no EMA params (the run "
                "trained with ema_decay=0); re-train with TrainConfig."
                "ema_decay>0 or drop --ema"
            )
        return params, restored["model_state"], consts
    if ema and ts.ema_params is None:
        raise ValueError("ema requested but cfg.ema_decay=0 and no checkpoint given")
    return (ts.ema_params if ema else ts.params), ts.model_state, consts


def predict(
    params, state, consts, images, cfg: configs.TrainConfig, qparams=None,
    int8_impl: str = "int8c",
):
    """images [B, S, S, 3] in [-1, 1] -> outputs dict (verts, kp2d, theta...).

    qparams (models/quantize.py pytree) switches to the int8 serving
    encoder — what `--int8` deploys (int8_impl defaults to the carried
    scheme, the measured end-to-end win; BASELINE.md §serving)."""
    if qparams is not None:
        from indirect_learning_pose_shape_tpu.models import quantize as quant

        fn = jax.jit(
            lambda qp, ip, im: quant.quantized_forward(
                qp, ip, consts, im, cfg.model, impl=int8_impl
            )
        )
        return fn(qparams, params["ief"], images)
    fn = jax.jit(
        lambda p, s, im: net.forward(p, s, consts, im, cfg.model, train=False)[0]
    )
    return fn(params, state, images)


def render_silhouette(outputs, consts, cfg: configs.TrainConfig):
    """Soft silhouette for visual overlay from predicted verts + camera."""
    verts2d = camera.project_pixel(
        outputs["verts"], outputs["cam"], cfg.model.image_size
    )
    return raster.soft_rasterize(verts2d, consts.part_layout, cfg.model.raster)


def load_image_files(
    image_paths: list, mask_paths: Optional[list], size: int
) -> np.ndarray:
    """Arbitrary image files -> [B, size, size, 3] float32 in [-1, 1].

    With masks, the person crop box comes from the mask's nonzero extent
    (exactly the training-data crop); without, a full-frame centre square.
    """
    from indirect_learning_pose_shape_tpu.data import native_preprocess as npp
    from indirect_learning_pose_shape_tpu.data.image_dir import (
        _imread_mask,
        _imread_rgb,
    )

    imgs = [_imread_rgb(p) for p in image_paths]
    if mask_paths:
        if len(mask_paths) != len(image_paths):
            raise ValueError("--mask count must match --image count")
        bboxes = np.stack([npp.bbox_from_mask(_imread_mask(p)) for p in mask_paths])
    else:
        bboxes = np.stack(
            [
                np.array(
                    [im.shape[0] / 2.0, im.shape[1] / 2.0, max(im.shape[:2])],
                    np.float32,
                )
                for im in imgs
            ]
        )
    return npp.crop_resize_normalize(imgs, bboxes, size)


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    """Minimal Wavefront OBJ export of the predicted mesh."""
    with open(path, "w") as f:
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for tri in faces:
            f.write(f"f {tri[0] + 1} {tri[1] + 1} {tri[2] + 1}\n")


def shade_mesh(
    verts2d: np.ndarray,
    verts_z: np.ndarray,
    faces: np.ndarray,
    size: int,
    light=(0.35, -0.5, 0.79),
) -> np.ndarray:
    """Flat-shaded, z-buffered software render of the projected mesh.

    The reference genre's vis path may use OpenDR's shaded renderer
    (SURVEY.md §2.11/§0.1 item 6); this is the dependency-free numpy
    equivalent — Lambertian flat shading per triangle, painter-correct via a
    z-buffer. Vis-only: the differentiable training rasterizer
    (ops/raster.py) never touches triangles. Returns [size, size] in [0,1]
    (0 = background).
    """
    v = np.concatenate(
        [np.asarray(verts2d, np.float32), np.asarray(verts_z, np.float32)[:, None]],
        axis=1,
    )
    tri = v[np.asarray(faces, np.int64)]  # [F, 3, 3] (x_px, y_px, z)
    # Face normals from screen-space x/y + true z: orient toward the viewer.
    e1, e2 = tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    flip = n[:, 2] < 0
    n[flip] = -n[flip]
    norm = np.linalg.norm(n, axis=1)
    ok = norm > 1e-9
    n[ok] /= norm[ok, None]
    l = np.asarray(light, np.float32)
    l = l / np.linalg.norm(l)
    shade = 0.25 + 0.75 * np.clip(n @ l, 0.0, 1.0)

    img = np.zeros((size, size), np.float32)
    zbuf = np.full((size, size), -np.inf, np.float32)
    order = np.argsort(tri[:, :, 2].mean(axis=1))  # far-to-near helps cache
    for f in order:
        if not ok[f]:
            continue
        t = tri[f]
        x0, x1 = int(np.floor(t[:, 0].min())), int(np.ceil(t[:, 0].max()))
        y0, y1 = int(np.floor(t[:, 1].min())), int(np.ceil(t[:, 1].max()))
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, size - 1), min(y1, size - 1)
        if x1 < x0 or y1 < y0:
            continue
        xs, ys = np.meshgrid(
            np.arange(x0, x1 + 1, dtype=np.float32),
            np.arange(y0, y1 + 1, dtype=np.float32),
        )
        d = (t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1]) - (t[2, 0] - t[0, 0]) * (
            t[1, 1] - t[0, 1]
        )
        if abs(d) < 1e-9:
            continue
        w1 = ((xs - t[0, 0]) * (t[2, 1] - t[0, 1]) - (t[2, 0] - t[0, 0]) * (ys - t[0, 1])) / d
        w2 = ((t[1, 0] - t[0, 0]) * (ys - t[0, 1]) - (xs - t[0, 0]) * (t[1, 1] - t[0, 1])) / d
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * t[0, 2] + w1 * t[1, 2] + w2 * t[2, 2]
        sub_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        upd = inside & (z > sub_z)
        sub_z[upd] = z[upd]
        img[y0 : y1 + 1, x0 : x1 + 1][upd] = shade[f]
    return img


def save_overlay(path: str, image, silhouette, kp2d, part_map=None, shaded=None) -> None:
    """Input + keypoints, soft silhouette, and (optionally) part map -> PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = np.asarray(image)
    img = (img + 1.0) / 2.0 if img.min() < 0 else img
    ncols = 2 + (part_map is not None) + (shaded is not None)
    fig, axes = plt.subplots(1, ncols, figsize=(4 * ncols, 4))
    axes[0].imshow(np.clip(img, 0, 1))
    axes[0].scatter(kp2d[:, 0], kp2d[:, 1], c="lime", s=12, marker="+")
    axes[0].set_title("input + predicted 2D keypoints")
    axes[1].imshow(np.clip(img, 0, 1))
    axes[1].imshow(np.asarray(silhouette), alpha=0.5, cmap="viridis")
    axes[1].set_title("predicted soft silhouette")
    col = 2
    if part_map is not None:
        axes[col].imshow(np.asarray(part_map), cmap="tab20", interpolation="nearest")
        axes[col].set_title("predicted body-part segmentation")
        col += 1
    if shaded is not None:
        axes[col].imshow(np.asarray(shaded), cmap="gray", vmin=0.0, vmax=1.0)
        axes[col].set_title("shaded predicted mesh")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def main():
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="config4_full", choices=sorted(configs.PRESETS))
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--dataset", default=None, help=".npz dataset to read images from")
    ap.add_argument(
        "--image",
        nargs="+",
        default=None,
        help="arbitrary image file(s) (png/jpg); cropped from --mask when "
        "given, else a full-frame centre square",
    )
    ap.add_argument(
        "--mask",
        nargs="+",
        default=None,
        help="optional silhouette/part mask PNG(s), one per --image, used "
        "to derive the person crop box",
    )
    ap.add_argument("--demo", action="store_true", help="use synthetic demo images")
    ap.add_argument("--num", type=int, default=2, help="images to process")
    ap.add_argument("--out", default="/tmp/ilps_vis", help="output directory")
    ap.add_argument(
        "--pretrained",
        default=None,
        help="backbone npz from tools/import_resnet_weights.py (used when "
        "no --checkpoint is given)",
    )
    ap.add_argument(
        "--int8",
        action="store_true",
        help="predict through the int8-PTQ serving encoder "
        "(models/quantize.py; calibrated on a synthetic batch)",
    )
    ap.add_argument(
        "--qparams",
        default=None,
        help="pre-quantized encoder .npz (models/quantize.save_qparams); "
        "implies --int8 and skips calibration. If the file does not exist "
        "with --int8, it is written after calibration (quantize once, "
        "deploy many).",
    )
    ap.add_argument(
        "--ema",
        action="store_true",
        help="serve the Polyak-averaged (EMA) params from the checkpoint "
        "instead of the raw ones (requires a run with ema_decay>0)",
    )
    args = ap.parse_args()

    cfg = configs.PRESETS[args.preset]
    if args.pretrained:
        cfg = dataclasses.replace(cfg, pretrained=args.pretrained)
    asset = assets_lib.load_asset()
    params, state, consts = load_model(cfg, args.checkpoint, asset, ema=args.ema)
    size = cfg.model.image_size

    if args.image:
        images = jnp.asarray(load_image_files(args.image, args.mask, size))
    elif args.dataset:
        from indirect_learning_pose_shape_tpu.data import native_preprocess as npp
        from indirect_learning_pose_shape_tpu.data.dataset import NpzDataset

        ds = NpzDataset(args.dataset, batch_size=args.num)
        raw = next(ds.batches())
        bboxes = np.stack([npp.bbox_from_mask(m) for m in raw["masks"]])
        images = jnp.asarray(
            npp.crop_resize_normalize(list(raw["images"]), bboxes, size)
        )
    else:  # synthetic demo stream (no data needed)
        from indirect_learning_pose_shape_tpu.data import synthetic

        batch = jax.jit(
            lambda k: synthetic.generate_batch(k, args.num, consts, cfg.model)
        )(jax.random.PRNGKey(0))
        images = batch["image"]

    qparams = None
    if args.int8 or args.qparams:
        from indirect_learning_pose_shape_tpu.models import quantize as quant

        if args.qparams and os.path.exists(args.qparams):
            qparams = quant.load_qparams(args.qparams)
        else:
            from indirect_learning_pose_shape_tpu.data import synthetic as synth_mod

            calib = synth_mod.generate_batch(
                jax.random.PRNGKey(999), 16, consts, cfg.model, cfg.synthetic
            )["image"]
            qparams = quant.ptq_quantize(
                params["encoder"], state["encoder"], cfg.model.encoder, calib
            )
            if args.qparams:
                quant.save_qparams(args.qparams, qparams)
                print(f"wrote quantized encoder to {args.qparams}")
    outputs = predict(params, state, consts, images, cfg, qparams=qparams)
    rendered = render_silhouette(outputs, consts, cfg)

    os.makedirs(args.out, exist_ok=True)
    verts = np.asarray(outputs["verts"])
    kp2d = np.asarray(outputs["kp2d"])
    sil = np.asarray(rendered["silhouette"])
    parts = np.argmax(np.asarray(rendered["probs"]), axis=-1)
    from indirect_learning_pose_shape_tpu.ops import camera as camera_mod

    verts2d = np.asarray(
        camera_mod.project_pixel(outputs["verts"], outputs["cam"], size)
    )
    for i in range(images.shape[0]):
        save_obj(os.path.join(args.out, f"mesh_{i}.obj"), verts[i], asset.faces)
        save_overlay(
            os.path.join(args.out, f"overlay_{i}.png"),
            images[i],
            sil[i],
            kp2d[i],
            parts[i],
            shaded=shade_mesh(verts2d[i], verts[i][:, 2], asset.faces, size),
        )
    print(f"wrote {images.shape[0]} overlays + meshes to {args.out}")


if __name__ == "__main__":
    main()
