#!/usr/bin/env python
"""Direct optimization demo: fit SMPL parameters to a target silhouette.

The network-free form of indirect learning — gradient descent on
(θ, β, cam) through rasterizer → camera → SMPL against silhouette +
keypoint losses. This is the framework's defining differentiable chain in
isolation, and doubles as the end-to-end verification drive (see
.claude/skills/verify/SKILL.md).

    python examples/fit_to_silhouette.py [--steps 300] [--out /tmp/fit_vis]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu import losses
from indirect_learning_pose_shape_tpu.models import smpl
from indirect_learning_pose_shape_tpu.ops import camera, raster
from indirect_learning_pose_shape_tpu.utils import assets


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--out", default=None, help="write before/after overlays here")
    args = ap.parse_args()

    asset = assets.load_asset()
    consts = smpl.smpl_consts(asset)
    layout = raster.build_part_layout(
        asset.part_labels().clip(0, 23), 24, positions=asset.v_template
    )
    cfg = raster.RasterConfig(image_size=args.size, num_parts=24)
    B = args.batch

    # Ground truth to recover (known only to the target renderer).
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    gt_pose = 0.3 * jax.random.normal(k1, (B, 72))
    gt_betas = jax.random.normal(k2, (B, 10))
    gt_cam = jnp.tile(jnp.array([0.9, 0.0, 0.0]), (B, 1))

    def render(pose, betas, cam):
        out = smpl.smpl_forward(consts, pose, betas)
        v2d = camera.project_pixel(out["verts"], cam, args.size)
        sil = raster.soft_rasterize(v2d, layout, cfg)["silhouette"]
        kp2d = camera.project_pixel(out["kp3d"], cam, args.size)
        return sil, kp2d

    render_j = jax.jit(render)  # one cache: the demo reuses this graph 3x
    target_sil, target_kp = render_j(gt_pose, gt_betas, gt_cam)
    vis = jnp.ones(target_kp.shape[:2])

    def loss_fn(params):
        sil, kp2d = render(params["pose"], params["betas"], params["cam"])
        return (
            losses.silhouette_bce(sil, target_sil)
            + losses.silhouette_iou(sil, target_sil)
            + 10.0 * losses.keypoint_l2(kp2d, target_kp, vis, args.size)
            + 1e-3 * losses.shape_reg(params["betas"])
        )

    params = {
        "pose": jnp.zeros((B, 72)),
        "betas": jnp.zeros((B, 10)),
        "cam": jnp.tile(jnp.array([0.85, 0.02, -0.02]), (B, 1)),
    }

    @jax.jit
    def step(params):
        val, grads = jax.value_and_grad(loss_fn)(params)
        return val, jax.tree.map(lambda p, g: p - args.lr * g, params, grads)

    sil0, _ = render_j(params["pose"], params["betas"], params["cam"])
    t0 = time.time()
    loss0, params = step(params)
    loss0.block_until_ready()
    print(f"compile + first step: {time.time() - t0:.1f}s, loss {float(loss0):.4f}")
    t0 = time.time()
    loss = loss0
    for i in range(args.steps - 1):
        loss, params = step(params)
    loss.block_until_ready()
    ms = (time.time() - t0) / max(args.steps - 1, 1) * 1e3
    print(f"loss after {args.steps} steps: {float(loss):.4f}  ({ms:.1f} ms/step)")
    if args.steps > 1:
        assert float(loss) < float(loss0), "optimization did not descend"

    if args.out:
        import numpy as np

        from indirect_learning_pose_shape_tpu.predict import save_overlay

        os.makedirs(args.out, exist_ok=True)
        sil1, kp1 = render_j(params["pose"], params["betas"], params["cam"])
        img = np.repeat(np.asarray(target_sil[0])[..., None], 3, axis=-1) * 2 - 1
        save_overlay(
            os.path.join(args.out, "before.png"), img, np.asarray(sil0[0]),
            np.asarray(target_kp[0]),
        )
        save_overlay(
            os.path.join(args.out, "after.png"), img, np.asarray(sil1[0]),
            np.asarray(kp1[0]),
        )
        print(f"wrote before/after overlays to {args.out}")
    print("OK: gradients through raster -> camera -> SMPL recover the target")


if __name__ == "__main__":
    main()
