#!/usr/bin/env python
"""High-resolution differentiable-render scaling (single chip).

Times the separable-Gaussian rasterizer fwd and fwd+bwd at growing image
sizes — the regime parallel/render_sp.py's spatially-parallel mode targets
(cost and score-tensor HBM grow O(H·W); at 1024² the [B,C,H,W] score is
~0.8 GB at batch 8, and rows shard cleanly over a 'render' mesh axis).

    python benchmarks/highres_render.py [--sizes 256 512 1024] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[256, 512, 1024])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu.ops import raster
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    asset = assets_lib.load_asset()
    layout = raster.build_part_layout(
        (asset.part_labels() % 24).astype(int), 24, positions=asset.v_template
    )
    key = jax.random.PRNGKey(0)

    def timeit(fn, *a, steps=args.steps):
        out = fn(*a)
        jax.block_until_ready(out)
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / steps

    for size in args.sizes:
        cfg = raster.RasterConfig(image_size=size, num_parts=24)
        verts2d = jax.random.uniform(
            key, (args.batch, asset.v_template.shape[0], 2), maxval=float(size)
        )
        fwd = jax.jit(
            lambda v, c=cfg: raster.soft_rasterize(v, layout, c)["silhouette"]
        )
        bwd = jax.jit(
            jax.grad(
                lambda v, c=cfg: jnp.sum(
                    raster.soft_rasterize(v, layout, c)["silhouette"]
                )
            )
        )
        t_f = timeit(fwd, verts2d)
        t_b = timeit(bwd, verts2d)
        print(
            json.dumps(
                {
                    "size": size,
                    "batch": args.batch,
                    "fwd_ms": round(t_f * 1e3, 2),
                    "fwd_bwd_ms": round(t_b * 1e3, 2),
                    "fwd_bwd_images_per_sec": round(args.batch / t_b, 1),
                    "score_hbm_mb": round(
                        args.batch * 24 * size * size * 4 / 1e6, 1
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
