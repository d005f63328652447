"""Export the flagship forward pass as a serialized StableHLO artifact.

Thin CLI over indirect_learning_pose_shape_tpu/export.py (see its docstring
for the deployment contract).

    python tools/export_model.py out.stablehlo --preset config4_full \
        [--checkpoint ckpt_dir] [--batch 1]
    # serving side:
    #   fn = jax.export.deserialize(open('out.stablehlo','rb').read()).call
    #   theta, verts, kp2d = fn(images)   # images [B, S, S, 3] in [-1, 1]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("out", help="output artifact path")
    ap.add_argument("--preset", default="config4_full")
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument("--pretrained", default=None, help="backbone npz")
    ap.add_argument(
        "--ema",
        action="store_true",
        help="export the Polyak-averaged (EMA) params from the checkpoint "
        "(requires a run trained with ema_decay>0)",
    )
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument(
        "--platforms",
        nargs="+",
        default=None,
        help="lowering platforms embedded in the artifact "
        "(default: tpu+cpu, or tpu-only with --int8)",
    )
    ap.add_argument(
        "--int8",
        action="store_true",
        help="export the int8-PTQ encoder serving path (models/quantize.py); "
        "calibrates activation scales on a synthetic batch from the preset's "
        "data config",
    )
    ap.add_argument(
        "--int8-impl",
        default="int8c",
        choices=["int8", "int8c"],
        help="int8 execution scheme: 'int8c' (default; activations carried "
        "int8 across layers — the measured end-to-end win) or 'int8' "
        "(per-site, f32 between convs)",
    )
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu import configs
    from indirect_learning_pose_shape_tpu.export import export_forward, export_forward_int8
    from indirect_learning_pose_shape_tpu.predict import load_model
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    cfg = configs.PRESETS[args.preset]
    if args.pretrained:
        cfg = dataclasses.replace(cfg, pretrained=args.pretrained)
    params, state, consts = load_model(
        cfg, args.checkpoint, assets_lib.load_asset(), ema=args.ema
    )
    if args.int8:
        import jax

        from indirect_learning_pose_shape_tpu.data import synthetic

        calib = synthetic.generate_batch(
            jax.random.PRNGKey(17), 16, consts, cfg.model, cfg.synthetic
        )["image"]
        blob = export_forward_int8(
            cfg, params, state, consts, args.batch, calib, args.platforms,
            impl=args.int8_impl,
        )
    else:
        blob = export_forward(
            cfg, params, state, consts, args.batch, args.platforms or ["tpu", "cpu"]
        )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, batch {args.batch}, "
        f"platforms {args.platforms}"
    )


if __name__ == "__main__":
    main()
