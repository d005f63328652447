"""Render a synthetic on-disk dataset with the library's own SMPL + raster.

CLI wrapper over data/dataset.py make_synthetic_dataset (SURVEY.md §4.3's
self-supervised fixture, as a user tool): no external data needed, ground
truth known exactly. The npz matches the --dataset training/eval format
(images/masks/kp2d/kp_vis + gt_pose/gt_betas); --include-3d adds the direct
-supervision targets (joints3d/rotmats/betas — losses.py j3d/rotmat/betas_l2)
and --shards writes a ShardedNpzDataset directory for larger-than-RAM use.

  python tools/make_synthetic_dataset.py out.npz --num 2048 --include-3d
  python tools/make_synthetic_dataset.py shards/ --num 100000 --shards 25
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("out", help="output .npz path, or a directory with --shards")
    ap.add_argument("--num", type=int, default=512, help="number of examples")
    ap.add_argument(
        "--size", type=int, default=320,
        help="source resolution (training crops/resizes on device)",
    )
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument(
        "--include-3d", action="store_true",
        help="store joints3d/rotmats for direct/mixed supervision (betas_l2 "
        "reads the always-present gt_betas via fit_dataset's alias)",
    )
    ap.add_argument(
        "--include-verts3d", action="store_true",
        help="also store per-example vertices (v3d supervision; ~83 KB/"
        "example — measured information-free given j3d+rotmat+betas)",
    )
    ap.add_argument(
        "--synthetic", action="append", default=[], metavar="FIELD=VALUE",
        help="override one generator knob (repeatable) — distribution "
        "hardness (pose_std=0.35), target renderer (targets=hard writes "
        "z-buffered masks from the asset's faces), or appearance "
        "randomization (bg_mode=texture color_jitter=0.08 shading=0.6 "
        "occluders=2); data/synthetic.SyntheticConfig fields",
    )
    ap.add_argument(
        "--shards", type=int, default=0,
        help="split into this many npz shards under OUT (a directory); "
        "0 writes a single npz file",
    )
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu.data import dataset as ds
    from indirect_learning_pose_shape_tpu.data import synthetic
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    synth = (
        synthetic.apply_overrides(synthetic.SyntheticConfig(), args.synthetic)
        if args.synthetic
        else None
    )

    if args.shards:
        import tempfile

        os.makedirs(args.out, exist_ok=True)
        with tempfile.NamedTemporaryFile(suffix=".npz", delete=False) as tmp:
            tmp_path = tmp.name
        try:
            ds.make_synthetic_dataset(
                tmp_path, args.num, source_size=args.size, seed=args.seed,
                include_3d=args.include_3d,
                include_verts3d=args.include_verts3d,
                synth=synth,
            )
            shard_size = -(-args.num // args.shards)
            paths = ds.shard_npz(tmp_path, args.out, shard_size)
        finally:
            os.unlink(tmp_path)
        print(f"wrote {args.num} examples in {len(paths)} shards under {args.out}")
    else:
        arrays = ds.make_synthetic_dataset(
            args.out, args.num, source_size=args.size, seed=args.seed,
            include_3d=args.include_3d,
            include_verts3d=args.include_verts3d,
            synth=synth,
        )
        mb = sum(a.nbytes for a in arrays.values()) / 1e6
        print(
            f"wrote {args.num} examples ({mb:.1f} MB uncompressed, keys "
            f"{sorted(arrays)}) to {args.out}"
        )


if __name__ == "__main__":
    main()
