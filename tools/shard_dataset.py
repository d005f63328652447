#!/usr/bin/env python
"""Split a monolithic dataset .npz into ShardedNpzDataset shards.

For datasets larger than host RAM: `ShardedNpzDataset` (data/dataset.py)
streams training/eval batches with at most one shard resident. This tool is
the writer side — it slices every key of the source file into
`shard_NNNNN.npz` files of `--shard-size` examples each, streaming one
shard's slice at a time (peak memory = one shard, not the source).

    python tools/shard_dataset.py big.npz shards/ --shard-size 4096
    python -m indirect_learning_pose_shape_tpu.train --dataset shards/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("src", help="source .npz dataset")
    ap.add_argument("out_dir", help="directory for the shard files")
    ap.add_argument(
        "--shard-size", type=int, default=4096, help="examples per shard"
    )
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu.data.dataset import shard_npz

    paths = shard_npz(args.src, args.out_dir, args.shard_size)
    print(f"wrote {len(paths)} shards to {args.out_dir}")


if __name__ == "__main__":
    main()
