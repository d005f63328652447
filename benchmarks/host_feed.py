#!/usr/bin/env python
"""Host-feeding analysis: can this host's preprocessor keep the chip fed?

Measures the native C++ preprocessor's single-core throughput on the
disk-path hot loop (bbox_from_mask + crop_resize_normalize +
crop_resize_mask, ragged source → fixed training resolution) and derives
how many host cores the full pipeline needs to sustain the chip's training
rate (BASELINE.md: 4 546 img/s at b128/256²) — the round-3 verdict's
"host-feeding analysis" for the disk pipeline (SURVEY.md §2.8's loader).

The numpy fallback is measured alongside for the no-toolchain case
(ILPS_DISABLE_NATIVE toggles it, same switch the parity tests use). Pure
host benchmark: no TPU, no jax. The native library scales near-linearly in
num_threads (one image per task row), so cores_for_chip ≈ the core count a
production host needs for this source→out shape.

    python benchmarks/host_feed.py [--source 320] [--out 256] [--n 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _bench(npp, imgs, masks, out_size, repeats=3):
    """Best per-image wall time of the full per-sample host path (seconds)."""
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        bboxes = np.stack([npp.bbox_from_mask(m) for m in masks])
        npp.crop_resize_normalize(imgs, bboxes, out_size, num_threads=1)
        npp.crop_resize_mask(masks, bboxes, out_size, num_threads=1)
        best = min(best, (time.perf_counter() - t0) / len(imgs))
    return best


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--source", type=int, default=320)
    ap.add_argument("--out", type=int, default=256)
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument(
        "--chip-rate", type=float, default=4546.0,
        help="img/s the chip consumes (BASELINE.md best-batch train rate)",
    )
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu.data import native_preprocess as npp

    rng = np.random.default_rng(0)
    imgs = [
        rng.integers(0, 255, (args.source, args.source, 3), dtype=np.uint8)
        for _ in range(args.n)
    ]
    # Blob-ish masks so bbox_from_mask scans a realistic foreground.
    masks = []
    yy, xx = np.mgrid[0 : args.source, 0 : args.source]
    for _ in range(args.n):
        cy, cx = rng.uniform(0.3, 0.7, 2) * args.source
        r = rng.uniform(0.15, 0.35) * args.source
        inside = ((yy - cy) ** 2 + (xx - cx) ** 2) < r**2
        masks.append((inside * rng.integers(1, 25)).astype(np.uint8))

    rows = {}
    # Native first (loads the library), then the numpy fallback by forcing
    # _load() to refuse — the same ILPS_DISABLE_NATIVE switch the parity
    # tests flip, plus clearing the module's cached handle.
    if npp._load() is not None:
        dt = _bench(npp, imgs, masks, args.out)
        rows["native"] = {
            "per_image_ms": round(dt * 1e3, 4),
            "img_per_s_per_core": round(1.0 / dt, 1),
            "cores_for_chip": round(args.chip_rate * dt, 2),
        }
    else:
        rows["native"] = None
    npp._lib, os.environ["ILPS_DISABLE_NATIVE"] = None, "1"
    try:
        dt = _bench(npp, imgs, masks, args.out)
        rows["numpy_fallback"] = {
            "per_image_ms": round(dt * 1e3, 4),
            "img_per_s_per_core": round(1.0 / dt, 1),
            "cores_for_chip": round(args.chip_rate * dt, 2),
        }
    finally:
        del os.environ["ILPS_DISABLE_NATIVE"]
        npp._lib = None

    print(
        json.dumps(
            {
                "source": args.source,
                "out": args.out,
                "chip_rate_img_s": args.chip_rate,
                **rows,
            }
        )
    )


if __name__ == "__main__":
    main()
