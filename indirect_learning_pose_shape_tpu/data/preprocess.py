"""On-device image preprocessing (SURVEY.md §2.8, BASELINE.json:11).

The reference preprocesses on the host (crop/resize/normalize in numpy/cv2
inside a Python generator). The rebuild moves the per-sample affine
(crop + resize) onto the device as part of the jitted step:
`jax.image.scale_and_translate` expresses an arbitrary axis-aligned crop →
resize as one fused XLA op with static output shape, vmapped over the batch,
so augmentation-style random crops cost no host round-trip. Keypoints ride
through the same affine; masks use nearest-neighbor.

Convention: bbox = (cy, cx, size) in CONTINUOUS source coordinates (pixel i
spans [i, i+1)) — a square crop centred at (cy, cx) with side `size`, mapped
to [out_size, out_size]. Identical sampling formula to the native host path
(native/preprocess.cc): source_index(o) = (c − size/2) + (o + 0.5)·step − 0.5.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _affine_params(bbox, out_size: int):
    """Returns (scale [2], translation [2]) for scale_and_translate."""
    cy, cx, size = bbox[0], bbox[1], bbox[2]
    scale = out_size / size
    # Source point s maps to s*scale + t; we want (c - size/2) -> 0.
    ty = -(cy - size / 2.0) * scale
    tx = -(cx - size / 2.0) * scale
    return jnp.stack([scale, scale]), jnp.stack([ty, tx])


@functools.partial(jax.jit, static_argnames=("out_size", "method"))
def crop_resize(
    images: jax.Array, bboxes: jax.Array, out_size: int, method: str = "linear"
) -> jax.Array:
    """Batched square crop + resize.

    images [B, H, W, C] (any float/int dtype; computed in float32),
    bboxes [B, 3] = (cy, cx, size) per image -> [B, out_size, out_size, C].
    """

    def one(img, bbox):
        scale, trans = _affine_params(bbox, out_size)
        # antialias=False: plain point-sampled bilinear, bit-comparable to the
        # native/numpy host paths (antialias widens the kernel on downscale,
        # which the host paths do not do).
        return jax.image.scale_and_translate(
            img.astype(jnp.float32),
            (out_size, out_size, img.shape[-1]),
            (0, 1),
            scale,
            trans,
            method=method,
            antialias=False,
        )

    return jax.vmap(one)(images, bboxes)


def crop_resize_mask(masks: jax.Array, bboxes: jax.Array, out_size: int) -> jax.Array:
    """Nearest-neighbor crop+resize for integer masks [B, H, W] -> [B, S, S].

    scale_and_translate has no nearest mode, so this is a direct double
    gather with the same sampling formula (label values must not blend).
    """
    H, W = masks.shape[1], masks.shape[2]

    def one(mask, bbox):
        cy, cx, size = bbox[0], bbox[1], bbox[2]
        step = size / out_size
        o = jnp.arange(out_size, dtype=jnp.float32) + 0.5
        # Half-up rounding (floor(x+0.5)): same tie-break as the native and
        # numpy host paths (jnp.round is half-to-even and would disagree).
        ysf = jnp.floor(cy - size / 2.0 + o * step).astype(jnp.int32)
        xsf = jnp.floor(cx - size / 2.0 + o * step).astype(jnp.int32)
        ys = jnp.clip(ysf, 0, H - 1)
        xs = jnp.clip(xsf, 0, W - 1)
        out = mask[ys[:, None], xs[None, :]]
        # Outside the source image is background — matches the image path
        # (scale_and_translate zero-fills) and the native host path.
        inside = ((ysf >= 0) & (ysf < H))[:, None] & ((xsf >= 0) & (xsf < W))[None, :]
        return jnp.where(inside, out, jnp.zeros_like(out))

    return jax.vmap(one)(masks, bboxes)


def transform_keypoints(kp2d: jax.Array, bboxes: jax.Array, out_size: int) -> jax.Array:
    """Map (x, y) index-coordinate keypoints [B, K, 2] through the crop affine.

    Exact inverse of the sampling formula: a keypoint on source pixel index x
    lands on output index ((x + 0.5) − (c − size/2))·scale − 0.5.
    """
    cy, cx, size = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    scale = out_size / size
    x = (kp2d[..., 0] + 0.5 - (cx - size / 2.0)) * scale - 0.5
    y = (kp2d[..., 1] + 0.5 - (cy - size / 2.0)) * scale - 0.5
    return jnp.stack([x, y], axis=-1)


def normalize(images: jax.Array) -> jax.Array:
    """uint8/float [0, 255] -> float32 in [-1, 1]."""
    return images.astype(jnp.float32) / 127.5 - 1.0


def bbox_from_mask(mask: jax.Array, pad: float = 1.15) -> jax.Array:
    """Square bbox (cy, cx, size) around the nonzero region of [H, W] mask.

    Differentiability is irrelevant (host-side targets); implemented with
    masked min/max so it jits with static shapes.
    """
    H, W = mask.shape
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    m = mask > 0
    big = jnp.float32(1e9)
    y0 = jnp.min(jnp.where(m, ys, big))
    y1 = jnp.max(jnp.where(m, ys, -big))
    x0 = jnp.min(jnp.where(m, xs, big))
    x1 = jnp.max(jnp.where(m, xs, -big))
    empty = ~jnp.any(m)
    # Continuous-coordinate centre/extent (pixel i spans [i, i+1)).
    cy = jnp.where(empty, H / 2.0, (y0 + y1 + 1.0) / 2.0)
    cx = jnp.where(empty, W / 2.0, (x0 + x1 + 1.0) / 2.0)
    size = jnp.where(
        empty,
        jnp.float32(max(H, W)),
        jnp.maximum(y1 - y0 + 1.0, x1 - x0 + 1.0) * pad,
    )
    return jnp.stack([cy, cx, jnp.maximum(size, 8.0)])
