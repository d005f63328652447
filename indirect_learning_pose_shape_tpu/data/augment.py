"""On-device training-data augmentation (SURVEY.md §2.8 genre feature).

Repos of the reference's genre (HMR-style indirect learning) train with
mirror + crop-jitter augmentation; the rebuild runs both INSIDE the jitted
train step on raw disk batches, before the on-device crop/resize — zero
host work, fully deterministic from the step-indexed RNG key.

- Horizontal mirror: flips image + label mask, remaps x-coordinates of the
  2D keypoints, and swaps left/right identities in BOTH label spaces — the
  19 cocoplus keypoints and the 24 SMPL-joint body-part labels (a mirrored
  left hand is a right hand, for the part-CE loss as much as for the
  keypoint loss).
- Crop jitter: the mask-derived square crop box gets a random scale and
  centre offset, so the model never sees a perfectly-centred person.

Everything is branch-free (jnp.where on a per-sample Bernoulli), so one
compiled graph serves all flip outcomes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# cocoplus-19 keypoint order (HMR lineage; utils/oracle.py documents the
# regressor): 0 R ankle, 1 R knee, 2 R hip, 3 L hip, 4 L knee, 5 L ankle,
# 6 R wrist, 7 R elbow, 8 R shoulder, 9 L shoulder, 10 L elbow, 11 L wrist,
# 12 neck, 13 head top, 14 nose, 15 L eye, 16 R eye, 17 L ear, 18 R ear.
_KP_SWAP = (5, 4, 3, 2, 1, 0, 11, 10, 9, 8, 7, 6, 12, 13, 14, 16, 15, 18, 17)

# COCO-17 order: 0 nose, 1 L eye, 2 R eye, 3 L ear, 4 R ear, 5 L shoulder,
# 6 R shoulder, 7 L elbow, 8 R elbow, 9 L wrist, 10 R wrist, 11 L hip,
# 12 R hip, 13 L knee, 14 R knee, 15 L ankle, 16 R ankle.
_KP_SWAP_COCO17 = (0, 2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11, 14, 13, 16, 15)

# Known keypoint conventions by count. LSP-14 is exactly the first 14
# cocoplus entries (same body-joint order, no face points), so its swap
# table is the cocoplus prefix — which is closed under the prefix (all
# swapped indices stay < 14).
_KP_SWAPS = {
    19: _KP_SWAP,
    17: _KP_SWAP_COCO17,
    14: _KP_SWAP[:14],
}

# SMPL 24-joint part labels in the rendered/part-mask space: mask value
# k+1 = SMPL joint k (0 is background). Left/right joint pairs of the SMPL
# kinematic tree: (1,2) hips, (4,5) knees, (7,8) ankles, (10,11) feet,
# (13,14) collars, (16,17) shoulders, (18,19) elbows, (20,21) wrists,
# (22,23) hands; 0,3,6,9,12,15 are midline.
_SMPL_LR = ((1, 2), (4, 5), (7, 8), (10, 11), (13, 14), (16, 17), (18, 19), (20, 21), (22, 23))


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    enabled: bool = False
    flip_prob: float = 0.5
    # Crop-box jitter: size *= U(1-s, 1+s), centre += U(-t, t) * size.
    scale_jitter: float = 0.1
    trans_jitter: float = 0.05


def part_label_flip_perm(num_parts: int) -> np.ndarray:
    """Label-space permutation swapping left/right part ids (0 = bg fixed).

    Mask values are 1 + SMPL joint id; ids >= num_parts (when a dataset
    carries more granular labels than configured) map through unchanged.
    """
    perm = np.arange(256, dtype=np.int32)
    for l, r in _SMPL_LR:
        if l + 1 < min(num_parts + 1, 256) and r + 1 < min(num_parts + 1, 256):
            perm[l + 1], perm[r + 1] = r + 1, l + 1
    return perm


def kp_flip_perm(num_kp: int) -> np.ndarray:
    """Left/right identity permutation for cocoplus-19, COCO-17, or LSP-14.

    Mirroring without swapping identities would point every 'left' keypoint
    target at the person's right side — silently corrupted supervision —
    so an unknown keypoint count is refused loudly instead of guessed.
    """
    if num_kp not in _KP_SWAPS:
        raise ValueError(
            f"mirror augmentation knows the left/right pairings for "
            f"{sorted(_KP_SWAPS)} keypoints (cocoplus-19 / COCO-17 / "
            f"LSP-14); got {num_kp}. Extend _KP_SWAPS for this keypoint "
            "set or disable flips (flip_prob=0)."
        )
    return np.asarray(_KP_SWAPS[num_kp], dtype=np.int32)


def mirror_raw_batch(raw: dict, key: jax.Array, cfg: AugmentConfig) -> dict:
    """Per-sample random horizontal mirror of a raw disk batch.

    raw: images [B,H,W,3] (any numeric dtype), masks [B,H,W] int,
    kp2d [B,K,2] source pixels, kp_vis [B,K].
    """
    if cfg.flip_prob == 0.0:  # flips disabled: no identity table needed
        return raw
    B = raw["images"].shape[0]
    W = raw["images"].shape[2]
    flip = jax.random.bernoulli(key, cfg.flip_prob, (B,))

    f4 = flip[:, None, None, None]
    f3 = flip[:, None, None]
    f2 = flip[:, None]

    images = jnp.where(f4, raw["images"][:, :, ::-1], raw["images"])

    label_perm = jnp.asarray(part_label_flip_perm(256))
    masks_m = label_perm[raw["masks"].astype(jnp.int32)[:, :, ::-1]]
    masks = jnp.where(f3, masks_m, raw["masks"].astype(jnp.int32))

    kperm = jnp.asarray(kp_flip_perm(raw["kp2d"].shape[1]))
    kp_m = raw["kp2d"][:, kperm]
    kp_m = kp_m.at[..., 0].set(W - 1.0 - kp_m[..., 0])
    kp2d = jnp.where(f3, kp_m, raw["kp2d"])
    kp_vis = jnp.where(f2, raw["kp_vis"][:, kperm], raw["kp_vis"])

    return dict(raw, images=images, masks=masks, kp2d=kp2d, kp_vis=kp_vis)


def jitter_bboxes(bboxes: jax.Array, key: jax.Array, cfg: AugmentConfig) -> jax.Array:
    """(cy, cx, size) boxes [B, 3] -> randomly scaled/shifted boxes."""
    B = bboxes.shape[0]
    ks, kt = jax.random.split(key)
    scale = jax.random.uniform(
        ks, (B, 1), minval=1.0 - cfg.scale_jitter, maxval=1.0 + cfg.scale_jitter
    )
    shift = jax.random.uniform(kt, (B, 2), minval=-cfg.trans_jitter, maxval=cfg.trans_jitter)
    size = bboxes[:, 2:3] * scale
    centre = bboxes[:, :2] + shift * bboxes[:, 2:3]
    return jnp.concatenate([centre, size], axis=1)
