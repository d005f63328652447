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

# Part-mask conventions the mirror augmentation knows how to flip.
# Each entry: (required num_parts predicate, L/R pairs IN MASK-ID SPACE).
#
# - 'smpl24': the repo's native rendered label space — mask id k+1 = SMPL
#   joint k (see _SMPL_LR above; pairs shifted +1 here). Valid for any
#   num_parts <= 24; pairs with either side out of range are dropped whole.
# - 's31-smpl-prefix': the repo's 31-part synthetic stand-in layout
#   (configs.py CONFIG4_PARTS31): ids 1-24 are the SMPL parts, ids 25-31 are
#   reserved/unoccupied by the synthetic asset and treated as midline. NOTE:
#   this is NOT a verified Unite-the-People UP-S31 palette — the reference
#   snapshot is unavailable (SURVEY.md §0) so the real dataset's id ordering
#   cannot be confirmed; a real UP-S31 dataset must declare its pairing
#   explicitly via AugmentConfig.part_lr_pairs ('custom').
# - 'custom': pairs supplied by AugmentConfig.part_lr_pairs (mask-id space).
# - 'none': labels have no left/right structure; masks flip spatially with
#   ids unchanged (explicit opt-out, not a silent default).
_SMPL24_MASK_PAIRS = tuple((l + 1, r + 1) for l, r in _SMPL_LR)
_PART_CONVENTIONS = {
    "smpl24": _SMPL24_MASK_PAIRS,
    "s31-smpl-prefix": _SMPL24_MASK_PAIRS,  # ids 25-31 midline by definition
    "custom": None,  # resolved from AugmentConfig.part_lr_pairs
    "none": (),
}


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    enabled: bool = False
    flip_prob: float = 0.5
    # Crop-box jitter: size *= U(1-s, 1+s), centre += U(-t, t) * size.
    scale_jitter: float = 0.1
    trans_jitter: float = 0.05
    # Part-mask left/right convention for the mirror flip (keys of
    # _PART_CONVENTIONS). Unknown conventions and convention/num_parts
    # mismatches are refused loudly — the label analogue of kp_flip_perm's
    # contract, so mirrored supervision is never silently corrupted.
    part_convention: str = "smpl24"
    # Explicit L/R mask-id pairs for part_convention='custom' (real datasets
    # whose palette none of the named conventions describes).
    part_lr_pairs: tuple = ()


def part_label_flip_perm(
    num_parts: int, convention: str = "smpl24", custom_pairs: tuple = ()
) -> np.ndarray:
    """Label-space permutation swapping left/right part ids (0 = bg fixed).

    Refuses unknown conventions and convention/num_parts mismatches instead
    of guessing — mirroring a mask without the correct identity swap points
    every 'left' part label at the person's right side, which corrupts the
    part-CE loss silently (the exact failure kp_flip_perm guards against for
    keypoints).
    """
    if convention not in _PART_CONVENTIONS:
        raise ValueError(
            f"unknown part-mask convention {convention!r}; known: "
            f"{sorted(_PART_CONVENTIONS)}. Declare the dataset's left/right "
            "id pairing (part_convention='custom' + part_lr_pairs) or "
            "disable flips (flip_prob=0)."
        )
    if convention == "smpl24" and num_parts > 24:
        raise ValueError(
            f"part_convention='smpl24' covers mask ids 1-24 but the run is "
            f"configured for {num_parts} parts: ids 25-{num_parts} have no "
            "declared left/right pairing and would flip sides with their "
            "labels unswapped. Use 's31-smpl-prefix' for the repo's 31-part "
            "synthetic layout, or 'custom' with explicit part_lr_pairs."
        )
    if convention == "s31-smpl-prefix" and num_parts != 31:
        raise ValueError(
            f"part_convention='s31-smpl-prefix' describes a 31-part label "
            f"space; the run is configured for {num_parts} parts."
        )
    pairs = custom_pairs if convention == "custom" else _PART_CONVENTIONS[convention]
    perm = np.arange(256, dtype=np.int32)
    for l, r in pairs:
        if convention == "custom" and not (
            0 < l <= num_parts and 0 < r <= num_parts
        ):
            raise ValueError(
                f"part_lr_pairs entry ({l}, {r}) outside mask-id range "
                f"1..{num_parts} (0 is background and cannot be paired)"
            )
        if l <= num_parts and r <= num_parts:
            perm[l], perm[r] = r, l
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


def mirror_raw_batch(
    raw: dict, key: jax.Array, cfg: AugmentConfig, num_parts: int = 24
) -> dict:
    """Per-sample random horizontal mirror of a raw disk batch.

    raw: images [B,H,W,3] (any numeric dtype), masks [B,H,W] int,
    kp2d [B,K,2] source pixels, kp_vis [B,K]. `num_parts` is the run's
    part-label space (cfg.part_convention must describe it — validated
    loudly in part_label_flip_perm at trace time).
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

    label_perm = jnp.asarray(
        part_label_flip_perm(num_parts, cfg.part_convention, cfg.part_lr_pairs)
    )
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
