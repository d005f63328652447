"""Image-directory dataset: the real-world on-disk layout (SURVEY.md §2.8).

Layout (UP-3D-style file-per-sample, the reference's data genre):

    root/
      images/<name>.(png|jpg)     RGB, any size per image
      masks/<name>.png            uint8 label mask (0 = bg, >0 = part id)
      keypoints.npz               kp2d [N, K, 2] float32 (source pixels),
                                  kp_vis [N, K], names [N] (matching stems)

Source images are variably sized, so batching requires the ragged→fixed
host step: the native C++ preprocessor (data/native_preprocess.py) derives
a square crop from each mask and emits fixed-size normalized images, masks,
and transformed keypoints. Batches come out ready for `train.train_step`
(already model-resolution); `prefetch_to_device` overlaps the host work with
device compute. The keypoint affine matches data/preprocess.py exactly.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np


def _imread_rgb(path: str) -> np.ndarray:
    """Images always come back [H, W, 3] uint8 (grayscale gets broadcast)."""
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB"))


def _imread_mask(path: str) -> np.ndarray:
    """Label masks come back [H, W] uint8 with ids preserved.

    Crucially, paletted PNGs (PIL mode 'P', the common label format) must
    NOT be converted to RGB/L — np.asarray on the raw image yields the
    palette indices, which ARE the part ids.
    """
    from PIL import Image

    with Image.open(path) as im:
        arr = np.asarray(im)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.uint8)


def _transform_kp(kp2d: np.ndarray, bbox: np.ndarray, out_size: int) -> np.ndarray:
    """Numpy mirror of data/preprocess.transform_keypoints (same affine)."""
    cy, cx, size = bbox
    scale = out_size / size
    x = (kp2d[..., 0] + 0.5 - (cx - size / 2.0)) * scale - 0.5
    y = (kp2d[..., 1] + 0.5 - (cy - size / 2.0)) * scale - 0.5
    return np.stack([x, y], axis=-1).astype(np.float32)


class ImageDirDataset:
    """File-per-sample dataset with host-side (native) preprocessing.

    `augment` (an AugmentConfig with enabled=True) turns on host-side
    mirror + crop-jitter augmentation — the disk-path counterpart of the
    on-device data/augment.py used by the npz path. Host-side because the
    ragged→fixed native preprocess happens here: the mirror must act on the
    source-resolution image/mask/keypoints BEFORE the crop is derived, and
    the jitter perturbs that crop box. Deterministic per global step
    (resume replays the same flips/jitters) and convention-checked the same
    way: part_label_flip_perm / kp_flip_perm refuse unknown label spaces.
    """

    def __init__(
        self,
        root: str,
        batch_size: int,
        image_size: int,
        num_parts: int = 24,
        seed: int = 0,
        augment=None,
    ):
        self.root = root
        self.batch_size = batch_size
        self.image_size = image_size
        self.num_parts = num_parts
        self.seed = seed
        self.augment = augment if (augment is not None and augment.enabled) else None

        img_dir = os.path.join(root, "images")
        self.names = sorted(
            os.path.splitext(f)[0]
            for f in os.listdir(img_dir)
            if f.lower().endswith((".png", ".jpg", ".jpeg"))
        )
        self.image_paths = {
            os.path.splitext(f)[0]: os.path.join(img_dir, f)
            for f in os.listdir(img_dir)
        }
        kp = np.load(os.path.join(root, "keypoints.npz"), allow_pickle=True)
        kp_names = [str(n) for n in kp["names"]]
        self.kp2d = {n: kp["kp2d"][i] for i, n in enumerate(kp_names)}
        self.kp_vis = {n: kp["kp_vis"][i] for i, n in enumerate(kp_names)}
        self.num_examples = len(self.names)
        if self.num_examples < batch_size:
            raise ValueError("dataset smaller than one batch")

    def steps_per_epoch(self) -> int:
        return self.num_examples // self.batch_size

    def _load_sample(self, name: str):
        image = _imread_rgb(self.image_paths[name])
        mask = _imread_mask(os.path.join(self.root, "masks", name + ".png"))
        return image, mask

    def _make_batch(self, names: list, rng=None) -> dict:
        from indirect_learning_pose_shape_tpu.data import native_preprocess as npp

        aug = self.augment if rng is not None else None
        if aug is not None:
            from indirect_learning_pose_shape_tpu.data import augment as aug_mod

            label_perm = aug_mod.part_label_flip_perm(
                self.num_parts, aug.part_convention, aug.part_lr_pairs
            )

        images, masks, kps, viss = [], [], [], []
        for n in names:
            im, mk = self._load_sample(n)
            kp, vis = self.kp2d[n], self.kp_vis[n]
            if aug is not None and rng.rand() < aug.flip_prob:
                W = im.shape[1]
                kperm = aug_mod.kp_flip_perm(kp.shape[0])
                im = im[:, ::-1]
                mk = label_perm[mk[:, ::-1].astype(np.int32)].astype(mk.dtype)
                kp = kp[kperm].copy()
                kp[..., 0] = W - 1.0 - kp[..., 0]
                vis = vis[kperm]
            images.append(im)
            masks.append(mk)
            kps.append(kp)
            viss.append(vis)
        bboxes = np.stack([npp.bbox_from_mask(m) for m in masks])
        if aug is not None:
            # Same jitter law as data/augment.jitter_bboxes, on the host.
            scale = rng.uniform(
                1.0 - aug.scale_jitter, 1.0 + aug.scale_jitter, (len(names), 1)
            )
            shift = rng.uniform(
                -aug.trans_jitter, aug.trans_jitter, (len(names), 2)
            )
            size = bboxes[:, 2:3] * scale
            centre = bboxes[:, :2] + shift * bboxes[:, 2:3]
            bboxes = np.concatenate([centre, size], axis=1).astype(bboxes.dtype)
        out_imgs = npp.crop_resize_normalize(images, bboxes, self.image_size)
        out_masks = npp.crop_resize_mask(masks, bboxes, self.image_size)
        labels = np.minimum(out_masks.astype(np.int32), self.num_parts)
        kp2d = np.stack(
            [_transform_kp(k, b, self.image_size) for k, b in zip(kps, bboxes)]
        )
        return {
            "image": out_imgs,
            "silhouette": (out_masks > 0).astype(np.float32),
            "part_labels": labels,
            "kp2d": kp2d,
            "kp_vis": np.stack(viss).astype(np.float32),
        }

    def batches(self, start_step: int = 0) -> Iterator[dict]:
        """Endless preprocessed batch stream (deterministic, resumable)."""
        spe = self.steps_per_epoch()
        step = start_step
        while True:
            epoch_idx, offset = divmod(step, spe)
            rng = np.random.RandomState((self.seed * 99991 + epoch_idx) % (2**31))
            order = rng.permutation(self.num_examples)
            for i in range(offset, spe):
                idx = order[i * self.batch_size : (i + 1) * self.batch_size]
                # Step-keyed RNG (not the epoch stream): a resumed run replays
                # the exact flips/jitters the crashed run would have drawn.
                aug_rng = (
                    np.random.RandomState((self.seed * 7919 + step * 31 + 7) % (2**31))
                    if self.augment is not None
                    else None
                )
                yield self._make_batch([self.names[j] for j in idx], rng=aug_rng)
                step += 1


def export_image_dir(arrays: dict, root: str) -> None:
    """Materialize an NpzDataset-style dict as an image directory (test/demo)."""
    from PIL import Image

    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "masks"), exist_ok=True)
    names = []
    for i in range(len(arrays["images"])):
        name = f"sample_{i:05d}"
        names.append(name)
        Image.fromarray(arrays["images"][i]).save(
            os.path.join(root, "images", name + ".png")
        )
        Image.fromarray(arrays["masks"][i]).save(
            os.path.join(root, "masks", name + ".png")
        )
    np.savez(
        os.path.join(root, "keypoints.npz"),
        kp2d=arrays["kp2d"],
        kp_vis=arrays["kp_vis"],
        names=np.array(names),
    )
