"""Disk-backed dataset + double-buffered device prefetch (SURVEY.md §2.8).

The reference trains from a Python generator over files on disk; the rebuild
keeps a host-side loader (the disk half is inherently host work) but makes
the device never wait: a background thread stages the next batches into HBM
(`prefetch_to_device`, double-buffered per BASELINE.json:5) while the
current step runs, and all per-pixel preprocessing happens on-device
(data/preprocess.py) inside the jitted step.

On-disk format: one `.npz` with
    images  [N, H, W, 3] uint8
    masks   [N, H, W]    uint8/int  (0 = bg; >0 = body-part label)
    kp2d    [N, K, 2]    float32    (x, y) in source pixels
    kp_vis  [N, K]       float32
`make_synthetic_dataset` materializes such a file from our own renderer so
the full real-data path is testable without any external download
(SURVEY.md §4.3).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator, Optional

import jax
import numpy as np


class NpzDataset:
    """In-memory npz-backed dataset with deterministic shuffled batches."""

    def __init__(self, path_or_arrays, batch_size: int, seed: int = 0):
        if isinstance(path_or_arrays, (str, bytes)):
            with np.load(path_or_arrays) as z:
                self.arrays = {k: z[k] for k in z.files}
        else:
            self.arrays = dict(path_or_arrays)
        self.batch_size = batch_size
        self.seed = seed
        self.num_examples = len(self.arrays["images"])
        if self.num_examples < batch_size:
            raise ValueError("dataset smaller than one batch")
        # Part-label ids must fit the 256-entry flip/clip tables downstream
        # (data/augment.py): a wider id would be clamped by JAX's gather
        # semantics on device — wrong labels with no signal — so refuse on
        # the host, once, where it is loud.
        if "masks" in self.arrays:
            max_label = int(self.arrays["masks"].max()) if self.num_examples else 0
            if max_label >= 256:
                raise ValueError(
                    f"mask labels reach {max_label}; part-label ids must be "
                    "< 256 (uint8 label space). Remap the dataset's masks."
                )

    def _epoch_order(self, epoch_idx: int) -> np.ndarray:
        rng = np.random.RandomState((self.seed * 100003 + epoch_idx) % (2**31))
        return rng.permutation(self.num_examples)

    def epoch(self, epoch_idx: int) -> Iterator[dict]:
        """Deterministic per-epoch shuffle; drops the ragged tail batch."""
        order = self._epoch_order(epoch_idx)
        for start in range(0, self.num_examples - self.batch_size + 1, self.batch_size):
            idx = order[start : start + self.batch_size]
            yield {k: v[idx] for k, v in self.arrays.items()}

    def steps_per_epoch(self) -> int:
        return self.num_examples // self.batch_size

    def batches(self, start_step: int = 0) -> Iterator[dict]:
        """Endless batch stream, resumable at an arbitrary global step.

        Resume skips by index arithmetic — skipped batches are never
        materialized (only the epoch permutation is recomputed).
        """
        spe = self.steps_per_epoch()
        step = start_step
        while True:
            epoch_idx, offset = divmod(step, spe)
            order = self._epoch_order(epoch_idx)
            for i in range(offset, spe):
                idx = order[i * self.batch_size : (i + 1) * self.batch_size]
                yield {k: v[idx] for k, v in self.arrays.items()}
                step += 1


def prefetch_to_device(
    iterator: Iterator[dict],
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator[dict]:
    """Background-thread device staging with `size` in-flight batches.

    Overlaps host loading + H2D transfer with device compute (the
    double-buffered HBM prefetch of BASELINE.json:5). With a sharding, the
    batch lands already sharded over the mesh. Loader exceptions propagate
    to the consumer; closing the generator (or dropping it) unblocks and
    ends the worker so no device buffers stay pinned behind a dead stream.
    """
    # Token semaphore bounds in-flight batches WITHOUT hot-path polling: in
    # steady state (producer ahead of consumer) acquire() returns the moment
    # the consumer releases — a bounded queue's timeout-put would add its
    # polling interval to every batch. The timeout only bites at shutdown.
    q: queue.Queue = queue.Queue()
    tokens = threading.Semaphore(size)
    end = object()
    stop = threading.Event()

    def put_on_device(batch):
        if sharding is not None:
            return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
        return jax.tree.map(jax.device_put, batch)

    def worker():
        try:
            for batch in iterator:
                while not tokens.acquire(timeout=0.2):
                    if stop.is_set():
                        return
                if stop.is_set():
                    return
                q.put(put_on_device(batch))
            q.put(end)
        except BaseException as exc:  # propagate loader errors to consumer
            q.put(exc)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is end:
                return
            if isinstance(item, BaseException):
                raise item
            tokens.release()  # free the slot as soon as the batch is handed off
            yield item
    finally:
        stop.set()
        while not q.empty():  # release any device-resident in-flight batches
            q.get_nowait()


def make_synthetic_dataset(
    path: Optional[str],
    num_examples: int,
    source_size: int = 320,
    seed: int = 0,
    asset=None,
) -> dict:
    """Render a small on-disk dataset with our own SMPL + rasterizer.

    Returns the arrays (and writes `path` if given). Self-supervised fixture:
    no external data needed, ground truth known exactly (SURVEY.md §4.3).
    """
    from indirect_learning_pose_shape_tpu.data import synthetic
    from indirect_learning_pose_shape_tpu.models import network as net
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    if asset is None:
        asset = assets_lib.load_asset()
    model_cfg = net.ModelConfig(image_size=source_size)
    import dataclasses

    model_cfg = dataclasses.replace(
        model_cfg,
        raster=dataclasses.replace(model_cfg.raster, image_size=source_size),
        smpl_impl="xla" if jax.default_backend() != "tpu" else "auto",
        raster_impl="auto",
    )
    consts = net.build_consts(asset, model_cfg)
    # Render in bounded chunks: one giant batch OOMs HBM for large datasets
    # (the raster works per-pixel-chunk but batch still multiplies memory).
    chunk = min(num_examples, 64)
    gen = jax.jit(lambda k: synthetic.generate_batch(k, chunk, consts, model_cfg))
    parts: list = []
    key = jax.random.PRNGKey(seed)
    remaining = num_examples
    while remaining > 0:
        key, sub = jax.random.split(key)
        batch = gen(sub)
        take = min(chunk, remaining)
        parts.append(jax.tree.map(lambda x: np.asarray(x[:take]), batch))
        remaining -= take
    batch = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}

    images = np.asarray((batch["image"] + 1.0) * 127.5, dtype=np.uint8)
    arrays = {
        "images": images,
        "masks": np.asarray(batch["part_labels"], dtype=np.uint8),
        "kp2d": np.asarray(batch["kp2d"], dtype=np.float32),
        "kp_vis": np.asarray(batch["kp_vis"], dtype=np.float32),
        "gt_pose": np.asarray(batch["gt_pose"], dtype=np.float32),
        "gt_betas": np.asarray(batch["gt_betas"], dtype=np.float32),
    }
    if path:
        np.savez_compressed(path, **arrays)
    return arrays
