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

Datasets too large for host RAM use the same format split across many
shard files (`ShardedNpzDataset` + `shard_npz`): at most one shard is
resident at a time, the stream stays deterministic and resumable by index
arithmetic, and the prefetch thread hides shard loads behind device compute.
"""

from __future__ import annotations

import glob as _glob
import os
import queue
import threading
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _check_mask_labels(arrays: dict, origin: str) -> None:
    """Part-label ids must fit the 256-entry flip/clip tables downstream
    (data/augment.py): a wider id would be clamped by JAX's gather semantics
    on device — wrong labels with no signal — so refuse on the host, loudly."""
    if "masks" in arrays and arrays["masks"].size:
        max_label = int(arrays["masks"].max())
        if max_label >= 256:
            raise ValueError(
                f"{origin}: mask labels reach {max_label}; part-label ids "
                "must be < 256 (uint8 label space). Remap the dataset's masks."
            )


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
        self.keys = frozenset(self.arrays)
        if self.num_examples < batch_size:
            raise ValueError("dataset smaller than one batch")
        _check_mask_labels(self.arrays, "dataset")

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


class ShardedNpzDataset:
    """Disk-resident dataset over many `.npz` shards (same keys per shard).

    Scales the NpzDataset contract past host RAM: at most ONE shard's
    arrays are resident at a time. Shuffle design is two-level so lazy
    loading stays possible — each epoch permutes the shard order AND the
    example order within every shard (all seeded from (seed, epoch, shard),
    independent of iteration order), and batches are drawn within one shard
    at a time. Ragged per-shard tails are dropped (NpzDataset's drop-tail
    contract applied per shard). Resume (`batches(start_step=...)`) is pure
    index arithmetic: shards before the resume point are never read.

    Accepts a directory (all `*.npz` inside, sorted), a glob pattern, or an
    explicit path list. Writer side: `shard_npz` splits a monolithic file.
    """

    def __init__(self, paths_or_pattern, batch_size: int, seed: int = 0):
        if isinstance(paths_or_pattern, (list, tuple)):
            paths = [str(p) for p in paths_or_pattern]
        else:
            p = str(paths_or_pattern)
            if os.path.isdir(p):
                paths = sorted(_glob.glob(os.path.join(p, "*.npz")))
            else:
                paths = sorted(_glob.glob(p))
        if not paths:
            raise FileNotFoundError(
                f"no .npz shards match {paths_or_pattern!r}"
            )
        self.paths = paths
        self.batch_size = batch_size
        self.seed = seed
        # Init reads only each shard's smallest array (kp_vis [N, K]) for the
        # example count + the key inventory — no image data touches RAM.
        self._counts: list[int] = []
        keys: Optional[frozenset] = None
        for path in paths:
            with np.load(path) as z:
                files = frozenset(z.files)
                count_key = "kp_vis" if "kp_vis" in files else sorted(files)[0]
                n = int(z[count_key].shape[0])
            if keys is None:
                keys = files
            elif files != keys:
                raise ValueError(
                    f"shard {path!r} keys {sorted(files)} differ from the "
                    f"first shard's {sorted(keys)}"
                )
            self._counts.append(n)
        self.keys = keys
        self._spe = [n // batch_size for n in self._counts]
        if sum(self._spe) == 0:
            raise ValueError(
                f"every shard is smaller than one batch ({batch_size}); "
                "use larger shards or a smaller batch"
            )
        self.num_examples = sum(self._counts)
        self._cache: tuple[Optional[str], Optional[dict]] = (None, None)

    def _load(self, shard_idx: int) -> dict:
        path = self.paths[shard_idx]
        if self._cache[0] != path:
            with np.load(path) as z:
                arrays = {k: z[k] for k in z.files}
            n = len(arrays[min(arrays, key=lambda k: arrays[k].ndim)])
            if n != self._counts[shard_idx]:
                raise ValueError(f"shard {path!r} changed size on disk")
            _check_mask_labels(arrays, f"shard {path!r}")
            self._cache = (path, arrays)
        return self._cache[1]

    def _perm(self, epoch_idx: int, shard_idx: int) -> np.ndarray:
        """Within-shard example permutation; a pure function of
        (seed, epoch, shard) so resume never depends on replay."""
        s = (self.seed * 100003 + epoch_idx * 131071 + shard_idx * 7919 + 1) % (
            2**31
        )
        return np.random.RandomState(s).permutation(self._counts[shard_idx])

    def _shard_order(self, epoch_idx: int) -> np.ndarray:
        s = (self.seed * 100003 + epoch_idx) % (2**31)
        return np.random.RandomState(s).permutation(len(self.paths))

    def steps_per_epoch(self) -> int:
        return sum(self._spe)

    def batches(self, start_step: int = 0) -> Iterator[dict]:
        """Endless deterministic batch stream, resumable at any global step."""
        spe = self.steps_per_epoch()
        step = start_step
        while True:
            epoch_idx, offset = divmod(step, spe)
            for si in self._shard_order(epoch_idx):
                k = self._spe[si]
                if offset >= k:  # whole shard before the resume point: skip unread
                    offset -= k
                    continue
                perm = self._perm(epoch_idx, int(si))
                arrays = self._load(int(si))
                for i in range(offset, k):
                    idx = perm[i * self.batch_size : (i + 1) * self.batch_size]
                    yield {key: v[idx] for key, v in arrays.items()}
                    step += 1
                offset = 0

    def epoch(self, epoch_idx: int) -> Iterator[dict]:
        """Exactly one epoch's batches (the eval-loop entry point)."""
        gen = self.batches(start_step=epoch_idx * self.steps_per_epoch())
        for _ in range(self.steps_per_epoch()):
            yield next(gen)


def shard_npz(src: str, out_dir: str, shard_size: int) -> list[str]:
    """Split a monolithic dataset .npz into ShardedNpzDataset shards.

    Streams one shard's slice at a time (np.load is lazy per key), so the
    peak memory is one shard, not the whole source. Returns shard paths.
    """
    if shard_size <= 0:
        raise ValueError("shard_size must be positive")
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    with np.load(src) as z:
        keys = list(z.files)
        n = z[keys[0]].shape[0]
        for k in keys:
            if z[k].shape[0] != n:
                raise ValueError(
                    f"key {k!r} has {z[k].shape[0]} examples, expected {n}"
                )
        for shard_idx, start in enumerate(range(0, n, shard_size)):
            stop = min(start + shard_size, n)
            path = os.path.join(out_dir, f"shard_{shard_idx:05d}.npz")
            np.savez(path, **{k: z[k][start:stop] for k in keys})
            paths.append(path)
    return paths


def open_dataset(path: str, batch_size: int, seed: int = 0):
    """NpzDataset for a single .npz file; ShardedNpzDataset for a directory
    or glob pattern of shards (the train/evaluate --dataset dispatch)."""
    if os.path.isdir(path) or any(c in path for c in "*?["):
        return ShardedNpzDataset(path, batch_size, seed=seed)
    return NpzDataset(path, batch_size, seed=seed)


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
    include_3d: bool = False,
    include_verts3d: bool = False,
    synth=None,
) -> dict:
    """Render a small on-disk dataset with our own SMPL + rasterizer.

    Returns the arrays (and writes `path` if given). Self-supervised fixture:
    no external data needed, ground truth known exactly (SURVEY.md §4.3).

    `synth` (a data/synthetic.SyntheticConfig, default stream when None)
    selects the generator distribution AND the target renderer — e.g.
    targets='hard' writes z-buffer-rendered masks (ops/raster_hard.py) so
    disk training supervises on renderer-independent hard annotations, and
    the appearance knobs (bg_mode/color_jitter/shading/occluders) produce
    domain-randomized images.

    `include_3d` additionally stores per-example 3D labels under the bare
    npz names the training targets use (joints3d [N,J,3], rotmats [N,J,3,3])
    — a disk dataset for DIRECT/mixed supervision (losses.py j3d/rotmat/
    betas_l2; see configs.TrainConfig.loss_weights). betas_l2 reads the
    gt_betas array that is always stored (fit_dataset aliases gt_betas →
    betas, so no duplicate copy is written). Vertex supervision (v3d) needs
    `include_verts3d` — kept separate because verts3d is ~80× the size of
    the other 3D labels (N×6890×3 f32 ≈ 83 KB/example) and the mixed preset
    measured it information-free given j3d+rotmat+betas (BASELINE.md).
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
    synth_cfg = synth if synth is not None else synthetic.SyntheticConfig()
    # The jitted generator returns STORAGE dtypes (uint8 images/masks) and
    # only the stored keys: on a tunneled TPU the device→host fetch is the
    # bottleneck (~30 MB/s measured), so quantizing on device cuts the
    # transfer 4x vs fetching f32 images + i32 labels, and dropping the
    # unstored generate_batch outputs (silhouettes, scores) saves their
    # fetch entirely. Host-side chunks are also storage-dtype, so peak RSS
    # is ~2x the final dataset instead of the 40+ GB measured for a
    # 20k×320² dataset when raw f32 chunks were accumulated and concatenated.
    def _storage_batch(k):
        b = synthetic.generate_batch(
            k,
            chunk,
            consts,
            model_cfg,
            synth_cfg,
            include_3d=include_3d or include_verts3d,
        )
        out = {
            "images": jnp.clip((b["image"] + 1.0) * 127.5, 0, 255).astype(
                jnp.uint8
            ),
            "masks": b["part_labels"].astype(jnp.uint8),
            "kp2d": b["kp2d"].astype(jnp.float32),
            "kp_vis": b["kp_vis"].astype(jnp.float32),
            "gt_pose": b["gt_pose"].astype(jnp.float32),
            "gt_betas": b["gt_betas"].astype(jnp.float32),
        }
        if include_3d:
            out["joints3d"] = b["gt_joints3d"].astype(jnp.float32)
            out["rotmats"] = b["gt_rotmats"].astype(jnp.float32)
        if include_verts3d:
            out["verts3d"] = b["gt_verts"].astype(jnp.float32)
        return out

    gen = jax.jit(_storage_batch)
    parts: list = []
    key = jax.random.PRNGKey(seed)
    remaining = num_examples
    while remaining > 0:
        key, sub = jax.random.split(key)
        batch = gen(sub)
        take = min(chunk, remaining)
        parts.append(jax.tree.map(lambda x: np.asarray(x[:take]), batch))
        remaining -= take
    arrays = {k: np.concatenate([p[k] for p in parts]) for k in parts[0]}
    if path:
        np.savez_compressed(path, **arrays)
    return arrays
