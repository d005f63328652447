"""Evaluation metrics + loop (model-quality counterpart to the benchmarks).

Standard 3D pose/shape metrics of the reference's research genre, computed
against ground truth (available exactly on the synthetic stream):

- PVE: mean per-vertex error between predicted and GT SMPL surfaces (mm if
  the asset is metric).
- MPJPE: mean per-joint position error on the regressed 3D keypoints.
- PA-MPJPE: MPJPE after Procrustes alignment (rotation/translation/scale
  removed — isolates articulated-pose error from camera error).
- Silhouette IoU between the rendered prediction and the target mask.
- Part accuracy + mean per-class IoU (part_metrics) on the rendered
  part-segmentation map wherever part labels exist — synthetic stream, npz
  datasets, and image directories alike (the part-CE loss's quality metric).

All pure jittable functions; `evaluate()` runs them over a synthetic
validation stream with a fixed key, so eval is deterministic;
`evaluate_dataset()` scores a disk dataset (.npz) through the exact
on-device preprocessing the training path uses, computing the 3D metrics
when the file stores ground-truth SMPL params and image-space metrics
(silhouette IoU, part accuracy, keypoint error) always.

Noise: eval metrics are exact for a fixed (seed, num_batches) — the stream
is deterministic — but are a sample of the generator distribution; at the
default 4x32 images the run-to-run spread across seeds is ~1-2% relative
(dominated by pose diversity), so compare runs at matched seeds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu import configs
from indirect_learning_pose_shape_tpu.data import synthetic
from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.models import smpl as smpl_mod


def pve(pred_verts: jax.Array, gt_verts: jax.Array) -> jax.Array:
    """Mean per-vertex Euclidean error. [B, V, 3] x2 -> scalar."""
    return jnp.mean(jnp.linalg.norm(pred_verts - gt_verts, axis=-1))


def mpjpe(pred_joints: jax.Array, gt_joints: jax.Array) -> jax.Array:
    """Mean per-joint position error. [B, K, 3] x2 -> scalar."""
    return jnp.mean(jnp.linalg.norm(pred_joints - gt_joints, axis=-1))


def procrustes_align(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Similarity-align pred to gt per batch item (Umeyama). [B, N, 3]."""
    mu_p = jnp.mean(pred, axis=1, keepdims=True)
    mu_g = jnp.mean(gt, axis=1, keepdims=True)
    pc, gc = pred - mu_p, gt - mu_g
    cov = jnp.einsum("bni,bnj->bij", gc, pc) / pred.shape[1]
    u, s, vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", u, vt))
    d = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), det], axis=-1
    )  # reflection fix
    rot = jnp.einsum("bij,bj,bjk->bik", u, d, vt)
    var_p = jnp.mean(jnp.sum(pc * pc, axis=-1), axis=1)
    scale = jnp.sum(s * d, axis=-1) / (var_p + 1e-12)
    aligned = scale[:, None, None] * jnp.einsum("bij,bnj->bni", rot, pc) + mu_g
    return aligned


def pa_mpjpe(pred_joints: jax.Array, gt_joints: jax.Array) -> jax.Array:
    return mpjpe(procrustes_align(pred_joints, gt_joints), gt_joints)


def silhouette_iou_metric(pred_sil: jax.Array, target_sil: jax.Array) -> jax.Array:
    """Hard IoU at 0.5 threshold. [B, H, W] x2 -> scalar."""
    p = pred_sil > 0.5
    t = target_sil > 0.5
    inter = jnp.sum(p & t, axis=(-2, -1))
    union = jnp.sum(p | t, axis=(-2, -1))
    return jnp.mean(inter / jnp.maximum(union, 1))


def part_metrics(pred_probs: jax.Array, target_labels: jax.Array):
    """Per-pixel part accuracy + mean per-class IoU (the part-segmentation
    genre's quality metrics — the part-CE loss's measurable counterpart).

    pred_probs [B, H, W, C+1] normalized class scores, target_labels
    [B, H, W] int. Returns (part_acc, miou):
    - part_acc: argmax accuracy over every pixel (background included — the
      convention for full-frame segmentation accuracy).
    - miou: IoU per class, averaged over classes PRESENT in target or
      prediction (absent classes would contribute 0/0; excluding them keeps
      the metric comparable across batches with different part visibility).
    """
    pred = jnp.argmax(pred_probs, axis=-1)
    tgt = target_labels.astype(pred.dtype)
    acc = jnp.mean((pred == tgt).astype(jnp.float32))
    C = pred_probs.shape[-1]
    classes = jnp.arange(C, dtype=pred.dtype)
    p1 = pred[..., None] == classes  # [B,H,W,C]
    t1 = tgt[..., None] == classes
    inter = jnp.sum(p1 & t1, axis=(0, 1, 2)).astype(jnp.float32)
    union = jnp.sum(p1 | t1, axis=(0, 1, 2)).astype(jnp.float32)
    present = union > 0
    iou = jnp.where(present, inter / jnp.maximum(union, 1.0), 0.0)
    miou = jnp.sum(iou) / jnp.maximum(jnp.sum(present), 1)
    return acc, miou


def _batch_metrics(
    params, model_state, consts, batch, cfg: configs.TrainConfig, qparams=None,
    int8_impl: str = "int8",
):
    """Shared per-batch metric computation (jit-traced).

    train=False: metrics must reflect deployed inference behaviour
    (BatchNorm running stats, not per-eval-batch statistics).

    qparams (models/quantize.py pytree) switches the forward to the int8
    serving encoder — scoring the DEPLOYED quantized model under the same
    metrics/protocol, so the PTQ accuracy cost is measurable.
    """
    if qparams is None:
        outputs, _ = net.forward_train(
            params, model_state, consts, batch["image"], cfg.model, train=False
        )
    else:
        from indirect_learning_pose_shape_tpu.models import quantize as quant

        outputs = quant.quantized_forward(
            qparams, params["ief"], consts, batch["image"], cfg.model, impl=int8_impl
        )
        outputs = net.render_outputs(outputs, consts, cfg.model)
    metrics = {
        "sil_iou": silhouette_iou_metric(outputs["silhouette"], batch["silhouette"])
    }
    if "part_labels" in batch:
        metrics["part_acc"], metrics["miou"] = part_metrics(
            outputs["probs"], batch["part_labels"]
        )
    if "kp2d" in batch:
        vis = batch.get("kp_vis", jnp.ones(batch["kp2d"].shape[:-1]))
        err = jnp.linalg.norm(outputs["kp2d"] - batch["kp2d"], axis=-1)
        metrics["kp_err_px"] = jnp.sum(err * vis) / jnp.maximum(jnp.sum(vis), 1.0)
    if "gt_pose" in batch and "gt_betas" in batch:
        gt = smpl_mod.smpl_forward(
            consts.smpl, batch["gt_pose"], batch["gt_betas"], impl=cfg.model.smpl_impl
        )
        metrics["pve"] = pve(outputs["verts"], gt["verts"])
        metrics["mpjpe"] = mpjpe(outputs["kp3d"], gt["kp3d"])
        metrics["pa_mpjpe"] = pa_mpjpe(outputs["kp3d"], gt["kp3d"])
    return metrics


@functools.lru_cache(maxsize=8)
def _synthetic_eval_fn(
    cfg: configs.TrainConfig, num_batches: int, use_int8: bool,
    int8_impl: str = "int8",
):
    """One jitted eval graph per (cfg, num_batches, int8) — cached across
    call sites so repeated evals (e.g. inside a training loop) never
    recompile, and the mean over batches accumulates on device via
    lax.scan."""

    @jax.jit
    def run(params, model_state, consts, key, qparams):
        def body(carry, k):
            batch = synthetic.generate_batch(
                k, cfg.batch_size, consts, cfg.model, cfg.synthetic
            )
            m = _batch_metrics(
                params, model_state, consts, batch, cfg,
                qparams=qparams if use_int8 else None, int8_impl=int8_impl,
            )
            return carry, m

        keys = jax.random.split(key, num_batches)
        _, ms = jax.lax.scan(body, None, keys)
        return {k: jnp.mean(v) for k, v in ms.items()}

    return run


def evaluate(
    params,
    model_state,
    consts: net.ModelConsts,
    cfg: configs.TrainConfig,
    num_batches: int = 4,
    seed: int = 123,
    qparams=None,
    int8_impl: str = "int8",
) -> dict[str, float]:
    """Deterministic eval over the synthetic validation stream.

    qparams: optional models/quantize.py pytree — scores the int8 serving
    path instead of the bf16 forward (same stream, same metrics);
    int8_impl selects the execution scheme ('int8' per-site f32 handoffs,
    'int8c' carried int8 activations — models/quantize.py)."""
    run = _synthetic_eval_fn(cfg, num_batches, qparams is not None, int8_impl)
    out = run(params, model_state, consts, jax.random.PRNGKey(seed), qparams)
    return {k: float(v) for k, v in out.items()}


@functools.lru_cache(maxsize=8)
def _dataset_eval_fn(
    cfg: configs.TrainConfig, has_gt: bool, use_int8: bool = False,
    int8_impl: str = "int8",
):
    from indirect_learning_pose_shape_tpu import train

    @jax.jit
    def run(params, model_state, consts, raw, qparams):
        batch = train.preprocess_raw_batch(raw, consts, cfg)
        if has_gt:
            batch = dict(batch, gt_pose=raw["gt_pose"], gt_betas=raw["gt_betas"])
        return _batch_metrics(
            params, model_state, consts, batch, cfg,
            qparams=qparams if use_int8 else None, int8_impl=int8_impl,
        )

    return run


def evaluate_dataset(
    params,
    model_state,
    consts: net.ModelConsts,
    cfg: configs.TrainConfig,
    dataset,
    max_batches: int | None = None,
    qparams=None,
    int8_impl: str = "int8",
) -> dict[str, float]:
    """Eval over a disk dataset (data/dataset.py NpzDataset, epoch 0 order).

    Preprocessing is the training path's own on-device crop/resize
    (train.preprocess_raw_batch), so the measurement matches what training
    would see. 3D metrics (PVE/MPJPE/PA-MPJPE) are computed when the file
    carries gt_pose/gt_betas; silhouette IoU and visible-keypoint pixel
    error always. The ragged tail batch is dropped (as in training).
    """
    keys = getattr(dataset, "keys", None) or frozenset(dataset.arrays)
    has_gt = "gt_pose" in keys and "gt_betas" in keys
    run = _dataset_eval_fn(cfg, has_gt, qparams is not None, int8_impl)
    raw_keys = ("images", "masks", "kp2d", "kp_vis") + (
        ("gt_pose", "gt_betas") if has_gt else ()
    )
    acc: dict[str, float] = {}
    n = 0
    for raw in dataset.epoch(0):
        m = run(params, model_state, consts, {k: raw[k] for k in raw_keys}, qparams)
        for name, v in m.items():
            acc[name] = acc.get(name, 0.0) + float(v)
        n += 1
        if max_batches and n >= max_batches:
            break
    if n == 0:
        raise ValueError("dataset yielded no full batches")
    return {k: v / n for k, v in acc.items()}


@functools.lru_cache(maxsize=8)
def _preprocessed_eval_fn(
    cfg: configs.TrainConfig, use_int8: bool = False, int8_impl: str = "int8"
):
    @jax.jit
    def run(params, model_state, consts, batch, qparams):
        return _batch_metrics(
            params, model_state, consts, batch, cfg,
            qparams=qparams if use_int8 else None, int8_impl=int8_impl,
        )

    return run


def evaluate_preprocessed(
    params,
    model_state,
    consts: net.ModelConsts,
    cfg: configs.TrainConfig,
    dataset,
    max_batches: int | None = None,
    qparams=None,
    int8_impl: str = "int8",
) -> dict[str, float]:
    """Eval over a host-preprocessed batch stream (ImageDirDataset — the
    reference's real-data genre, SURVEY.md §2.11). Batches arrive already
    model-resolution with image/silhouette/part_labels/kp2d/kp_vis keys, so
    image-space metrics (sil IoU, part accuracy, mIoU, keypoint px) apply;
    3D metrics need ground-truth SMPL params, which an image directory does
    not carry. Bounded to one epoch (or max_batches) — not the endless
    training stream."""
    run = _preprocessed_eval_fn(cfg, qparams is not None, int8_impl)
    limit = max_batches or dataset.steps_per_epoch()
    limit = min(limit, dataset.steps_per_epoch())
    acc: dict[str, float] = {}
    n = 0
    for batch in dataset.batches():
        m = run(params, model_state, consts, batch, qparams)
        for name, v in m.items():
            acc[name] = acc.get(name, 0.0) + float(v)
        n += 1
        if n >= limit:
            break
    if n == 0:
        raise ValueError("dataset yielded no full batches")
    return {k: v / n for k, v in acc.items()}


def main():
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import argparse
    import json

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="config4_full", choices=sorted(configs.PRESETS))
    ap.add_argument("--checkpoint", default=None, help="orbax checkpoint dir")
    ap.add_argument(
        "--step", type=int, default=None,
        help="checkpoint step to score (default: latest)",
    )
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument(
        "--dataset",
        default=None,
        help="score a disk dataset instead of the synthetic stream: a .npz "
        "file or a directory/glob of shards (data/dataset.py); 3D metrics "
        "appear when it has gt_pose/gt_betas",
    )
    ap.add_argument(
        "--image-dir",
        default=None,
        help="score an image-directory dataset (images/, masks/, "
        "keypoints.npz; see data/image_dir.py) — image-space metrics only",
    )
    ap.add_argument(
        "--int8",
        action="store_true",
        help="score the int8-PTQ serving path (models/quantize.py; "
        "calibrated on a held-out synthetic batch, seed 999)",
    )
    ap.add_argument(
        "--qparams",
        default=None,
        help="pre-quantized encoder .npz (models/quantize.save_qparams); "
        "implies --int8 and skips calibration",
    )
    ap.add_argument(
        "--int8-impl",
        default="int8",
        choices=["int8", "int8c", "sim", "simc"],
        help="int8 execution scheme: 'int8' per-site (f32 between convs), "
        "'int8c' carried int8 activations; sim/simc are their portable "
        "f32-accumulation twins (models/quantize.py)",
    )
    ap.add_argument(
        "--ema",
        action="store_true",
        help="score the Polyak-averaged (EMA) params from the checkpoint "
        "instead of the raw ones (requires a run with ema_decay>0)",
    )
    ap.add_argument(
        "--eval-suite",
        default=None,
        choices=["plain", "hard", "hardapp"],
        help="named eval distribution (data/synthetic.EVAL_SUITES; the "
        "quality protocol's fixed FIELD=VALUE sets) — synthetic-stream "
        "scoring only; explicit --synthetic overrides apply on top",
    )
    ap.add_argument(
        "--synthetic",
        action="append",
        default=None,
        metavar="FIELD=VALUE",
        help="override one synthetic-stream knob for the eval distribution "
        "(repeatable; data/synthetic.SyntheticConfig fields, e.g. "
        "pose_std=0.35, cam_scale_range=0.5,1.3) — synthetic-stream "
        "scoring only",
    )
    args = ap.parse_args()

    from indirect_learning_pose_shape_tpu.predict import load_model
    from indirect_learning_pose_shape_tpu.utils import assets as assets_lib

    cfg = configs.PRESETS[args.preset]
    specs = list(synthetic.EVAL_SUITES[args.eval_suite]) if args.eval_suite else []
    specs += list(args.synthetic or [])
    if specs:
        if args.dataset or args.image_dir:
            ap.error("--eval-suite/--synthetic apply to synthetic-stream "
                     "scoring only")
        import dataclasses as _dc

        try:
            cfg = _dc.replace(
                cfg, synthetic=synthetic.apply_overrides(cfg.synthetic, specs)
            )
        except ValueError as e:
            ap.error(str(e))
    params, state, consts = load_model(
        cfg, args.checkpoint, assets_lib.load_asset(), ema=args.ema,
        step=args.step,
    )
    qparams = None
    if args.int8 or args.qparams:
        from indirect_learning_pose_shape_tpu.models import quantize as quant

        if args.qparams:
            qparams = quant.load_qparams(args.qparams)
        else:
            calib = synthetic.generate_batch(
                jax.random.PRNGKey(999), 16, consts, cfg.model, cfg.synthetic
            )["image"]
            qparams = quant.ptq_quantize(
                params["encoder"], state["encoder"], cfg.model.encoder, calib
            )
    if args.image_dir:
        from indirect_learning_pose_shape_tpu.data.image_dir import ImageDirDataset

        ds = ImageDirDataset(
            args.image_dir,
            cfg.batch_size,
            cfg.model.image_size,
            num_parts=cfg.model.raster.num_parts,
            seed=cfg.seed,
        )
        metrics = evaluate_preprocessed(
            params, state, consts, cfg, ds, max_batches=args.batches or None,
            qparams=qparams, int8_impl=args.int8_impl,
        )
    elif args.dataset:
        from indirect_learning_pose_shape_tpu.data.dataset import open_dataset

        ds = open_dataset(args.dataset, cfg.batch_size, seed=cfg.seed)
        metrics = evaluate_dataset(
            params, state, consts, cfg, ds, max_batches=args.batches or None,
            qparams=qparams, int8_impl=args.int8_impl,
        )
    else:
        metrics = evaluate(
            params, state, consts, cfg, num_batches=args.batches, qparams=qparams,
            int8_impl=args.int8_impl,
        )
    print(json.dumps({k: round(v, 5) for k, v in metrics.items()}))


if __name__ == "__main__":
    main()
