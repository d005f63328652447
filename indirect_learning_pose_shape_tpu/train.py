"""Training loop (SURVEY.md §2.10, §3.1): one jit-compiled train step.

The hot path is a single compiled graph per BASELINE.json:5 — on-device
synthetic batch generation (targets rendered with our own rasterizer),
encoder → IEF → SMPL → projection → soft raster → losses → grads → Adam —
with buffers donated so the optimizer updates in place. Data parallelism is
sharding-only: batch arrays carry a NamedSharding over the 'data' mesh axis,
parameters are replicated, XLA inserts the gradient all-reduce
(parallel/mesh.py).

Usage:
    python -m indirect_learning_pose_shape_tpu.train --preset config4_full \
        --steps 200
"""

from __future__ import annotations

import argparse
import dataclasses
import functools
import sys
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax

from indirect_learning_pose_shape_tpu import configs, losses
from indirect_learning_pose_shape_tpu.data import synthetic
from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.parallel import mesh as mesh_lib
from indirect_learning_pose_shape_tpu.utils import assets as assets_lib
from indirect_learning_pose_shape_tpu.utils.metrics import MetricsWriter


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    model_state: Any
    opt_state: Any
    step: jax.Array
    rng: jax.Array
    # Polyak/EMA shadow of `params` (cfg.ema_decay > 0); None when disabled.
    # None is an empty pytree node, so the no-EMA state checkpoints and
    # shards exactly as before.
    ema_params: Any = None


def make_optimizer(cfg: configs.TrainConfig) -> optax.GradientTransformation:
    """Adam/AdamW with optional warmup-cosine schedule and grad clipping."""
    if cfg.lr_schedule == "cosine":
        lr = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=cfg.learning_rate,
            warmup_steps=cfg.warmup_steps,
            decay_steps=max(cfg.num_steps, cfg.warmup_steps + 1),
        )
    else:
        lr = cfg.learning_rate
    opt = (
        optax.adamw(lr, weight_decay=cfg.weight_decay)
        if cfg.weight_decay
        else optax.adam(lr)
    )
    if cfg.grad_clip_norm:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    return opt


def init_state(cfg: configs.TrainConfig, asset=None):
    """Build (train_state, consts). Pure of global state."""
    if asset is None:
        asset = assets_lib.load_asset()
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_run = jax.random.split(key)
    params, model_state, consts = net.init(k_init, asset, cfg.model)
    if cfg.mean_params:
        from indirect_learning_pose_shape_tpu.models.ief import load_mean_theta

        params = dict(
            params,
            ief=dict(
                params["ief"],
                mean_theta=load_mean_theta(cfg.mean_params, cfg.model.ief),
            ),
        )
    if cfg.pretrained:
        params, model_state = _load_pretrained_encoder(
            cfg.pretrained, cfg.model.encoder, params, model_state
        )
    opt_state = make_optimizer(cfg).init(params)
    # EMA starts AT the initial params (no zero-init/debias dance): the
    # shadow is a valid model from step 0 and converges to the trailing
    # average over ~1/(1-decay) steps.
    ema = (
        jax.tree.map(lambda x: jnp.array(x, copy=True), params)
        if cfg.ema_decay
        else None
    )
    ts = TrainState(
        params=params,
        model_state=model_state,
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        rng=k_run,
        ema_params=ema,
    )
    return ts, consts


def _load_pretrained_encoder(path: str, enc_cfg, params: dict, state: dict):
    """Swap the encoder subtree for imported ImageNet weights (SURVEY.md §2.4).

    The npz comes from tools/import_resnet_weights.py (torchvision state
    dict -> our pytree). Shape agreement with the freshly-initialized trees
    doubles as the architecture check (depth/width must match the file).
    """
    from indirect_learning_pose_shape_tpu.models.pretrained import load_encoder_npz

    enc_params, enc_state, depth = load_encoder_npz(path)
    if depth != enc_cfg.depth:
        raise ValueError(
            f"pretrained file {path!r} is a ResNet-{depth}; the config asks "
            f"for depth {enc_cfg.depth}"
        )
    ref = params["encoder"]
    got_shapes = jax.tree.map(lambda x: x.shape, enc_params)
    ref_shapes = jax.tree.map(lambda x: x.shape, ref)
    if got_shapes != ref_shapes:
        raise ValueError(
            f"pretrained encoder shapes do not match the configured encoder "
            f"(width {enc_cfg.width}?): {got_shapes} vs {ref_shapes}"
        )
    params = dict(params, encoder=jax.tree.map(jnp.asarray, enc_params))
    state = dict(state, encoder=jax.tree.map(jnp.asarray, enc_state))
    return params, state


def loss_and_metrics(
    params, model_state, consts, batch, cfg: configs.TrainConfig, constrain=None
):
    outputs, new_state = net.forward_train(
        params,
        model_state,
        consts,
        batch["image"],
        cfg.model,
        constrain=constrain,
        probs=False,  # score-form render: losses never materialize probs
    )
    targets = {
        "silhouette": batch["silhouette"],
        "part_labels": batch["part_labels"],
        "kp2d": batch["kp2d"],
        "kp_vis": batch["kp_vis"],
    }
    # Direct-supervision targets (losses.py j3d/v3d/rotmat/betas_l2; all
    # weights default 0 — pure indirect, the reference-faithful path). The
    # synthetic stream names them gt_* (make_batch emits them only when a
    # direct weight is live); disk npz datasets carry them under the bare
    # names.
    w = cfg.loss_weight_dict
    for wkey, tkey, candidates in (
        ("j3d", "joints3d", ("gt_joints3d", "joints3d")),
        ("v3d", "verts3d", ("gt_verts", "verts3d")),
        ("rotmat", "rotmats", ("gt_rotmats", "rotmats")),
        ("betas_l2", "betas", ("gt_betas", "betas")),
    ):
        if w.get(wkey, 0.0):
            src = next((c for c in candidates if c in batch), None)
            if src is None:
                raise KeyError(
                    f"loss weight {wkey!r} is set but the batch carries no "
                    f"{candidates} target — direct supervision needs a data "
                    "source with 3D ground truth (the synthetic stream, or "
                    "an npz dataset with that key)"
                )
            targets[tkey] = batch[src]
    with jax.named_scope("losses"):
        total, terms = losses.total_loss(
            outputs, targets, cfg.loss_weight_dict, cfg.model.image_size
        )
    # Recovery diagnostics (synthetic data carries ground truth). Param-space
    # pose error only applies when the network predicts the same (axis-angle)
    # representation the generator sampled.
    if "gt_pose" in batch and outputs["pose"].shape == batch["gt_pose"].shape:
        terms["pose_err"] = jnp.mean(jnp.abs(outputs["pose"] - batch["gt_pose"]))
    if "gt_betas" in batch:
        terms["beta_err"] = jnp.mean(jnp.abs(outputs["betas"] - batch["gt_betas"]))
    return total, (terms, new_state)


def train_step(ts: TrainState, batch, consts, cfg: configs.TrainConfig, constrain=None):
    """One optimizer step. Jit this (donate ts) — it is the whole hot path.

    `constrain` (parallel/render_sp.constrainer) row-shards the prediction
    render over a ('data','render') mesh; None = data-parallel/single-chip.
    """
    grad_fn = jax.value_and_grad(loss_and_metrics, has_aux=True)
    (_, (terms, new_model_state)), grads = grad_fn(
        ts.params, ts.model_state, consts, batch, cfg, constrain
    )
    with jax.named_scope("optimizer"):
        updates, new_opt_state = make_optimizer(cfg).update(
            grads, ts.opt_state, ts.params
        )
        new_params = optax.apply_updates(ts.params, updates)
        new_ema = ts.ema_params
        if cfg.ema_decay:
            d = cfg.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, ts.ema_params, new_params
            )
    new_ts = TrainState(
        params=new_params,
        model_state=new_model_state,
        opt_state=new_opt_state,
        step=ts.step + 1,
        rng=ts.rng,
        ema_params=new_ema,
    )
    return new_ts, terms


def make_batch(rng, step, batch_size, consts, cfg: configs.TrainConfig, constrain=None):
    """On-device batch for `step`: key is step-indexed (deterministic resume)."""
    key = jax.random.fold_in(rng, step)
    w = cfg.loss_weight_dict
    include_3d = any(w.get(k, 0.0) for k in ("j3d", "v3d", "rotmat"))
    with jax.named_scope("datagen"):
        return synthetic.generate_batch(
            key,
            batch_size,
            consts,
            cfg.model,
            cfg.synthetic,
            constrain=constrain,
            include_3d=include_3d,
        )


# The jitted step entry points are MODULE-LEVEL functions with `consts` as a
# traced argument and (cfg, mesh) static: jax.jit caches on the function
# object, so every fit/compile_* call with equal configs and same-shaped
# consts reuses one compiled executable. The previous per-call closures
# (functools.partial over consts) made each call a fresh cache entry — every
# test and every resume segment recompiled identical graphs (the dominant
# cost of the test suite on this host; VERDICT r2 next #9).
#
# `_graph_cfg` strips the fields that do NOT enter the traced graph
# (metrics/checkpoint paths and cadences, init-only asset paths) to fixed
# sentinels before the cfg is used as the static key — otherwise two runs
# differing only in, say, metrics_path would recompile an identical HLO.
# num_steps STAYS: the cosine LR schedule folds it into the update graph.


_GRAPH_IRRELEVANT = dict(
    checkpoint_every=0,
    checkpoint_dir="",
    log_every=0,
    metrics_path=None,
    tensorboard_dir=None,
    pretrained=None,
    mean_params=None,
    seed=0,  # enters init_state only, never the step graph
)


def _graph_cfg(cfg: configs.TrainConfig) -> configs.TrainConfig:
    cfg = dataclasses.replace(cfg, **_GRAPH_IRRELEVANT)
    if cfg.lr_schedule != "cosine":
        # num_steps/warmup_steps shape the update graph only through the
        # cosine schedule (make_optimizer); under a constant LR two runs
        # differing only in step budget share one executable.
        cfg = dataclasses.replace(cfg, num_steps=0, warmup_steps=0)
    return cfg


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"))
def _gen_jit(rng, step, consts, cfg: configs.TrainConfig, mesh):
    batch = make_batch(
        rng, step, cfg.batch_size, consts, cfg, _render_constrain(mesh)
    )
    return _constrain_batch(batch, cfg, mesh)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=0)
def _step_jit(ts: TrainState, batch, consts, cfg: configs.TrainConfig, mesh):
    return train_step(ts, batch, consts, cfg, constrain=_render_constrain(mesh))


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=0)
def _data_step_jit(ts: TrainState, raw, consts, cfg: configs.TrainConfig, mesh):
    return data_train_step(ts, raw, consts, cfg, constrain=_render_constrain(mesh))


def _constrain_batch(batch, cfg: configs.TrainConfig, mesh):
    if mesh is None:
        return batch
    data = mesh_lib.batch_sharding(mesh)
    if _render_constrain(mesh) is None:
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, data), batch
        )
    # Image-space targets stay ROW-sharded to match the row-sharded
    # prediction render — the seg losses then compute with zero
    # communication; forcing them to P('data') would all-gather the
    # targets only to re-shard them in the loss. Everything else (image
    # for the conv stack, keypoints, gt diagnostics) is plain
    # data-parallel.
    from jax.sharding import NamedSharding, PartitionSpec as P

    row = NamedSharding(mesh, P(mesh_lib.DATA_AXIS, "render"))
    return {
        k: jax.lax.with_sharding_constraint(
            v, row if k in ("silhouette", "part_labels") else data
        )
        for k, v in batch.items()
    }


def compile_train_fns(cfg: configs.TrainConfig, consts, mesh=None):
    """Returns (gen_fn, step_fn), jitted; sharded over `mesh` when given."""
    gcfg = _graph_cfg(cfg)
    gen = lambda rng, step: _gen_jit(rng, step, consts, gcfg, mesh)  # noqa: E731
    step = lambda ts, batch: _step_jit(ts, batch, consts, gcfg, mesh)  # noqa: E731
    return gen, step


def _render_constrain(mesh):
    """Spatially-parallel render hook when the mesh carries a 'render' axis
    (parallel/render_sp.py); None for 1-D/absent meshes."""
    if mesh is None:
        return None
    from indirect_learning_pose_shape_tpu.parallel import render_sp

    if render_sp.RENDER_AXIS not in mesh.axis_names:
        return None
    return render_sp.constrainer(mesh)


@functools.partial(jax.jit, static_argnames=("cfg", "mesh"), donate_argnums=0)
def _fused_jit(ts: TrainState, consts, cfg: configs.TrainConfig, mesh):
    constrain = _render_constrain(mesh)

    def one(ts, _):
        batch = make_batch(ts.rng, ts.step, cfg.batch_size, consts, cfg, constrain)
        batch = _constrain_batch(batch, cfg, mesh)
        return train_step(ts, batch, consts, cfg, constrain=constrain)

    if cfg.steps_per_call <= 1:
        return one(ts, None)
    # K steps per dispatch: the body is the identical single-step graph
    # (batches are step-indexed off ts.step, so chunking doesn't change the
    # data stream); host dispatch cost amortizes K×. Report the LAST step's
    # terms — same as what a caller stepping one-by-one would last see.
    ts, terms = jax.lax.scan(one, ts, None, length=cfg.steps_per_call)
    return ts, jax.tree.map(lambda x: x[-1], terms)


def compile_fused_step(cfg: configs.TrainConfig, consts, mesh=None):
    """Single-dispatch train step: on-device batch generation + update in ONE
    jit graph (the BASELINE.json:5 'whole train step is one jit-compiled
    graph' in its strongest form). Under a mesh, a sharding constraint on the
    generated batch keeps everything downstream data-parallel; a 2-D
    ('data','render') mesh additionally row-shards BOTH renders (target +
    prediction) over the render axis."""
    gcfg = _graph_cfg(cfg)
    return lambda ts: _fused_jit(ts, consts, gcfg, mesh)


def preprocess_raw_batch(
    raw: dict, consts, cfg: configs.TrainConfig, key: Optional[jax.Array] = None
) -> dict:
    """On-device preprocessing of a raw disk batch (SURVEY.md §2.8).

    raw: images [B,Hs,Ws,3] uint8, masks [B,Hs,Ws] int, kp2d [B,K,2] source
    pixels, kp_vis [B,K]. Crop box derived from the mask, applied to image,
    mask, and keypoints entirely in-graph (jitted with the train step).
    With cfg.augment.enabled and a key, random mirror + crop jitter run
    on-device first (data/augment.py); eval paths pass no key and stay
    deterministic.
    """
    from indirect_learning_pose_shape_tpu.data import augment as aug
    from indirect_learning_pose_shape_tpu.data import preprocess as pp

    size = cfg.model.image_size
    extra_3d = [k for k in ("joints3d", "verts3d", "rotmats", "betas") if k in raw]
    if cfg.augment.enabled and key is not None:
        if extra_3d != [] and extra_3d != ["betas"]:
            # Mirroring 2D data while keeping 3D labels fixed would silently
            # corrupt direct supervision (the mirrored image's true joints
            # are x-negated + L/R-swapped). β is mirror-invariant; the
            # geometric labels are not, and their flip needs per-asset
            # correspondence tables we refuse to guess (the same loud-refusal
            # contract as kp_flip_perm / part_label_flip_perm).
            raise ValueError(
                f"augmentation (mirror) is enabled but the batch carries 3D "
                f"targets {extra_3d}: flipping them is not implemented — "
                "disable augmentation for direct-supervision training on "
                "this dataset"
            )
        k_flip, k_box = jax.random.split(key)
        raw = aug.mirror_raw_batch(
            raw, k_flip, cfg.augment, num_parts=cfg.model.raster.num_parts
        )
        bboxes = jax.vmap(pp.bbox_from_mask)(raw["masks"])
        bboxes = aug.jitter_bboxes(bboxes, k_box, cfg.augment)
    else:
        bboxes = jax.vmap(pp.bbox_from_mask)(raw["masks"])
    images = pp.normalize(pp.crop_resize(raw["images"], bboxes, size))
    masks = pp.crop_resize_mask(raw["masks"], bboxes, size)
    num_classes = cfg.model.raster.num_parts + 1
    part_labels = jnp.clip(masks.astype(jnp.int32), 0, num_classes - 1)
    batch = {
        "image": images,
        "silhouette": (masks > 0).astype(jnp.float32),
        "part_labels": part_labels,
        "kp2d": pp.transform_keypoints(raw["kp2d"], bboxes, size),
        "kp_vis": raw["kp_vis"],
    }
    # 3D labels (direct/mixed supervision) are crop-invariant — model-space
    # quantities untouched by the 2D crop/resize — and pass through as-is.
    for k in extra_3d:
        batch[k] = raw[k]
    return batch


def data_train_step(
    ts: TrainState, raw: dict, consts, cfg: configs.TrainConfig, constrain=None
):
    """Train step over a raw disk batch: on-device (augment+)preprocess +
    update. The augmentation key is step-indexed from the run RNG, so a
    resumed run replays the exact same flips/jitters it would have seen."""
    key = jax.random.fold_in(ts.rng, ts.step)
    batch = preprocess_raw_batch(raw, consts, cfg, key=key)
    return train_step(ts, batch, consts, cfg, constrain=constrain)


def _auto_mesh(cfg: configs.TrainConfig):
    """Mesh selection shared by fit/fit_dataset (None = single device)."""
    if cfg.render_devices > 1:
        from indirect_learning_pose_shape_tpu.parallel import render_sp

        total = cfg.num_devices or len(jax.devices())
        if total % cfg.render_devices:
            raise ValueError(
                f"{total} devices not divisible by render_devices "
                f"{cfg.render_devices}"
            )
        n_data = total // cfg.render_devices
        if cfg.batch_size % n_data:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by the data axis "
                f"({n_data} = {total} devices / {cfg.render_devices} render)"
            )
        if cfg.model.raster.image_size % cfg.render_devices:
            raise ValueError(
                f"render image_size {cfg.model.raster.image_size} not "
                f"divisible by render_devices {cfg.render_devices}"
            )
        return render_sp.render_mesh(n_data, cfg.render_devices)
    if cfg.num_devices is None:
        n = len(jax.devices())
        while n > 1 and cfg.batch_size % n:
            n -= 1
        return mesh_lib.make_mesh(n) if n > 1 else None
    if cfg.num_devices > 1:
        if cfg.batch_size % cfg.num_devices:
            raise ValueError(
                f"batch_size {cfg.batch_size} not divisible by "
                f"num_devices {cfg.num_devices}"
            )
        return mesh_lib.make_mesh(cfg.num_devices)
    return None


def _fold_num_steps(cfg: configs.TrainConfig, num_steps):
    """Make an explicit step-count override part of the config BEFORE the
    optimizer is built — the cosine schedule's decay horizon reads
    cfg.num_steps, so an unfolded override would silently train at lr=0
    past the configured horizon."""
    if num_steps and num_steps != cfg.num_steps:
        cfg = dataclasses.replace(cfg, num_steps=num_steps)
    return cfg, cfg.num_steps


def _setup_checkpoint(cfg: configs.TrainConfig, ts: TrainState, num_steps: int):
    """Open the checkpointer and auto-resume (shared by all fit_* paths).

    Restores the latest checkpoint in cfg.checkpoint_dir into `ts` —
    params, BN/opt state, step counter, RNG — refusing a stale directory
    whose latest step already meets the step budget. Must run BEFORE any
    mesh replication so the restored arrays pick up the run's sharding.
    Returns (checkpointer_or_None, possibly-restored ts).
    """
    if not cfg.checkpoint_every:
        return None, ts
    from indirect_learning_pose_shape_tpu.utils.checkpoint import Checkpointer

    ckpt = Checkpointer(cfg.checkpoint_dir)
    latest = ckpt.latest_step()
    if latest is not None:
        if latest >= num_steps:
            raise ValueError(
                f"checkpoint_dir {cfg.checkpoint_dir!r} already holds step "
                f"{latest} >= num_steps {num_steps}: refusing to train zero "
                "steps. Point checkpoint_dir somewhere fresh for a new run, "
                "or raise num_steps to continue this one."
            )
        print(f"resuming from step {latest} in {cfg.checkpoint_dir}")
        ts = TrainState(**ckpt.restore(dataclasses.asdict(ts)))
    return ckpt, ts



def _final_save(ckpt, ts: TrainState, start: int, cfg: configs.TrainConfig):
    """Save the end-of-run state when the loop's last periodic save missed it.

    Without this, a step budget that is not a multiple of checkpoint_every
    (e.g. 8000 steps at every=1700) ends with only step 6800 on disk and
    evaluate/predict silently serve a stale model. Shared by all fit_*
    paths.
    """
    if int(ts.step) % cfg.checkpoint_every and int(ts.step) > start:
        ckpt.save(int(ts.step), dataclasses.asdict(ts))


def fit_preprocessed(
    cfg: configs.TrainConfig,
    dataset,
    asset=None,
    num_steps: Optional[int] = None,
    metrics_path: Optional[str] = None,
):
    """Training over a host-preprocessed batch stream (e.g. ImageDirDataset:
    ragged source images reduced to model resolution by the native C++
    preprocessor on the host; batches feed train_step directly).

    Augmentation on this path is the DATASET's job (the mirror must act on
    source-resolution arrays before the host-side crop): cfg.augment.enabled
    without a dataset that augments would be a silent no-op, so it is
    refused loudly instead."""
    from indirect_learning_pose_shape_tpu.data.dataset import prefetch_to_device

    if cfg.augment.enabled and getattr(dataset, "augment", None) is None:
        raise ValueError(
            "cfg.augment.enabled is set but this preprocessed dataset does "
            "not augment: batches arrive already cropped/resized, so the "
            "train step cannot mirror them. Construct the dataset with "
            "augment=cfg.augment (ImageDirDataset supports host-side "
            "mirror + crop jitter) or disable augmentation."
        )
    cfg, num_steps = _fold_num_steps(cfg, num_steps)
    ts, consts = init_state(cfg, asset)
    ckpt, ts = _setup_checkpoint(cfg, ts, num_steps)
    mesh = _auto_mesh(cfg)
    sharding = None
    if mesh is not None:
        ts = mesh_lib.replicate_pytree(ts, mesh)
        consts = mesh_lib.replicate_pytree(consts, mesh)
        sharding = mesh_lib.batch_sharding(mesh)
    step_fn = lambda ts, b: _step_jit(  # noqa: E731
        ts, b, consts, _graph_cfg(cfg), mesh
    )
    start = int(ts.step)
    batches = prefetch_to_device(
        dataset.batches(start_step=start), size=2, sharding=sharding
    )
    writer = MetricsWriter(
        metrics_path or cfg.metrics_path, tensorboard_dir=cfg.tensorboard_dir
    )
    terms = {}
    le = max(1, cfg.log_every)
    for i in range(start, max(num_steps, start)):
        ts, terms = step_fn(ts, next(batches))
        # Honor log_every here too: each write is a blocking D2H fetch
        # (~38 ms batched vs 397 ms naive through the tunnel, BASELINE.md),
        # and the disk paths are exactly the transfer-bound ones.
        if i % le == 0 or i == num_steps - 1:
            writer.write(i, terms)
        if ckpt and (i + 1) % cfg.checkpoint_every == 0:
            ckpt.save(int(ts.step), dataclasses.asdict(ts))
    jax.block_until_ready(ts.params)
    if ckpt:
        _final_save(ckpt, ts, start, cfg)
        ckpt.close()
    writer.close()
    return ts, {k: float(v) for k, v in terms.items()}


def fit_dataset(
    cfg: configs.TrainConfig,
    dataset,
    asset=None,
    num_steps: Optional[int] = None,
    metrics_path: Optional[str] = None,
):
    """Training run over a disk dataset (NpzDataset) with device prefetch.

    Data-parallel like `fit`: the prefetcher lands each raw host batch
    already sharded over the mesh's data axis, so the on-device preprocess
    and the step run sharded with no extra transfers.
    """
    from indirect_learning_pose_shape_tpu.data.dataset import prefetch_to_device

    cfg, num_steps = _fold_num_steps(cfg, num_steps)
    ts, consts = init_state(cfg, asset)
    ckpt, ts = _setup_checkpoint(cfg, ts, num_steps)
    mesh = _auto_mesh(cfg)
    sharding = None
    if mesh is not None:
        ts = mesh_lib.replicate_pytree(ts, mesh)
        consts = mesh_lib.replicate_pytree(consts, mesh)
        sharding = mesh_lib.batch_sharding(mesh)
    step_fn = lambda ts, r: _data_step_jit(  # noqa: E731
        ts, r, consts, _graph_cfg(cfg), mesh
    )
    start = int(ts.step)
    # Filter to the keys the step uses BEFORE prefetch so unused arrays
    # (e.g. gt_* diagnostics in synthetic npz files) never ride the H2D pipe.
    # Live direct-supervision weights pull their 3D target keys back in —
    # under the bare name OR its gt_* alias (first candidate present in the
    # dataset wins, renamed to the bare name downstream expects); a dataset
    # missing both is refused with the descriptive loss_and_metrics error at
    # the first step.
    w = cfg.loss_weight_dict
    pulls = {k: k for k in ("images", "masks", "kp2d", "kp_vis")}
    ds_keys = getattr(dataset, "keys", frozenset())
    for wkey, tkey, candidates in (
        ("j3d", "joints3d", ("joints3d", "gt_joints3d")),
        ("v3d", "verts3d", ("verts3d", "gt_verts")),
        ("rotmat", "rotmats", ("rotmats", "gt_rotmats")),
        ("betas_l2", "betas", ("betas", "gt_betas")),
    ):
        if w.get(wkey, 0.0):
            pulls[tkey] = next(
                (c for c in candidates if c in ds_keys), candidates[0]
            )
    raw_iter = (
        {k: b[src] for k, src in pulls.items() if src in b}
        for b in dataset.batches(start_step=start)
    )
    batches = prefetch_to_device(raw_iter, size=2, sharding=sharding)
    writer = MetricsWriter(
        metrics_path or cfg.metrics_path, tensorboard_dir=cfg.tensorboard_dir
    )
    terms = {}
    le = max(1, cfg.log_every)
    for i in range(start, max(num_steps, start)):
        ts, terms = step_fn(ts, next(batches))
        if i % le == 0 or i == num_steps - 1:
            writer.write(i, terms)
        if ckpt and (i + 1) % cfg.checkpoint_every == 0:
            ckpt.save(int(ts.step), dataclasses.asdict(ts))
    jax.block_until_ready(ts.params)
    if ckpt:
        _final_save(ckpt, ts, start, cfg)
        ckpt.close()
    writer.close()
    return ts, {k: float(v) for k, v in terms.items()}


def fit(
    cfg: configs.TrainConfig,
    asset=None,
    num_steps: Optional[int] = None,
    metrics_path: Optional[str] = None,
):
    """Full training run. Returns (final_state, last_metrics).

    With checkpointing enabled, automatically resumes from the latest
    checkpoint in cfg.checkpoint_dir: params, optimizer state, step counter,
    and RNG key are restored, so the data stream continues exactly where the
    crashed run stopped (step-indexed keys; SURVEY.md §5 failure table).
    """
    cfg, num_steps = _fold_num_steps(cfg, num_steps)
    ts, consts = init_state(cfg, asset)
    ckpt, ts = _setup_checkpoint(cfg, ts, num_steps)
    mesh = _auto_mesh(cfg)
    if mesh is not None:
        ts = mesh_lib.replicate_pytree(ts, mesh)
        consts = mesh_lib.replicate_pytree(consts, mesh)

    fused_fn = compile_fused_step(cfg, consts, mesh)

    writer = MetricsWriter(
        metrics_path or cfg.metrics_path, tensorboard_dir=cfg.tensorboard_dir
    )
    terms = {}
    # `num_steps` is the TOTAL step budget: a resumed run (start > 0) trains
    # only the remaining steps, so crash + rerun lands on the same endpoint.
    start = int(ts.step)
    k = max(1, cfg.steps_per_call)
    le = max(1, cfg.log_every)
    if ckpt and cfg.checkpoint_every and k > cfg.checkpoint_every:
        # The crossing test below can save at most once per chunk, so the
        # effective checkpoint interval silently becomes k — say so.
        print(
            f"warning: steps_per_call={k} > checkpoint_every="
            f"{cfg.checkpoint_every}; checkpoints land once per chunk "
            f"(effective interval {k} steps)",
            file=sys.stderr,
        )
    single_fn = None  # lazily compiled for a sub-chunk remainder
    i = start
    while i < max(num_steps, start):
        this_k = min(k, num_steps - i)
        if this_k == k:
            ts, terms = fused_fn(ts)
        else:
            if single_fn is None:
                single_fn = compile_fused_step(
                    dataclasses.replace(cfg, steps_per_call=1), consts, mesh
                )
            for _ in range(this_k):
                ts, terms = single_fn(ts)
        prev, i = i, i + this_k
        # Log whenever a log_every boundary was crossed this iteration (or
        # at the end). Each write costs one blocking device fetch, so a
        # chunked run must honor log_every too — logging every chunk would
        # reintroduce the per-dispatch D2H tax log_every amortizes. `terms`
        # holds the LAST step of the iteration; the index written is that
        # step's.
        if i // le > prev // le or i >= num_steps:
            writer.write(i - 1, terms)
        if ckpt and cfg.checkpoint_every and (
            i // cfg.checkpoint_every > prev // cfg.checkpoint_every
        ):
            # Global step number: resume-safe and never collides.
            ckpt.save(int(ts.step), dataclasses.asdict(ts))
    jax.block_until_ready(ts.params)
    if ckpt:
        _final_save(ckpt, ts, start, cfg)
        ckpt.close()
    writer.close()
    return ts, {k: float(v) for k, v in terms.items()}


def main():
    from indirect_learning_pose_shape_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--preset", default="config4_full", choices=sorted(configs.PRESETS))
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--image-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument(
        "--lr-schedule",
        default=None,
        choices=["constant", "cosine"],
        help="LR schedule (TrainConfig.lr_schedule); cosine = linear warmup "
        "over --warmup-steps then cosine decay to the step budget",
    )
    ap.add_argument("--warmup-steps", type=int, default=None)
    ap.add_argument(
        "--grad-clip",
        type=float,
        default=None,
        help="global-norm gradient clipping threshold (0 disables)",
    )
    ap.add_argument(
        "--weight-decay",
        type=float,
        default=None,
        help="AdamW decoupled weight decay (0 = plain Adam)",
    )
    ap.add_argument(
        "--loss-weight",
        action="append",
        default=None,
        metavar="NAME=VALUE",
        help="override one loss weight (repeatable), e.g. --loss-weight "
        "shape_reg=0 --loss-weight kp=10; names must already exist in the "
        "preset's loss_weights (unknown names are refused)",
    )
    ap.add_argument(
        "--synthetic",
        action="append",
        default=None,
        metavar="FIELD=VALUE",
        help="override one synthetic-stream knob (repeatable), e.g. "
        "--synthetic pose_std=0.35 --synthetic cam_scale_range=0.5,1.3 "
        "(data/synthetic.SyntheticConfig fields; unknown fields are "
        "refused). Controls the training distribution's hardness; "
        "synthetic-stream training only",
    )
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--metrics", default=None, help="JSONL metrics path")
    ap.add_argument(
        "--dataset",
        default=None,
        help="train from disk instead of the on-device synthetic stream: a "
        ".npz file, or a directory/glob of .npz shards for datasets larger "
        "than host RAM (data/dataset.py ShardedNpzDataset; one shard "
        "resident at a time)",
    )
    ap.add_argument(
        "--image-dir",
        default=None,
        help="train from an image-directory dataset (images/, masks/, "
        "keypoints.npz; see data/image_dir.py)",
    )
    ap.add_argument(
        "--profile",
        default=None,
        help="capture a jax.profiler trace of the run to this directory "
        "(view with XProf/Perfetto; SURVEY.md §5 tracing)",
    )
    ap.add_argument(
        "--debug-nans", action="store_true", help="enable jax_debug_nans"
    )
    ap.add_argument(
        "--steps-per-call",
        type=int,
        default=None,
        help="optimizer steps per jit dispatch on the synthetic stream "
        "(lax.scan-chunked fused step; amortizes host dispatch latency)",
    )
    ap.add_argument("--checkpoint-every", type=int, default=None)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument(
        "--log-every",
        type=int,
        default=None,
        help="metrics-write cadence in steps (each write costs one "
        "batched device fetch; see TrainConfig.log_every)",
    )
    ap.add_argument(
        "--augment",
        action="store_true",
        help="random mirror + crop jitter on disk-data training "
        "(data/augment.py; on-device, resume-deterministic)",
    )
    ap.add_argument(
        "--pretrained",
        default=None,
        help="ImageNet-pretrained backbone npz from "
        "tools/import_resnet_weights.py (SURVEY.md §2.4)",
    )
    ap.add_argument(
        "--mean-params",
        default=None,
        help="mean-parameter file (npz 'mean_theta' or .npy) initialising "
        "IEF's Θ₀ (SURVEY.md §2.5); default is the neutral stand-in",
    )
    ap.add_argument(
        "--ief-iters",
        type=int,
        default=None,
        help="IEF iteration count T (SURVEY.md §0.1 item 4 leaves the "
        "reference's exact T open; default 3, ablated in BASELINE.md)",
    )
    ap.add_argument(
        "--rot-format",
        default=None,
        choices=["axis_angle", "rot6d"],
        help="pose rotation parameterization (IEFConfig.rotation_format): "
        "'axis_angle' is reference-faithful, 'rot6d' the continuity "
        "representation; A/B in BASELINE.md. Changes the IEF head width — "
        "checkpoints only restore under the format they trained with",
    )
    ap.add_argument(
        "--ema-decay",
        type=float,
        default=None,
        help="Polyak-average the params with this decay (e.g. 0.999); the "
        "EMA shadow is checkpointed and served via evaluate/predict --ema",
    )
    ap.add_argument(
        "--tensorboard",
        default=None,
        help="directory for TensorBoard event files (utils/metrics.py)",
    )
    args = ap.parse_args()

    cfg = configs.PRESETS[args.preset]
    updates = {}
    if args.batch_size:
        updates["batch_size"] = args.batch_size
    if args.lr:
        updates["learning_rate"] = args.lr
    if args.lr_schedule:
        updates["lr_schedule"] = args.lr_schedule
    if args.warmup_steps is not None:
        updates["warmup_steps"] = args.warmup_steps
    if args.grad_clip is not None:
        updates["grad_clip_norm"] = args.grad_clip
    if args.weight_decay is not None:
        updates["weight_decay"] = args.weight_decay
    if args.seed is not None:
        updates["seed"] = args.seed
    if args.loss_weight:
        weights = dict(cfg.loss_weights)
        for spec in args.loss_weight:
            name, _, value = spec.partition("=")
            if not _ or name not in weights:
                ap.error(
                    f"--loss-weight {spec!r}: expected NAME=VALUE with NAME "
                    f"among {sorted(weights)}"
                )
            weights[name] = float(value)
        updates["loss_weights"] = tuple(weights.items())
    if args.synthetic:
        if args.dataset or args.image_dir:
            ap.error("--synthetic applies to synthetic-stream training only")
        try:
            updates["synthetic"] = synthetic.apply_overrides(
                cfg.synthetic, args.synthetic
            )
        except ValueError as e:
            ap.error(str(e))
    if args.steps_per_call is not None:
        if args.steps_per_call < 1:
            ap.error("--steps-per-call must be >= 1")
        if args.dataset or args.image_dir:
            ap.error("--steps-per-call applies to synthetic-stream training only")
        updates["steps_per_call"] = args.steps_per_call
    if args.checkpoint_every is not None:
        updates["checkpoint_every"] = args.checkpoint_every
    if args.checkpoint_dir:
        updates["checkpoint_dir"] = args.checkpoint_dir
    if args.log_every is not None:
        if args.log_every < 1:
            ap.error("--log-every must be >= 1")
        updates["log_every"] = args.log_every
    if args.augment:
        # replace(), not a fresh AugmentConfig: presets may carry a non-default
        # part convention (e.g. config4_parts31) that must survive the flag.
        updates["augment"] = dataclasses.replace(cfg.augment, enabled=True)
    if args.pretrained:
        updates["pretrained"] = args.pretrained
    if args.mean_params:
        updates["mean_params"] = args.mean_params
    if args.ema_decay is not None:
        if not 0.0 <= args.ema_decay < 1.0:
            ap.error("--ema-decay must be in [0, 1)")
        updates["ema_decay"] = args.ema_decay
    if args.tensorboard:
        updates["tensorboard_dir"] = args.tensorboard
    if args.image_size:
        import dataclasses as dc

        updates["model"] = dc.replace(
            cfg.model,
            image_size=args.image_size,
            raster=dc.replace(cfg.model.raster, image_size=args.image_size),
        )
    if args.ief_iters is not None:
        if args.ief_iters < 1:
            ap.error("--ief-iters must be >= 1")
        base_model = updates.get("model", cfg.model)
        updates["model"] = dataclasses.replace(
            base_model,
            ief=dataclasses.replace(base_model.ief, num_iterations=args.ief_iters),
        )
    if args.rot_format is not None:
        base_model = updates.get("model", cfg.model)
        updates["model"] = dataclasses.replace(
            base_model,
            ief=dataclasses.replace(
                base_model.ief, rotation_format=args.rot_format
            ),
        )
    cfg = dataclasses.replace(cfg, **updates)

    if args.debug_nans:
        from indirect_learning_pose_shape_tpu.utils.debug import enable_nan_checks

        enable_nan_checks()

    import contextlib

    trace_cm = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )
    t0 = time.time()
    with trace_cm:
        if args.image_dir:
            from indirect_learning_pose_shape_tpu.data.image_dir import (
                ImageDirDataset,
            )

            ds = ImageDirDataset(
                args.image_dir,
                cfg.batch_size,
                cfg.model.image_size,
                num_parts=cfg.model.raster.num_parts,
                seed=cfg.seed,
                augment=cfg.augment if cfg.augment.enabled else None,
            )
            _, terms = fit_preprocessed(
                cfg, ds, num_steps=args.steps, metrics_path=args.metrics
            )
        elif args.dataset:
            from indirect_learning_pose_shape_tpu.data.dataset import open_dataset

            ds = open_dataset(args.dataset, cfg.batch_size, seed=cfg.seed)
            _, terms = fit_dataset(
                cfg, ds, num_steps=args.steps, metrics_path=args.metrics
            )
        else:
            _, terms = fit(cfg, num_steps=args.steps, metrics_path=args.metrics)
    dt = time.time() - t0
    print(f"done in {dt:.1f}s; final: {terms}")


if __name__ == "__main__":
    main()
