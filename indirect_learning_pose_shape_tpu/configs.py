"""Run configuration: one frozen dataclass + the five BASELINE presets.

The reference keeps hyperparameters as constants at the top of each train
script (SURVEY.md §2.10 [R-med]); the rebuild centralizes them here
(SURVEY.md §5 config table). The named presets are the five benchmark
configs from BASELINE.json:6-12.
"""

from __future__ import annotations

import dataclasses

from indirect_learning_pose_shape_tpu.data.augment import AugmentConfig
from indirect_learning_pose_shape_tpu.data.synthetic import SyntheticConfig
from indirect_learning_pose_shape_tpu.models.encoder import EncoderConfig
from indirect_learning_pose_shape_tpu.models.ief import IEFConfig
from indirect_learning_pose_shape_tpu.models.network import ModelConfig
from indirect_learning_pose_shape_tpu.ops.raster import RasterConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig = ModelConfig()
    synthetic: SyntheticConfig = SyntheticConfig()
    # Disk-data augmentation (mirror + crop jitter, data/augment.py);
    # applies to --dataset training, not the synthetic stream.
    augment: AugmentConfig = AugmentConfig()
    batch_size: int = 32
    learning_rate: float = 1e-4
    lr_schedule: str = "constant"  # 'constant' | 'cosine' (warmup + decay)
    warmup_steps: int = 200
    grad_clip_norm: float = 0.0  # 0 disables global-norm clipping
    weight_decay: float = 0.0  # 0 = plain Adam; >0 = AdamW
    num_steps: int = 1000
    seed: int = 0
    # Loss weights (SURVEY.md §2.7): render loss + keypoint loss + priors.
    # The j3d/v3d/rotmat/betas_l2 terms are DIRECT 3D supervision (losses.py)
    # — the genre's comparison axis against the reference's indirect-only
    # training. They default to 0 (pure indirect, reference-faithful) and are
    # enabled per run via --loss-weight j3d=... etc.; the synthetic stream
    # then emits its 3D ground truth as targets (train.make_batch), and npz
    # datasets may carry joints3d/verts3d/rotmats/betas keys.
    loss_weights: tuple = (
        ("sil_bce", 1.0),
        ("sil_iou", 1.0),
        ("part_ce", 1.0),
        ("kp", 5.0),
        ("shape_reg", 1e-3),
        ("pose_reg", 1e-3),
        ("j3d", 0.0),
        ("v3d", 0.0),
        ("rotmat", 0.0),
        ("betas_l2", 0.0),
    )
    # Data parallelism (BASELINE.json:11): number of mesh devices; None = all.
    num_devices: int | None = None
    # Spatially-parallel rendering (parallel/render_sp.py): shard the
    # raster's image rows over this many devices IN ADDITION to data
    # parallelism — the run mesh becomes 2-D (data, render) with
    # total devices = (num_devices or all) and data axis = total / render.
    # Zero forward communication (separable formulation); worthwhile at
    # ≥512² render sizes. 1 = off (plain 1-D data mesh).
    render_devices: int = 1
    # Synthetic-stream training only: run this many optimizer steps inside
    # ONE jit dispatch (lax.scan over the fused gen+step body — it is fully
    # on-device, so no host data is needed between steps). Identical math
    # to K single calls (step-indexed RNG; tested). Logging/checkpointing
    # move to chunk boundaries. Measured perf-NEUTRAL on the tunneled
    # single chip (async dispatch already pipelines chained steps:
    # 12.56 ms/step at k=1 vs 12.61 at k=8, b32) — the knob pays off when
    # the host cannot sustain one dispatch per step (slow/contended host,
    # high-latency control plane), not here. Default 1.
    steps_per_call: int = 1
    # Checkpointing (SURVEY.md §5): every N steps; 0 disables.
    checkpoint_every: int = 0
    checkpoint_dir: str = "/tmp/ilps_ckpt"
    # Metrics-write cadence (steps). Each write costs one batched D2H
    # fetch (~38 ms through the remote-chip tunnel) — ~3.8 ms/step
    # amortized at 10, ~0.8 at 50. Honored by all fit paths (synthetic
    # stream, --dataset, --image-dir).
    log_every: int = 10
    metrics_path: str | None = None  # JSONL per-step scalars
    tensorboard_dir: str | None = None  # TB event files (utils/metrics.py)
    # ImageNet-pretrained backbone npz (tools/import_resnet_weights.py);
    # None trains the encoder from scratch (SURVEY.md §2.4).
    pretrained: str | None = None
    # Mean-parameter file for IEF's Θ₀ (SURVEY.md §2.5: the reference loads
    # a mean-params file; npz with 'mean_theta' or bare .npy, shape-checked
    # in models/ief.load_mean_theta). None = the neutral stand-in.
    mean_params: str | None = None
    # Exponential moving average of the params for evaluation/serving
    # (Polyak averaging — beyond reference parity, standard production
    # practice). 0 disables; typical 0.999. The EMA tree rides TrainState
    # (updated in-graph each step, checkpointed with everything else) and
    # is selected at load time via load_model(..., ema=True) /
    # `--ema` on evaluate/predict. BN running stats are already
    # momentum-averaged and are not double-averaged here.
    ema_decay: float = 0.0

    @property
    def loss_weight_dict(self) -> dict[str, float]:
        return dict(self.loss_weights)


def _model(image_size: int, depth: int = 18, num_parts: int = 24) -> ModelConfig:
    return ModelConfig(
        image_size=image_size,
        # fold_bn_eval: deploy-time conv+BN fusion on the inference path
        # (models/encoder.py _conv_bn) — bf16-rounding-identical, tested.
        encoder=EncoderConfig(depth=depth, fold_bn_eval=True),
        ief=IEFConfig(),
        # Presets train with bf16 raster matmuls: a 1500-step A/B at 256²
        # (docs/DESIGN.md) shows PVE/PA-MPJPE/IoU statistically identical to
        # 3-pass f32 ('high', the library default kept for golden tests) at
        # ~9% faster steps — the soft render's own σ=2 blur dwarfs the
        # ~9e-3 score rounding.
        # train_score_dtype: the training render's [B,C,H,W] score tensor is
        # stored bf16 (written once, read twice per step; both loss
        # reductions accumulate f32) — one extra ~8e-3-relative rounding on
        # the same scale the matmul A/B validated. f32 remains the
        # RasterConfig default for golden tests.
        raster=RasterConfig(
            image_size=image_size,
            num_parts=num_parts,
            matmul_precision="default",
            train_score_dtype="bfloat16",
        ),
    )


# --- The five BASELINE configs (BASELINE.json:6-12) -------------------------

# Config 1: single 256² crop, encoder → SMPL params → LBS forward, batch 1
# (correctness + latency floor; runs on CPU).
CONFIG1_SINGLE = TrainConfig(model=_model(256), batch_size=1, num_steps=1)

# Config 2: batched SMPL forward + weak-perspective projection, batch 64.
CONFIG2_SMPL_BATCH = TrainConfig(model=_model(256), batch_size=64)

# Config 3: differentiable silhouette rendering at 256² with IoU/BCE, batch 32.
CONFIG3_RENDER = TrainConfig(
    model=_model(256),
    batch_size=32,
    loss_weights=(("sil_bce", 1.0), ("sil_iou", 1.0)),
)

# Config 4: full indirect train step on synthetic SMPL renders (the minimum
# end-to-end slice, SURVEY.md §7 step 6).
CONFIG4_FULL = TrainConfig(model=_model(256), batch_size=32)

# Config 5: data-parallel training on a mesh with on-device preprocessing +
# target-silhouette generation.
CONFIG5_DATA_PARALLEL = TrainConfig(model=_model(256), batch_size=64, num_devices=None)

# Larger flagship variant: ResNet-50 backbone + continuous 6D rotations.
CONFIG4_LARGE = TrainConfig(
    model=dataclasses.replace(
        _model(256, depth=50),
        ief=IEFConfig(rotation_format="rot6d"),
    ),
    batch_size=32,
)

# ResNet-34 + rot6d: the measured quality/throughput sweet spot at the
# synthetic-protocol training scale — ties config4_large on PVE/PA-MPJPE
# and beats it on keypoint error and part mIoU while training 1.46x
# faster (13.3 vs 19.3 ms/step at b32; BASELINE.md backbone row,
# 2026-08-19). The R50 flagship remains the capacity headroom choice for
# longer/harder training.
CONFIG4_R34 = TrainConfig(
    model=dataclasses.replace(
        _model(256, depth=34),
        ief=IEFConfig(rotation_format="rot6d"),
    ),
    batch_size=32,
)

# UP-S31-style 31-part body segmentation (the reference genre's finer label
# space, SURVEY.md §2.3/§0.1 item 3): 31 foreground classes + background.
# Vertex part ids beyond the SMPL-24 set come from the dataset's mask
# convention; with the synthetic asset the 24 SMPL parts simply occupy the
# first 24 of 31 channels.
# Peak-throughput operating point measured in BASELINE.md's batch-scaling
# table (b32 → b128 buys ~25% more images/sec/chip on the v5e): the same
# full config-4 step at the best batch. LR scaled with batch (linear rule).
CONFIG4_B128 = TrainConfig(model=_model(256), batch_size=128, learning_rate=4e-4)

# Mixed direct+indirect supervision at the measured-best recipe
# (BASELINE.md "Mixed supervision", 2026-08-19): the indirect losses plus
# metric-scale 3D terms (j3d/rotmat/betas_l2) on a 3D-labeled source —
# the synthetic stream emits its ground truth on device for free; disk
# npz datasets need joints3d/rotmats/betas keys
# (tools/make_synthetic_dataset.py --include-3d). shape_reg drops to 0:
# direct beta supervision replaces the mean-anchor prior. Scores PVE
# 0.0617 ±0.0005 at the 20k default (0.0752 at 5k) vs 0.0937 for the
# best pure-indirect recipe — the (scale, depth) ambiguity the indirect
# losses cannot see (plateau analysis, BASELINE.md) is resolved by
# supervision that carries metric scale. Unlike indirect training there
# is no horizon trade (every metric improves monotonically with steps),
# so the preset ships at the long horizon.
CONFIG4_MIXED = TrainConfig(
    model=dataclasses.replace(
        _model(256, depth=34),
        ief=IEFConfig(rotation_format="rot6d"),
    ),
    batch_size=32,
    learning_rate=3e-4,
    lr_schedule="cosine",
    grad_clip_norm=1.0,
    num_steps=20000,
    loss_weights=(
        ("sil_bce", 1.0),
        ("sil_iou", 1.0),
        ("part_ce", 1.0),
        ("kp", 5.0),
        ("shape_reg", 0.0),
        ("pose_reg", 1e-3),
        ("j3d", 5.0),
        ("v3d", 0.0),
        ("rotmat", 1.0),
        ("betas_l2", 0.02),
    ),
)

# The measured-best ROBUST recipe (BASELINE.md round 5 "mixed × hardapp"):
# config4_mixed's supervision (convention-free metric 3D + indirect) trained
# on renderer-independent z-buffer targets under full appearance
# randomization — the two highest-leverage robustness knobs combined. The
# 3-suite scores beside the specialists' rows are the preset's contract;
# costs ~0.11 s/step at b32 vs 0.013 soft (hard-target renderer;
# benchmarks/run_configs.py config7).
CONFIG4_ROBUST = dataclasses.replace(
    CONFIG4_MIXED,
    synthetic=SyntheticConfig(
        targets="hard",
        bg_mode="texture",
        color_jitter=0.08,
        shading=0.6,
        occluders=2,
    ),
)

# Mirror augmentation must know this label space: ids 1-24 follow SMPL,
# 25-31 are the synthetic stand-in's reserved midline ids (data/augment.py
# _PART_CONVENTIONS; a real UP-S31 palette needs 'custom' + part_lr_pairs).
CONFIG4_PARTS31 = TrainConfig(
    model=_model(256, num_parts=31),
    batch_size=32,
    augment=AugmentConfig(part_convention="s31-smpl-prefix"),
)

PRESETS = {
    "config1_single": CONFIG1_SINGLE,
    "config2_smpl_batch": CONFIG2_SMPL_BATCH,
    "config3_render": CONFIG3_RENDER,
    "config4_full": CONFIG4_FULL,
    "config4_b128": CONFIG4_B128,
    "config4_large": CONFIG4_LARGE,
    "config4_r34": CONFIG4_R34,
    "config4_mixed": CONFIG4_MIXED,
    "config4_robust": CONFIG4_ROBUST,
    "config4_parts31": CONFIG4_PARTS31,
    "config5_data_parallel": CONFIG5_DATA_PARALLEL,
}
