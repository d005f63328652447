"""Serialized-model export: the TPU-native deployment story (SURVEY.md
§2.11/§2.12 — the reference ships Keras .hdf5 weights plus Python graph
code; the rebuild ships ONE self-contained StableHLO artifact).

`jax.export` lowers the jitted inference forward — preprocessed image in,
(theta, verts, kp2d) out — to StableHLO with the trained parameters baked
in as constants, serialized to portable bytes. A serving host deserializes
with `jax.export.deserialize(...)` and calls it like a function — no model
code, no Python package, no pickle — and one artifact can embed lowerings
for several platforms (tpu/cpu/cuda), checked at call time.

CLI front-end: tools/export_model.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from indirect_learning_pose_shape_tpu import configs
from indirect_learning_pose_shape_tpu.models import network as net


def export_forward(
    cfg: configs.TrainConfig,
    params,
    state,
    consts,
    batch: int,
    platforms=None,
) -> bytes:
    """Serialize the inference forward with weights baked in. Returns bytes.

    The artifact uses the pure-XLA SMPL implementation: Pallas kernels are
    backend-time specializations that cannot lower into a portable
    multi-platform StableHLO module, and the XLA path is golden-equivalent
    (tests/test_kernels.py). The rasterizer needs no pin — the inference
    forward never rasterizes (training-only supervision machinery).
    """
    import dataclasses

    from jax import export as jax_export

    size = cfg.model.image_size
    model_cfg = dataclasses.replace(cfg.model, smpl_impl="xla")

    def forward(images):
        outputs, _ = net.forward(params, state, consts, images, model_cfg, train=False)
        return outputs["theta"], outputs["verts"], outputs["kp2d"]

    spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    exp = jax_export.export(
        jax.jit(forward),
        platforms=platforms or ["tpu", "cpu"],
    )(spec)
    return exp.serialize()


def export_forward_int8(
    cfg: configs.TrainConfig,
    params,
    state,
    consts,
    batch: int,
    calib_images,
    platforms=None,
    impl: str = "int8c",
) -> bytes:
    """Serialize the int8-PTQ inference forward (models/quantize.py).

    Quantizes the encoder against `calib_images` (per-channel int8 weights,
    calibrated per-tensor activation scales), bakes the int8 weights + f32
    scales in as constants, and exports images -> (theta, verts, kp2d).
    Defaults to platforms=['tpu'] only — the int8 convs target the MXU's
    double-rate int8 path; pass platforms=['tpu', 'cpu'] for a portable
    artifact (XLA:CPU lowers int8 too, just without the rate win).
    impl defaults to 'int8c' — the carried-activation scheme that is the
    measured end-to-end win (BASELINE.md §serving); 'int8' selects the
    per-site scheme (f32 activations between convs).
    """
    import dataclasses

    from jax import export as jax_export

    from indirect_learning_pose_shape_tpu.models import quantize as q

    size = cfg.model.image_size
    model_cfg = dataclasses.replace(cfg.model, smpl_impl="xla")
    qparams = q.ptq_quantize(
        params["encoder"], state["encoder"], model_cfg.encoder, calib_images
    )

    def forward(images):
        out = q.quantized_forward(
            qparams, params["ief"], consts, images, model_cfg, impl=impl
        )
        return out["theta"], out["verts"], out["kp2d"]

    spec = jax.ShapeDtypeStruct((batch, size, size, 3), jnp.float32)
    exp = jax_export.export(
        jax.jit(forward),
        platforms=platforms or ["tpu"],
    )(spec)
    return exp.serialize()


def load_exported(blob: bytes):
    """Deserialize an exported artifact; returns a callable(images)."""
    return jax.export.deserialize(bytearray(blob)).call
