"""Encoder / IEF / full-network assembly tests (SURVEY.md §2.4-2.6)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu.models import encoder as enc
from indirect_learning_pose_shape_tpu.models import ief as ief_mod
from indirect_learning_pose_shape_tpu.models import network as net
import pytest


def small_model_cfg(image_size=48, num_parts=24):
    from indirect_learning_pose_shape_tpu.ops.raster import RasterConfig

    return net.ModelConfig(
        image_size=image_size,
        encoder=enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32),
        ief=ief_mod.IEFConfig(hidden_dims=(128,)),
        raster=RasterConfig(image_size=image_size, num_parts=num_parts, pixel_chunk=256),
    )


def test_encoder_shapes_and_state(rng):
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    params, state = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32))
    feat, new_state = enc.encoder_apply(params, state, x, cfg, train=True)
    assert feat.shape == (2, cfg.feature_dim)
    # BN running stats must move in train mode...
    stem = new_state["bn_stem"]["mean"]
    assert float(jnp.abs(stem - state["bn_stem"]["mean"]).max()) > 0
    # ...and stay frozen in eval mode.
    _, eval_state = enc.encoder_apply(params, state, x, cfg, train=False)
    assert float(jnp.abs(eval_state["bn_stem"]["mean"] - state["bn_stem"]["mean"]).max()) == 0


@pytest.mark.slow
def test_encoder_resnet50_bottleneck(rng):
    cfg = enc.EncoderConfig(depth=50, width=8, compute_dtype=jnp.float32)
    params, state = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feat, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    assert feat.shape == (1, cfg.feature_dim) and cfg.feature_dim == 8 * 8 * 4


def test_ief_starts_at_mean_theta():
    cfg = ief_mod.IEFConfig(hidden_dims=(64,), num_joints=4, num_betas=4, num_cam=3)
    mean = np.arange(cfg.theta_dim, dtype=np.float32) * 0.1
    params = ief_mod.ief_init(jax.random.PRNGKey(0), cfg, feature_dim=32, mean_theta=mean)
    feat = jnp.zeros((2, 32))
    theta = ief_mod.ief_apply(params, feat, cfg)
    # Final layer is near-zero-init, so output ≈ mean params at init.
    np.testing.assert_allclose(np.asarray(theta[0]), mean, atol=0.05)


def test_full_network_forward_and_train(tiny_asset, rng):
    cfg = small_model_cfg()
    params, state, consts = net.init(jax.random.PRNGKey(0), tiny_asset, cfg)
    images = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32))
    out, _ = jax.jit(
        lambda p, s, im: net.forward(p, s, consts, im, cfg)
    )(params, state, images)
    assert out["verts"].shape == (2, tiny_asset.num_verts, 3)
    assert out["kp2d"].shape == (2, 19, 2)
    assert out["theta"].shape == (2, 85)

    out_t, _ = jax.jit(
        lambda p, s, im: net.forward_train(p, s, consts, im, cfg)
    )(params, state, images)
    assert out_t["silhouette"].shape == (2, 48, 48)
    assert out_t["probs"].shape == (2, 48, 48, cfg.raster.num_parts + 1)


@pytest.mark.slow
def test_network_gradient_flows_to_encoder(tiny_asset, rng):
    """The indirect-learning property end to end: render loss moves conv weights."""
    cfg = small_model_cfg(image_size=32)
    params, state, consts = net.init(jax.random.PRNGKey(0), tiny_asset, cfg)
    images = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))

    def loss(p):
        out, _ = net.forward_train(p, state, consts, images, cfg)
        return jnp.mean(out["silhouette"])

    g = jax.grad(loss)(params)
    stem_g = np.asarray(g["encoder"]["stem"])
    assert np.all(np.isfinite(stem_g)) and np.abs(stem_g).max() > 0


def test_rot6d_to_rotmat_properties(rng):
    from indirect_learning_pose_shape_tpu.models import smpl

    # Identity encoding -> identity matrix.
    ident = jnp.array([1.0, 0, 0, 0, 1, 0])
    np.testing.assert_allclose(
        np.asarray(smpl.rot6d_to_rotmat(ident)), np.eye(3), atol=1e-6
    )
    # Random encodings -> valid rotations (orthonormal, det +1).
    x = jnp.asarray(rng.randn(16, 6).astype(np.float32))
    R = np.asarray(smpl.rot6d_to_rotmat(x))
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", R, R), np.broadcast_to(np.eye(3), (16, 3, 3)),
        atol=1e-5,
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)
    # Encoding built from a rotation's first two columns reproduces it.
    from indirect_learning_pose_shape_tpu.utils import oracle

    R0 = oracle.rodrigues(rng.randn(5, 3) * 0.7).astype(np.float32)
    enc6 = np.concatenate([R0[:, :, 0], R0[:, :, 1]], axis=-1)
    np.testing.assert_allclose(
        np.asarray(smpl.rot6d_to_rotmat(jnp.asarray(enc6))), R0, atol=1e-5
    )


@pytest.mark.slow
def test_network_rot6d_variant(tiny_asset, rng):
    """rot6d parameterization: forward shapes + a descending train step."""
    import dataclasses

    from indirect_learning_pose_shape_tpu import train
    from tests.test_train import tiny_train_cfg

    cfg = tiny_train_cfg()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, ief=dataclasses.replace(cfg.model.ief, rotation_format="rot6d")
        ),
    )
    ts, consts = train.init_state(cfg, tiny_asset)
    gen_fn, step_fn = train.compile_train_fns(cfg, consts)
    hist = []
    for _ in range(8):
        batch = gen_fn(ts.rng, ts.step)
        ts, terms = step_fn(ts, batch)
        hist.append(float(terms["total"]))
    assert np.isfinite(hist[-1])
    assert "pose_err" not in terms  # param-space error undefined across formats
    assert ts.params["ief"]["mean_theta"].shape == (24 * 6 + 10 + 3,)
