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
def test_encoder_resnet34_basic_blocks(rng):
    """Depth 34: (3,4,6,3) BASIC blocks (not bottleneck), feature_dim 8*width."""
    cfg = enc.EncoderConfig(depth=34, width=8, compute_dtype=jnp.float32)
    params, state = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    assert "conv3" not in params["s0b0"]  # basic, not bottleneck
    assert sum(1 for k in params if k.startswith("s") and k[1].isdigit()) == 3 + 4 + 6 + 3
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feat, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    assert feat.shape == (1, cfg.feature_dim) and cfg.feature_dim == 8 * 8


@pytest.mark.slow
def test_encoder_resnet50_bottleneck(rng):
    cfg = enc.EncoderConfig(depth=50, width=8, compute_dtype=jnp.float32)
    params, state = enc.encoder_init(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    feat, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    assert feat.shape == (1, cfg.feature_dim) and cfg.feature_dim == 8 * 8 * 4


def test_stride2_s2d_matches_strided(rng):
    """The s2d rewrite of stride-2 convs is the same function as strided.

    Checked at the op level where f32 roundoff is the only noise source:
    forward and input/weight gradients for both the 3x3 and 1x1 stride-2
    forms. (A full-encoder train-mode gradient comparison is NOT a valid
    equivalence test at f32 — the ~1e-6 reassociation roundoff gets
    chaotically amplified through batch-stat BN and ReLU gate flips into
    percent-scale gradient differences; the same comparison in f64 agrees
    to ~1e-12.) Weights stay in their logical [k,k,Cin,Cout] layout, so
    checkpoint/pretrained compatibility is structural.
    """
    for h, k, cin, cout in ((8, 3, 16, 24), (2, 3, 16, 8), (8, 1, 16, 24)):
        x = jnp.asarray(rng.randn(2, h, h, cin).astype(np.float32))
        w = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32) * 0.1)
        a = enc._conv(x, w, 2)
        b = enc._conv2(x, w, 2, "s2d")
        assert a.shape == b.shape
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=5e-5
        )
        ga = jax.grad(lambda x, w: jnp.sum(enc._conv(x, w, 2) ** 2), (0, 1))(x, w)
        gb = jax.grad(lambda x, w: jnp.sum(enc._conv2(x, w, 2, "s2d") ** 2), (0, 1))(x, w)
        for la, lb in zip(ga, gb):
            scale = float(jnp.abs(la).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(la) / scale, np.asarray(lb) / scale, rtol=0, atol=1e-5
            )

    # Full-encoder eval-mode forward (running-stat BN: no chaotic
    # amplification) and the odd-size per-conv strided fallback.
    cfg_a = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    cfg_b = dataclasses.replace(cfg_a, stride2_impl="s2d")
    params, state = enc.encoder_init(jax.random.PRNGKey(3), cfg_a)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    fa, _ = enc.encoder_apply(params, state, x, cfg_a, train=False)
    fb, _ = enc.encoder_apply(params, state, x, cfg_b, train=False)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=0, atol=2e-5)
    x_odd = jnp.asarray(rng.randn(1, 27, 27, 3).astype(np.float32))
    fo, _ = enc.encoder_apply(params, state, x_odd, cfg_b, train=False)
    assert fo.shape == (1, cfg_b.feature_dim)


def test_conv1x1_dot_matches_conv(rng):
    """conv1x1='dot' (rank-4 dot_general) is the same function as the 1x1
    conv, at both strides — op-level forward + input/weight grads (f32
    roundoff only; see test_stride2_s2d_matches_strided's note on why
    train-mode full-net comparison is invalid), then a full R50 eval-mode
    forward where the bottleneck blocks exercise every 1x1 call site."""
    for h, stride in ((8, 1), (8, 2), (7, 2)):
        x = jnp.asarray(rng.randn(2, h, h, 16).astype(np.float32))
        w = jnp.asarray(rng.randn(1, 1, 16, 24).astype(np.float32) * 0.1)
        a = enc._conv(x, w, stride)
        b = enc._conv2(x, w, stride, "strided", "dot")
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=5e-5)
        ga = jax.grad(lambda x, w: jnp.sum(enc._conv(x, w, stride) ** 2), (0, 1))(x, w)
        gb = jax.grad(
            lambda x, w: jnp.sum(enc._conv2(x, w, stride, "strided", "dot") ** 2),
            (0, 1),
        )(x, w)
        for la, lb in zip(ga, gb):
            scale = float(jnp.abs(la).max()) + 1e-9
            np.testing.assert_allclose(
                np.asarray(la) / scale, np.asarray(lb) / scale, rtol=0, atol=1e-5
            )

    cfg_a = enc.EncoderConfig(depth=50, width=8, compute_dtype=jnp.float32)
    cfg_b = dataclasses.replace(cfg_a, conv1x1="dot")
    params, state = enc.encoder_init(jax.random.PRNGKey(3), cfg_a)
    x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
    fa, _ = enc.encoder_apply(params, state, x, cfg_a, train=False)
    fb, _ = enc.encoder_apply(params, state, x, cfg_b, train=False)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), rtol=0, atol=2e-5)


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


def test_maxpool_mask_grad_matches_xla(rng):
    """Mask-form max-pool backward == select_and_scatter autodiff on
    tie-free input (continuous f32 random: exact within-window equality has
    measure zero). Tie semantics differ by design — see _max_pool_mask."""
    x = jnp.asarray(rng.randn(2, 16, 20, 8).astype(np.float32))
    g = jnp.asarray(rng.randn(2, 8, 10, 8).astype(np.float32))
    y_mask, vjp_mask = jax.vjp(enc._max_pool_mask, x)
    y_ref, vjp_ref = jax.vjp(enc._max_pool_ref, x)
    np.testing.assert_array_equal(np.asarray(y_mask), np.asarray(y_ref))
    np.testing.assert_allclose(
        np.asarray(vjp_mask(g)[0]), np.asarray(vjp_ref(g)[0]), atol=1e-6
    )


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


def test_mean_params_import_roundtrip(tiny_asset, tmp_path):
    """--mean-params loads a real Θ₀ into IEF (SURVEY.md §2.5; VERDICT r2
    missing #2): roundtrip npz + npy, shape validation, and the loaded mean
    drives the zero-init IEF's first iterate."""
    import dataclasses

    import numpy as np

    from indirect_learning_pose_shape_tpu import train
    from indirect_learning_pose_shape_tpu.models import ief as ief_mod
    from tests.test_train import tiny_train_cfg

    cfg = tiny_train_cfg()
    theta = np.linspace(-0.4, 0.6, cfg.model.ief.theta_dim).astype(np.float32)
    npz = str(tmp_path / "mean.npz")
    np.savez(npz, mean_theta=theta)

    ts, _ = train.init_state(
        dataclasses.replace(cfg, mean_params=npz), asset=tiny_asset
    )
    np.testing.assert_array_equal(np.asarray(ts.params["ief"]["mean_theta"]), theta)

    npy = str(tmp_path / "mean.npy")
    np.save(npy, theta)
    loaded = ief_mod.load_mean_theta(npy, cfg.model.ief)
    np.testing.assert_array_equal(np.asarray(loaded), theta)

    # Wrong layout refused loudly (e.g. a rot6d file on an axis-angle run).
    bad = str(tmp_path / "bad.npz")
    np.savez(bad, mean_theta=np.zeros(7, np.float32))
    with pytest.raises(ValueError, match="theta_dim"):
        ief_mod.load_mean_theta(bad, cfg.model.ief)
    wrongkey = str(tmp_path / "wk.npz")
    np.savez(wrongkey, theta=theta)
    with pytest.raises(ValueError, match="mean_theta"):
        ief_mod.load_mean_theta(wrongkey, cfg.model.ief)


def test_fold_bn_eval_matches_unfused():
    """Eval-path conv+BN folding is the same function: f32 agreement is
    tight; bf16 agreement is at bf16 rounding scale."""
    rng = np.random.RandomState(0)
    for dtype, tol in ((jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)):
        cfg = enc.EncoderConfig(depth=18, compute_dtype=dtype)
        params, state = enc.encoder_init(jax.random.PRNGKey(0), cfg)
        # Non-trivial running stats so the fold actually has work to do.
        state = jax.tree.map(
            lambda x: x + jnp.asarray(rng.rand(*x.shape), x.dtype) * 0.3, state
        )
        x = jnp.asarray(rng.randn(2, 32, 32, 3).astype(np.float32))
        ref, _ = enc.encoder_apply(params, state, x, cfg, train=False)
        folded_cfg = dataclasses.replace(cfg, fold_bn_eval=True)
        out, _ = enc.encoder_apply(params, state, x, folded_cfg, train=False)
        err = float(jnp.max(jnp.abs(out - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert err < tol, (dtype, err)
        # Training path ignores the flag entirely (batch stats, no fold).
        t1, s1 = enc.encoder_apply(params, state, x, cfg, train=True)
        t2, s2 = enc.encoder_apply(params, state, x, folded_cfg, train=True)
        np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_batch_norm_single_pass_stats():
    """Single-pass E[x²]−E[x]² variance matches two-pass numpy var in f32."""
    rng = np.random.RandomState(1)
    x = jnp.asarray((rng.randn(4, 8, 8, 16) * 3 + 50).astype(np.float32))
    p = {"scale": jnp.full((16,), 1.3), "bias": jnp.full((16,), 0.2)}
    s = {"mean": jnp.zeros((16,)), "var": jnp.ones((16,))}
    y, ns = enc._batch_norm(x, p, s, train=True, momentum=0.9, eps=1e-5)
    xn = np.asarray(x)
    mean = xn.mean((0, 1, 2))
    var = xn.var((0, 1, 2))
    # Large mean (50) vs small var (9): the cancellation-prone regime.
    np.testing.assert_allclose(
        np.asarray(ns["var"]), 0.9 * 1.0 + 0.1 * var, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(ns["mean"]), 0.1 * mean, rtol=1e-5, atol=1e-5
    )
    ref = (xn - mean) / np.sqrt(var + 1e-5) * 1.3 + 0.2
    np.testing.assert_allclose(np.asarray(y), ref, atol=2e-3)
