"""Pallas kernel vs XLA-path equivalence (interpret mode on CPU, SURVEY §4.2).

Every kernel must pass the same goldens as the pure-XLA function it replaces:
forward values and custom-VJP gradients are compared against the XLA path
(which itself is golden-tested against the numpy oracle in test_raster.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu.ops import raster


def _setup(rng, batch=2, num_verts=500, size=128, num_parts=8):
    verts2d = (rng.rand(batch, num_verts, 2) * size * 1.2 - 0.1 * size).astype(
        np.float32
    )
    labels = rng.randint(0, num_parts, size=num_verts)
    layout = raster.build_part_layout(labels, num_parts, lane=128)
    cfg = raster.RasterConfig(image_size=size, num_parts=num_parts, sigma=2.0)
    return jnp.asarray(verts2d), layout, cfg


def test_raster_pallas_forward_matches_xla(rng):
    verts2d, layout, cfg = _setup(rng)
    a = raster.raster_scores(verts2d, layout, cfg, impl="xla")
    b = raster.raster_scores(verts2d, layout, cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_raster_pallas_gradient_matches_xla(rng):
    verts2d, layout, cfg = _setup(rng, batch=1, num_verts=200)
    g_out = jnp.asarray(
        rng.randn(1, cfg.image_size**2, cfg.num_parts).astype(np.float32)
    )

    def loss(v, impl):
        return jnp.sum(raster.raster_scores(v, layout, cfg, impl=impl) * g_out)

    gx = jax.grad(lambda v: loss(v, "xla"))(verts2d)
    gp = jax.grad(lambda v: loss(v, "pallas"))(verts2d)
    scale = float(jnp.abs(gx).max()) + 1e-12
    np.testing.assert_allclose(
        np.asarray(gp) / scale, np.asarray(gx) / scale, atol=2e-5
    )


def test_raster_pallas_off_canvas_verts(rng):
    """Vertices far off-canvas must contribute nothing and get zero grads."""
    verts2d, layout, cfg = _setup(rng, batch=1, num_verts=100)
    far = verts2d.at[0, :50].set(5000.0)
    a = raster.raster_scores(far, layout, cfg, impl="xla")
    b = raster.raster_scores(far, layout, cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    g = jax.grad(lambda v: jnp.sum(raster.raster_scores(v, layout, cfg, impl="pallas")))(
        far
    )
    assert np.all(np.isfinite(np.asarray(g)))
    np.testing.assert_allclose(np.asarray(g[0, :50]), 0.0, atol=1e-6)


def test_raster_pallas_fallback_on_bad_shapes(rng):
    """Non-tileable image sizes silently use the XLA path (same results)."""
    verts2d, layout, _ = _setup(rng, size=128)
    cfg = raster.RasterConfig(image_size=96, num_parts=8, sigma=2.0)  # 96 % 128 != 0
    a = raster.raster_scores(verts2d, layout, cfg, impl="xla")
    b = raster.raster_scores(verts2d, layout, cfg, impl="pallas")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_lbs_pallas_matches_xla(tiny_asset, rng):
    """Fused blendshape+LBS kernel: forward + grads vs the XLA path."""
    from indirect_learning_pose_shape_tpu.models import smpl

    consts = smpl.smpl_consts(tiny_asset)
    pose = jnp.asarray(rng.randn(3, tiny_asset.num_joints * 3).astype(np.float32)) * 0.4
    betas = jnp.asarray(rng.randn(3, tiny_asset.num_betas).astype(np.float32))

    fx = lambda p, b: smpl.smpl_forward(consts, p, b, impl="xla")["verts"]
    fp = lambda p, b: smpl.smpl_forward(consts, p, b, impl="pallas")["verts"]
    np.testing.assert_allclose(
        np.asarray(fx(pose, betas)), np.asarray(fp(pose, betas)), atol=1e-5
    )
    gx = jax.grad(lambda p, b: jnp.sum(fx(p, b) ** 2), argnums=(0, 1))(pose, betas)
    gp = jax.grad(lambda p, b: jnp.sum(fp(p, b) ** 2), argnums=(0, 1))(pose, betas)
    for a, b in zip(gx, gp):
        scale = float(jnp.abs(a).max()) + 1e-9
        np.testing.assert_allclose(
            np.asarray(b) / scale, np.asarray(a) / scale, atol=1e-5
        )
