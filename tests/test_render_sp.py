"""Spatially-parallel rendering (parallel/render_sp.py) on the fake mesh.

Validates the three claims the module makes: outputs match the unsharded
rasterizer, the outputs actually carry the row sharding (not silently
replicated), and gradients through the row-sharded backward (whose dfx
reduction is an XLA-inserted all-reduce over 'render') match the
single-device gradient.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu import losses
from indirect_learning_pose_shape_tpu.ops import raster
from indirect_learning_pose_shape_tpu.parallel import render_sp


def _setup(rng, batch=4, num_verts=120, size=32, num_parts=6):
    labels = rng.randint(0, num_parts, size=num_verts)
    layout = raster.build_part_layout(labels, num_parts)
    cfg = raster.RasterConfig(image_size=size, num_parts=num_parts, sigma=2.0)
    verts2d = (rng.rand(batch, num_verts, 2) * size).astype(np.float32)
    return jnp.asarray(verts2d), layout, cfg


def test_spatial_render_matches_unsharded(rng):
    verts2d, layout, cfg = _setup(rng)
    mesh = render_sp.render_mesh(n_data=2, n_render=4)
    out = render_sp.rasterize_spatial(verts2d, layout, cfg, mesh)
    ref = raster.soft_rasterize(verts2d, layout, cfg)
    np.testing.assert_allclose(
        np.asarray(out["probs"]), np.asarray(ref["probs"]), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(out["silhouette"]), np.asarray(ref["silhouette"]), atol=1e-6
    )


def test_spatial_render_is_actually_sharded(rng):
    verts2d, layout, cfg = _setup(rng)
    mesh = render_sp.render_mesh(n_data=2, n_render=4)
    out = render_sp.rasterize_spatial(verts2d, layout, cfg, mesh)
    sil = out["silhouette"]  # [B, H, W]
    assert not sil.sharding.is_fully_replicated
    # Each device holds a [B/2, H/4, W] row block.
    shard_shape = sil.sharding.shard_shape(sil.shape)
    assert shard_shape == (sil.shape[0] // 2, sil.shape[1] // 4, sil.shape[2])


def test_spatial_grad_matches_single_device(rng):
    verts2d, layout, cfg = _setup(rng, batch=2)
    mesh = render_sp.render_mesh(n_data=2, n_render=4)
    target = jnp.asarray((rng.rand(2, 32, 32) > 0.5).astype(np.float32))

    loss_sp, grad_sp = render_sp.spatial_render_loss_grad(
        verts2d, target, layout, cfg, mesh
    )

    def loss_fn(v):
        out = raster.soft_rasterize(v, layout, cfg)
        return losses.silhouette_bce(out["silhouette"], target)

    loss_ref, grad_ref = jax.value_and_grad(loss_fn)(verts2d)
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grad_sp), np.asarray(grad_ref), atol=1e-5
    )


def test_indivisible_rows_rejected(rng):
    verts2d, layout, cfg = _setup(rng, size=30)  # 30 % 4 != 0
    mesh = render_sp.render_mesh(n_data=2, n_render=4)
    with pytest.raises(ValueError, match="divisible"):
        render_sp.rasterize_spatial(verts2d, layout, cfg, mesh)


@pytest.mark.slow
def test_sp_train_step_matches_data_parallel(tiny_asset):
    """A full fused TRAIN step on the 2x4 ('data','render') mesh — both
    renders row-sharded via TrainConfig.render_devices — produces the same
    loss as the 1-D 8-device data-parallel step (VERDICT r2 next #4).
    f32 tolerance: reduction orders differ across shardings."""
    import dataclasses

    from indirect_learning_pose_shape_tpu import train
    from tests.test_train import tiny_train_cfg

    base = tiny_train_cfg(image_size=32, batch_size=8)

    def one_step(cfg):
        ts, consts = train.init_state(cfg, tiny_asset)
        mesh = train._auto_mesh(cfg)
        assert mesh is not None
        from indirect_learning_pose_shape_tpu.parallel import mesh as mesh_lib

        ts = mesh_lib.replicate_pytree(ts, mesh)
        consts = mesh_lib.replicate_pytree(consts, mesh)
        fused = train.compile_fused_step(cfg, consts, mesh)
        ts2, terms = fused(ts)
        return mesh, ts2, terms

    sp_cfg = dataclasses.replace(base, render_devices=4, num_devices=8)
    mesh_sp, ts_sp, terms_sp = one_step(sp_cfg)
    assert set(mesh_sp.axis_names) == {"data", "render"}
    assert mesh_sp.shape["render"] == 4 and mesh_sp.shape["data"] == 2

    dp_cfg = dataclasses.replace(base, num_devices=8)
    mesh_dp, ts_dp, terms_dp = one_step(dp_cfg)
    assert mesh_dp.axis_names == ("data",)

    np.testing.assert_allclose(
        float(terms_sp["total"]), float(terms_dp["total"]), rtol=2e-3
    )
    # Params after the step agree too (same grads up to reduction order).
    d = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), ts_sp.params, ts_dp.params
    )
    assert max(jax.tree.leaves(d)) < 5e-3


@pytest.mark.slow
def test_sp_mesh_validation():
    import dataclasses

    from indirect_learning_pose_shape_tpu import train
    from tests.test_train import tiny_train_cfg

    base = tiny_train_cfg(image_size=32, batch_size=8)
    with pytest.raises(ValueError, match="not divisible by render_devices"):
        train._auto_mesh(dataclasses.replace(base, render_devices=3, num_devices=8))
    with pytest.raises(ValueError, match="not divisible by the data axis"):
        train._auto_mesh(
            dataclasses.replace(
                base, render_devices=2, num_devices=8, batch_size=6
            )
        )


def test_hard_raster_sp_matches_and_shards(rng):
    """Hard z-buffer targets compose with the 'render' mesh axis: the
    constrained render bit-matches the unconstrained one and its outputs
    actually carry the row sharding (regression: the hard path used to
    ignore `constrain` and silently replicate target generation)."""
    from indirect_learning_pose_shape_tpu.ops import raster_hard as rh
    from indirect_learning_pose_shape_tpu.utils import assets

    asset = assets.synthetic_asset(num_verts=864)
    hc = rh.build_hard_consts(asset.faces, asset.part_labels())
    batch, size = 2, 64
    v = asset.v_template[None] + 0.02 * rng.randn(
        batch, *asset.v_template.shape
    ).astype(np.float32)
    v2d = jnp.asarray(
        ((v[..., :2] / (np.abs(v[..., :2]).max() + 0.3)) + 1.0)
        * 0.5
        * (size - 1),
        jnp.float32,
    )
    vz = jnp.asarray(v[..., 2], jnp.float32)

    mesh = render_sp.render_mesh(n_data=2, n_render=4)
    constrain = render_sp.constrainer(mesh)
    sp = jax.jit(
        lambda a, b: rh.hard_raster(
            a, b, hc, size, with_shade=True, constrain=constrain
        )
    )(v2d, vz)
    ref = jax.jit(lambda a, b: rh.hard_raster(a, b, hc, size, with_shade=True))(
        v2d, vz
    )

    for k in ("part_labels", "silhouette", "shade"):
        np.testing.assert_array_equal(np.asarray(sp[k]), np.asarray(ref[k]))
    sil = sp["silhouette"]  # [B, S, S]
    assert not sil.sharding.is_fully_replicated
    assert sil.sharding.shard_shape(sil.shape) == (
        batch // 2,
        size // 4,
        size,
    )
