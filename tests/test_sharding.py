"""Data-parallel mesh tests on 8 fake CPU devices (SURVEY.md §4.4, config 5)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu import train
from indirect_learning_pose_shape_tpu.parallel import mesh as mesh_lib
from tests.test_train import tiny_train_cfg
import pytest


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8, "conftest must provide 8 fake CPU devices"


@pytest.mark.slow
def test_mesh_train_step_runs(tiny_asset):
    cfg = tiny_train_cfg(batch_size=8)
    ts, consts = train.init_state(cfg, tiny_asset)
    mesh = mesh_lib.make_mesh()
    ts = mesh_lib.replicate_pytree(ts, mesh)
    consts = mesh_lib.replicate_pytree(consts, mesh)
    gen_fn, step_fn = train.compile_train_fns(cfg, consts, mesh)
    batch = gen_fn(ts.rng, ts.step)
    # Batch leaves must actually be sharded over the data axis.
    sh = batch["image"].sharding
    assert sh.is_fully_replicated is False
    ts, terms = step_fn(ts, batch)
    assert np.isfinite(float(terms["total"]))
    # Params stay replicated after the step (grad all-reduce was inserted).
    leaf = jax.tree.leaves(ts.params)[0]
    assert leaf.sharding.is_fully_replicated


@pytest.mark.slow
def test_sharded_matches_single_device(tiny_asset):
    """Same seed, same loss on a 1-device and an 8-device mesh (up to f32 reduce order)."""
    cfg = tiny_train_cfg(batch_size=8)

    def first_loss(mesh):
        ts, consts = train.init_state(cfg, tiny_asset)
        if mesh is not None:
            ts = mesh_lib.replicate_pytree(ts, mesh)
            consts = mesh_lib.replicate_pytree(consts, mesh)
        gen_fn, step_fn = train.compile_train_fns(cfg, consts, mesh)
        batch = gen_fn(ts.rng, ts.step)
        _, terms = step_fn(ts, batch)
        return float(terms["total"])

    l1 = first_loss(None)
    l8 = first_loss(mesh_lib.make_mesh())
    np.testing.assert_allclose(l1, l8, rtol=1e-3)


def test_mesh_scaling_batch_shapes(tiny_asset):
    """Global batch stays global; per-device shards are batch/num_devices."""
    cfg = tiny_train_cfg(batch_size=16)
    ts, consts = train.init_state(cfg, tiny_asset)
    mesh = mesh_lib.make_mesh(4)
    ts = mesh_lib.replicate_pytree(ts, mesh)
    consts = mesh_lib.replicate_pytree(consts, mesh)
    gen_fn, _ = train.compile_train_fns(cfg, consts, mesh)
    batch = gen_fn(ts.rng, ts.step)
    assert batch["image"].shape[0] == 16
    shard_shapes = {s.data.shape[0] for s in batch["image"].addressable_shards}
    assert shard_shapes == {4}


@pytest.mark.parametrize("impl", ["int8", "int8c"])
def test_int8_serving_sharded_matches_single(tiny_asset, impl):
    """Multi-chip int8 serving: quantized_forward over a data mesh with a
    batch-sharded input equals the single-device result (params/qparams
    replicated, XLA partitions the int8 convs) — for both the per-site and
    the deployed carried-activation scheme."""
    from indirect_learning_pose_shape_tpu.data import synthetic
    from indirect_learning_pose_shape_tpu.models import quantize as quant

    cfg = tiny_train_cfg(batch_size=8)
    ts, consts = train.init_state(cfg, tiny_asset)
    batch = jax.jit(lambda k: synthetic.generate_batch(k, 8, consts, cfg.model))(
        jax.random.PRNGKey(3)
    )
    qparams = quant.ptq_quantize(
        ts.params["encoder"], ts.model_state["encoder"], cfg.model.encoder,
        batch["image"],
    )

    def fwd(qp, ip, im):
        return quant.quantized_forward(qp, ip, consts, im, cfg.model, impl=impl)

    single = jax.jit(fwd)(qparams, ts.params["ief"], batch["image"])

    mesh = mesh_lib.make_mesh()
    qp_r = mesh_lib.replicate_pytree(qparams, mesh)
    ip_r = mesh_lib.replicate_pytree(ts.params["ief"], mesh)
    im_s = jax.device_put(batch["image"], mesh_lib.batch_sharding(mesh))
    sharded = jax.jit(fwd)(qp_r, ip_r, im_s)

    assert {s.data.shape[0] for s in sharded["verts"].addressable_shards} == {1}
    np.testing.assert_allclose(
        np.asarray(single["kp2d"]), np.asarray(sharded["kp2d"]), rtol=2e-3, atol=2e-3
    )


@pytest.mark.slow
def test_fused_step_sharded(tiny_asset):
    """Single-graph gen+train step runs sharded and keeps params replicated."""
    cfg = tiny_train_cfg(batch_size=8)
    ts, consts = train.init_state(cfg, tiny_asset)
    mesh = mesh_lib.make_mesh()
    ts = mesh_lib.replicate_pytree(ts, mesh)
    consts = mesh_lib.replicate_pytree(consts, mesh)
    fused = train.compile_fused_step(cfg, consts, mesh)
    ts, terms = fused(ts)
    ts, terms = fused(ts)
    assert np.isfinite(float(terms["total"]))
    assert jax.tree.leaves(ts.params)[0].sharding.is_fully_replicated
    assert int(ts.step) == 2
