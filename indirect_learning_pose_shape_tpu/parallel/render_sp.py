"""Spatially-parallel soft rasterization over a 2-D ('data', 'render') mesh.

Beyond data parallelism (parallel/mesh.py), the rasterizer has one more
shardable axis with real scale-out value: the IMAGE ROWS. The separable
formulation (ops/raster.py) makes this free to express — the per-class
score image is `fyᵀ @ fx` with the contraction over the vertex-segment dim,
so sharding fy's row dim over a 'render' mesh axis yields a row-sharded
score image with ZERO forward communication (each shard computes its row
block from the tiny replicated vertex factors); the only collective is the
backward's dfx all-reduce, inserted by XLA from the sharding annotations.
This is sequence-parallelism's image analogue: at 256² one chip is faster
alone (the collective isn't worth 0.8 ms of matmul), but at 1024²+ —
full-frame multi-person rendering, dense part maps — HBM for the
[B, C, H, W] score tensor (e.g. 3.2 GB at B=8, C=24, 1024²) and the O(H·W)
matmul flops split across the axis.

Usage (composes with data parallelism — batch over 'data', rows over
'render'):

    mesh = render_mesh(n_data=2, n_render=4)
    out = rasterize_spatial(verts2d, layout, cfg, mesh)   # jitted inside

Reference parity note: the reference has no parallelism of any kind
(SURVEY.md §2); this module is part of the rebuild's TPU-native scale-out
surface, validated on the virtual CPU mesh like the rest of parallel/.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from indirect_learning_pose_shape_tpu.ops import raster

DATA_AXIS = "data"
RENDER_AXIS = "render"


def render_mesh(
    n_data: int, n_render: int, devices=None
) -> Mesh:
    """2-D ('data', 'render') mesh over the first n_data*n_render devices."""
    if devices is None:
        devices = jax.devices()
    need = n_data * n_render
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_render)
    return Mesh(arr, (DATA_AXIS, RENDER_AXIS))


def constrainer(mesh: Mesh):
    """The sharding hook ops/raster.py applies inside the separable path.

    Public: train.py threads this through the fused train step when the run
    mesh carries a 'render' axis (TrainConfig.render_devices > 1), making
    spatially-parallel rendering a *training* capability, not just the
    standalone rasterize_spatial below.
    """

    specs = {
        # fy [B, C, S, H]: rows sharded; each render shard builds only its
        # own row block's Gaussian factors.
        "fy": P(DATA_AXIS, None, None, RENDER_AXIS),
        # fx [B, C, S, W]: replicated over 'render' (every row block needs
        # all columns).
        "fx": P(DATA_AXIS),
        # score [B, C, H, W]: rows sharded — the layout everything
        # downstream (normalization, losses) propagates.
        "score_bchw": P(DATA_AXIS, None, RENDER_AXIS, None),
        # Hard z-buffer raster (ops/raster_hard.py): the [B, nt, tile²]
        # scan carries, ty-major tile order ⇒ contiguous nt blocks are
        # row bands, and the detiled [B, S, S] outputs (same bands).
        "tiles_bnt": P(DATA_AXIS, RENDER_AXIS, None),
        "image_bhw": P(DATA_AXIS, RENDER_AXIS, None),
    }

    def constrain(name: str, x: jax.Array) -> jax.Array:
        return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, specs[name]))

    return constrain


def rasterize_spatial(
    verts2d: jax.Array,
    layout: raster.PartLayout,
    cfg: raster.RasterConfig,
    mesh: Mesh,
    donate: bool = False,
) -> dict[str, jax.Array]:
    """Row-sharded soft rasterization. Returns the soft_rasterize dict with
    probs/silhouette sharded (batch over 'data', image rows over 'render').

    Requires cfg.image_size divisible by the render-axis size. Jits on
    first call per (shape, cfg, mesh) — reuse the mesh object across calls.
    """
    n_render = mesh.shape[RENDER_AXIS]
    if cfg.image_size % n_render:
        raise ValueError(
            f"image_size {cfg.image_size} not divisible by render axis {n_render}"
        )
    fn = _compiled(cfg, mesh)
    return fn(verts2d, layout)


# Bounded jit cache keyed by (cfg, mesh); layout/verts are traced arguments,
# so jax.jit's own cache handles shape changes within one entry. The bound
# keeps a long-lived process sweeping over RasterConfigs/meshes from pinning
# every compiled executable forever.
@functools.lru_cache(maxsize=16)
def _compiled(cfg, mesh):
    constrain = constrainer(mesh)

    @jax.jit
    def run(verts2d, layout):
        v = jax.lax.with_sharding_constraint(
            verts2d, NamedSharding(mesh, P(DATA_AXIS))
        )
        return raster.soft_rasterize(v, layout, cfg, constrain=constrain)

    return run


def spatial_render_loss_grad(
    verts2d: jax.Array,
    target_sil: jax.Array,
    layout: raster.PartLayout,
    cfg: raster.RasterConfig,
    mesh: Mesh,
):
    """d(BCE loss)/d(verts2d) through the row-sharded render (the backward
    exercises the XLA-inserted dfx all-reduce over the render axis).
    Returns (loss, grad) with grad sharded over 'data' only."""
    from indirect_learning_pose_shape_tpu import losses

    constrain = constrainer(mesh)

    @jax.jit
    def run(v, t):
        v = jax.lax.with_sharding_constraint(v, NamedSharding(mesh, P(DATA_AXIS)))

        def loss_fn(v):
            out = raster.soft_rasterize(v, layout, cfg, constrain=constrain)
            return losses.silhouette_bce(out["silhouette"], t)

        return jax.value_and_grad(loss_fn)(v)

    return run(verts2d, target_sil)
