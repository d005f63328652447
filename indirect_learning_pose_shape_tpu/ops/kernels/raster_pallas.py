"""Pallas TPU kernel for the soft rasterizer (SURVEY.md §7 step 8b).

Same math as ops/raster.py (sum-of-Gaussians over a class-sorted vertex
layout, see that module's spec); this kernel buys what the XLA path cannot
express:

1. **Block culling.** The Gaussian has effectively finite support
   (exp(-d²/2σ²) underflows past ~6σ). Per-block bounding boxes are
   precomputed once in XLA and prefetched into SMEM as scalars; each
   (16, 128)-pixel tile skips a whole 128-vertex block with a cheap scalar
   test + `@pl.when` (the VPU work is actually skipped, not masked).
   Class-padding sentinels live at 1e6, so padded blocks cull themselves —
   padding costs nothing here.
2. **Flash-style fusion.** The [pixels, verts] Gaussian tile lives only in
   VMEM; forward accumulates straight into the output block (resident across
   the vertex loop) and the custom VJP recomputes e on the fly (no residuals
   but the vertex positions), with the same culling.
   Gradients: dL/dv = (Σ_p g·e·p − v·Σ_p g·e)/σ².
3. **Cancellation-free gradients.** The VJP reduces Σ_p g·e·dx directly
   (dx = p − v is the small quantity), avoiding the catastrophic
   cancellation of the algebraically equal Σ g·e·p − v·Σ g·e form.

Layouts: vertices channel-first [B, 2, N] (N lanes), scores channel-first
[B, C, H, W] (pixel tiles on the (sublane, lane) dims), both chosen so every
array's minor dim is 128-aligned. Requires H % 16 == 0, W % 128 == 0 and
S % 128 == 0; callers fall back to the XLA path otherwise.

On non-TPU backends the kernel runs in interpreter mode (tests compare it
against the XLA path and the numpy oracle).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from indirect_learning_pose_shape_tpu.ops import raster as raster_lib

_TH = 16  # pixel tile height (sublanes)
_TW = 128  # pixel tile width (lanes)
_KV = 128  # vertices per block (lanes)


def _num_cutoff(sigma: float, cutoff_sigmas: float = 6.0) -> float:
    # exp(-d²/2σ²) < 1.5e-8 beyond 6σ — below f32 meaningful contribution.
    return cutoff_sigmas * sigma


def _pixel_coords(ty, tx):
    y0 = (ty * _TH).astype(jnp.float32)
    x0 = (tx * _TW).astype(jnp.float32)
    py = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW, 1), 0).astype(jnp.float32) + y0
    px = jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW, 1), 1).astype(jnp.float32) + x0
    return px, py, x0, y0


def _hit(bbox_ref, kv, x0, y0, cut):
    """Scalar tile-vs-block overlap test from SMEM bbox (minx,maxx,miny,maxy)."""
    xlo, xhi = x0 - cut, x0 + (_TW - 1) + cut
    ylo, yhi = y0 - cut, y0 + (_TH - 1) + cut
    return (
        (bbox_ref[0, kv, 0] <= xhi)
        & (bbox_ref[0, kv, 1] >= xlo)
        & (bbox_ref[0, kv, 2] <= yhi)
        & (bbox_ref[0, kv, 3] >= ylo)
    )


def _fwd_kernel(bbox_ref, verts_ref, out_ref, *, C, S, sigma, cutoff):
    """Grid (B, H/TH, W/TW). bbox [1,nblk,4] SMEM; verts [1,2,N] VMEM;
    out [1, C, TH, TW] accumulated in-place per channel."""
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    cut = _num_cutoff(sigma, cutoff)
    px, py, x0, y0 = _pixel_coords(ty, tx)

    nblk = S // _KV
    for c in range(C):  # static unroll: channel index is compile-time
        out_ref[0, c] = jnp.zeros((_TH, _TW), jnp.float32)

        def body(j, _, c=c):
            kv = c * nblk + j

            @pl.when(_hit(bbox_ref, kv, x0, y0, cut))
            def _():
                vx = verts_ref[0, 0, pl.ds(kv * _KV, _KV)].reshape(1, 1, _KV)
                vy = verts_ref[0, 1, pl.ds(kv * _KV, _KV)].reshape(1, 1, _KV)
                dx = px - vx
                dy = py - vy
                e = jnp.exp(-(dx * dx + dy * dy) * inv2s2)
                out_ref[0, c] += jnp.sum(e, axis=2)

            return 0

        jax.lax.fori_loop(0, nblk, body, 0)


def _bwd_kernel(bbox_ref, verts_ref, g_ref, dv_ref, *, sigma, cutoff):
    """Vertex-major VJP. Grid (B, nblk_total): each program owns one
    128-vertex block, derives the range of pixel tiles overlapping its bbox
    (dynamic fori bounds — sentinel blocks get an empty range), accumulates
    Σ_p g·e·(p − v) in registers, and writes its dv block exactly once — no
    read-modify-write, no cross-program accumulation.

    Blocks: bbox [1, nblk, 4] SMEM; verts/dv [1, 2, KV]; g [1, 1, H, W]
    (the class channel picked by the index map from the block id)."""
    kv = pl.program_id(1)
    inv2s2 = 1.0 / (2.0 * sigma * sigma)
    inv_s2 = 1.0 / (sigma * sigma)
    cut = _num_cutoff(sigma, cutoff)
    H, W = g_ref.shape[2], g_ref.shape[3]

    minx, maxx = bbox_ref[0, kv, 0], bbox_ref[0, kv, 1]
    miny, maxy = bbox_ref[0, kv, 2], bbox_ref[0, kv, 3]
    tx0 = jnp.clip(((minx - cut) / _TW).astype(jnp.int32), 0, W // _TW - 1)
    tx1 = jnp.clip(((maxx + cut) / _TW).astype(jnp.int32) + 1, 0, W // _TW)
    ty0 = jnp.clip(((miny - cut) / _TH).astype(jnp.int32), 0, H // _TH - 1)
    ty1 = jnp.clip(((maxy + cut) / _TH).astype(jnp.int32) + 1, 0, H // _TH)
    # Fully off-canvas (incl. sentinel padding) -> empty tile range.
    off = (minx - cut > W - 1) | (maxx + cut < 0) | (miny - cut > H - 1) | (maxy + cut < 0)
    ty1 = jnp.where(off, ty0, ty1)

    vx = verts_ref[0, 0, :].reshape(1, 1, _KV)
    vy = verts_ref[0, 1, :].reshape(1, 1, _KV)

    def ty_body(ty, acc):
        def tx_body(tx, acc):
            ax, ay = acc
            y0 = (ty * _TH).astype(jnp.float32)
            x0 = (tx * _TW).astype(jnp.float32)
            py = (
                jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW, 1), 0).astype(jnp.float32)
                + y0
            )
            px = (
                jax.lax.broadcasted_iota(jnp.int32, (_TH, _TW, 1), 1).astype(jnp.float32)
                + x0
            )
            g = g_ref[0, 0, pl.ds(ty * _TH, _TH), pl.ds(tx * _TW, _TW)].reshape(
                _TH, _TW, 1
            )
            dx = px - vx
            dy = py - vy
            ge = g * jnp.exp(-(dx * dx + dy * dy) * inv2s2)
            # dL/dv = (1/σ²)·Σ_p g·e·(p − v); dx/dy are O(σ) so the
            # reduction is cancellation-free.
            return ax + jnp.sum(ge * dx, axis=(0, 1)), ay + jnp.sum(ge * dy, axis=(0, 1))

        return jax.lax.fori_loop(tx0, tx1, tx_body, acc)

    zero = jnp.zeros((_KV,), jnp.float32)
    accx, accy = jax.lax.fori_loop(ty0, ty1, ty_body, (zero, zero))
    dv_ref[0, 0, :] = accx * inv_s2
    dv_ref[0, 1, :] = accy * inv_s2


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_bboxes(verts_t: jax.Array) -> jax.Array:
    """[B, 2, N] -> per-128-block (minx, maxx, miny, maxy): [B, nblk, 4]."""
    B, _, N = verts_t.shape
    v = verts_t.reshape(B, 2, N // _KV, _KV)
    return jnp.stack(
        [
            jnp.min(v[:, 0], axis=-1),
            jnp.max(v[:, 0], axis=-1),
            jnp.min(v[:, 1], axis=-1),
            jnp.max(v[:, 1], axis=-1),
        ],
        axis=-1,
    )


def _in_specs(N, nblk, C, with_g):
    specs = [
        pl.BlockSpec((1, nblk, 4), lambda b, ty, tx: (b, 0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 2, N), lambda b, ty, tx: (b, 0, 0), memory_space=pltpu.VMEM),
    ]
    if with_g:
        specs.append(
            pl.BlockSpec(
                (1, C, _TH, _TW), lambda b, ty, tx: (b, 0, ty, tx), memory_space=pltpu.VMEM
            )
        )
    return specs


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _scores4(verts_t, C, S, sigma, size, cutoff):
    """verts_t [B, 2, N] -> scores [B, C, H, W] (channel-first)."""
    return _scores4_impl(verts_t, C, S, sigma, size, cutoff)


def _scores4_impl(verts_t, C, S, sigma, size, cutoff):
    B, _, N = verts_t.shape
    bbox = _block_bboxes(verts_t)
    kernel = functools.partial(_fwd_kernel, C=C, S=S, sigma=sigma, cutoff=cutoff)
    return pl.pallas_call(
        kernel,
        grid=(B, size // _TH, size // _TW),
        in_specs=_in_specs(N, N // _KV, C, with_g=False),
        out_specs=pl.BlockSpec(
            (1, C, _TH, _TW), lambda b, ty, tx: (b, 0, ty, tx), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, C, size, size), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * size * size * N,
            bytes_accessed=B * (2 * N + C * size * size) * 4,
            transcendentals=B * size * size * N,
        ),
        interpret=_interpret(),
    )(bbox, verts_t)


def _scores4_fwd(verts_t, C, S, sigma, size, cutoff):
    return _scores4_impl(verts_t, C, S, sigma, size, cutoff), verts_t


def _scores4_bwd(C, S, sigma, size, cutoff, verts_t, g):
    B, _, N = verts_t.shape
    nblk_total = N // _KV
    nblk_per_class = S // _KV
    bbox = _block_bboxes(verts_t)
    kernel = functools.partial(_bwd_kernel, sigma=sigma, cutoff=cutoff)
    dv = pl.pallas_call(
        kernel,
        grid=(B, nblk_total),
        in_specs=[
            pl.BlockSpec(
                (1, nblk_total, 4), lambda b, kv: (b, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec((1, 2, _KV), lambda b, kv: (b, 0, kv), memory_space=pltpu.VMEM),
            # One full image channel: the block's class, from the block id.
            pl.BlockSpec(
                (1, 1, size, size),
                lambda b, kv: (b, kv // nblk_per_class, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2, _KV), lambda b, kv: (b, 0, kv), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, 2, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=12 * B * size * size * N,
            bytes_accessed=B * (2 * N + C * size * size) * 4,
            transcendentals=B * size * size * N,
        ),
        interpret=_interpret(),
    )(bbox, verts_t, g)
    return (dv,)


_scores4.defvjp(_scores4_fwd, _scores4_bwd)


def raster_scores_pallas(
    verts2d: jax.Array,
    layout: raster_lib.PartLayout,
    cfg: raster_lib.RasterConfig,
) -> jax.Array:
    """Drop-in for raster_scores (returns [B, H*W, C]); falls back to XLA
    when the shapes don't satisfy the kernel's tiling constraints."""
    size = cfg.image_size
    C, S = layout.num_parts, layout.seg_size
    if size % _TH or size % _TW or S % _KV:
        return raster_lib.raster_scores(verts2d, layout, cfg, impl="xla")
    # Class-sorted gather + transpose stay in XLA (differentiable, cheap).
    vx = raster_lib.gather_class_sorted(verts2d, layout)  # [B, N, 2]
    verts_t = jnp.swapaxes(vx, 1, 2)  # [B, 2, N]
    score4 = _scores4(
        verts_t, C, S, float(cfg.sigma), size, float(cfg.cutoff_sigmas)
    )  # [B, C, H, W]
    B = verts2d.shape[0]
    return jnp.moveaxis(score4.reshape(B, C, size * size), 1, 2)
