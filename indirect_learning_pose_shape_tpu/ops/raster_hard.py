"""Hard (z-buffered) triangle rasterizer for TARGET generation.

Breaks the training↔supervision circularity of the soft vertex-splat
rasterizer (ops/raster.py): the synthetic stream's targets and the
disk-dataset generator can render ground-truth part masks / silhouettes from
the asset's triangle FACES with hard edges and true occlusion — the genre's
"target silhouette load-or-render" channel (SURVEY.md §2.8), i.e. what a real
dataset's annotation masks look like — while the model still trains through
the differentiable soft raster. This is the jittable TPU port of
predict.shade_mesh's numpy z-buffer loop (same math, same z convention:
larger z is nearer the camera).

TPU-first design, not a scanline port: triangles' edge functions and the
interpolated depth are affine in pixel coordinates, so each face is 13 f32
coefficients; the image is split into static square tiles, faces are culled
per tile with a dense bbox-overlap matrix + `lax.top_k` (static K slots — no
dynamic shapes), and a `lax.scan` over face-slot chunks carries the
(zbuf, class, shade) state per pixel. Everything is large batched
vector work on static shapes; there is no scatter and no data-dependent
control flow. Target generation only — never differentiated (the soft
raster owns the gradient path), so inputs are stop_gradient'ed.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

_NEG = -3.0e38  # empty-pixel z sentinel (below any real depth, f32-safe)


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["faces", "face_class"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class HardConsts:
    """Static face topology for the hard target renderer.

    faces      [F, 3] int32 vertex indices (asset.faces)
    face_class [F]    int32 part class in [0, num_parts) (bg is NOT a class
                      here; the raster emits label 0 for uncovered pixels and
                      class+1 for covered ones, matching the soft targets).
    """

    faces: jax.Array
    face_class: jax.Array


def build_hard_consts(faces: np.ndarray, vertex_class: np.ndarray) -> HardConsts:
    """Face part classes from per-vertex classes: majority vote of the 3
    corners (ties go to the lowest class, like np.bincount argmax)."""
    faces = np.asarray(faces, np.int32)
    vc = np.asarray(vertex_class, np.int32)
    corner = vc[faces]  # [F, 3]
    # Majority of three: if any two agree use that value, else corner 0.
    a, b, c = corner[:, 0], corner[:, 1], corner[:, 2]
    face_class = np.where(b == c, b, a)
    return HardConsts(
        faces=jnp.asarray(faces), face_class=jnp.asarray(face_class, jnp.int32)
    )


def _face_coeffs(verts2d, verts_z, hc: HardConsts, with_shade, light):
    """Per-face affine coefficients [B, F, 13]:
    (a0,b0,c0, a1,b1,c1, a2,b2,c2, az,bz,cz, shade) with edge functions
    w_i(x, y) = a_i x + b_i y + c_i sign-folded so that inside ⇔ all w_i ≥ 0,
    and depth z(x, y) = az x + bz y + cz (barycentric interpolation).
    Degenerate faces get c_i = -1, never inside.
    """
    tri = jnp.take(verts2d, hc.faces, axis=1)  # [B, F, 3, 2]
    tz = jnp.take(verts_z, hc.faces, axis=1)  # [B, F, 3]
    x = tri[..., 0]  # [B, F, 3]
    y = tri[..., 1]

    def edge(i, j):
        # w(p) = (xj - xi)(py - yi) - (yj - yi)(px - xi)
        a = -(y[..., j] - y[..., i])
        b = x[..., j] - x[..., i]
        c = (y[..., j] - y[..., i]) * x[..., i] - (x[..., j] - x[..., i]) * y[..., i]
        return a, b, c

    # Edge i is the edge OPPOSITE vertex i; w_i / area = barycentric λ_i.
    e0 = edge(1, 2)
    e1 = edge(2, 0)
    e2 = edge(0, 1)
    # Signed area ×2: evaluate w_0 at vertex 0.
    area = e0[0] * x[..., 0] + e0[1] * y[..., 0] + e0[2]
    s = jnp.sign(area)
    ok = jnp.abs(area) > 1e-9
    inv = jnp.where(ok, s / jnp.maximum(jnp.abs(area), 1e-9), 0.0)

    coeffs = []
    for a, b, c in (e0, e1, e2):
        coeffs += [a * s, b * s, jnp.where(ok, c * s, -1.0)]
    # z-plane: z(p) = Σ λ_i z_i = (Σ w_i z_i) / area.
    az = (e0[0] * tz[..., 0] + e1[0] * tz[..., 1] + e2[0] * tz[..., 2]) * inv
    bz = (e0[1] * tz[..., 0] + e1[1] * tz[..., 1] + e2[1] * tz[..., 2]) * inv
    cz = (e0[2] * tz[..., 0] + e1[2] * tz[..., 1] + e2[2] * tz[..., 2]) * inv
    coeffs += [az, bz, cz]

    if with_shade:
        # Flat Lambertian shade per face from the screen-space normal
        # (px, px, raw-z mixed units — exactly predict.shade_mesh's rule),
        # flipped toward the viewer.
        p = jnp.concatenate([tri, tz[..., None]], axis=-1)  # [B, F, 3, 3]
        n = jnp.cross(p[:, :, 1] - p[:, :, 0], p[:, :, 2] - p[:, :, 0])
        n = jnp.where(n[..., 2:3] < 0, -n, n)
        n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
        l = light / jnp.maximum(jnp.linalg.norm(light, axis=-1, keepdims=True), 1e-9)
        if l.ndim == 1:
            l = l[None, None, :]
        else:
            l = l[:, None, :]
        shade = 0.25 + 0.75 * jnp.clip(jnp.sum(n * l, axis=-1), 0.0, 1.0)
    else:
        shade = jnp.zeros(x.shape[:2], x.dtype)
    coeffs.append(shade)

    bbox = (
        jnp.min(x, -1),
        jnp.max(x, -1),
        jnp.min(y, -1),
        jnp.max(y, -1),
    )
    return jnp.stack(coeffs, axis=-1), bbox, ok  # [B, F, 13]


def hard_raster(
    verts2d: jax.Array,
    verts_z: jax.Array,
    hc: HardConsts,
    size: int,
    *,
    tile: int = 32,
    k_faces: int | None = None,
    chunk: int = 64,
    with_shade: bool = False,
    light=(0.35, -0.5, 0.79),
    constrain=None,
) -> dict[str, jax.Array]:
    """Z-buffered hard part-mask render. Jittable, target generation only.

    verts2d [B, V, 2] pixel coords, verts_z [B, V] depth (larger = nearer).
    `k_faces` bounds faces per image tile (lax.top_k culling); None keeps
    every face in every tile (exact; the default — the synthetic stand-in's
    per-part hull mesh is only ~1.8k faces, where dense beats the culling
    overhead). If a tile overlaps more than k_faces faces the excess is
    DROPPED and counted in `overflow` — callers picking k_faces must check
    it is 0 on their distribution (tests do).

    Returns dict:
      part_labels [B, S, S] int32 (0 = background, class c covered → c+1)
      silhouette  [B, S, S] float32 hard {0, 1} mask
      zbuf        [B, S, S] float32 depth (empty pixels at -3e38)
      shade       [B, S, S] float32 flat shade in [0,1] (when with_shade)
      overflow    []        int32 max culled-out face count over tiles

    `constrain` (parallel/render_sp.constrainer) row-shards the pixel work
    over the mesh's 'render' axis: the tile index is ty-major, so sharding
    the [B, nt, tile²] scan carries in contiguous blocks IS row-band
    sharding, and the detiled [B, S, S] outputs land row-sharded with no
    resharding collective (blocks coincide). The face-coefficient side
    stays replicated — it is tiny next to the pixel grids.
    """
    if size % tile:
        raise ValueError(f"size {size} must be a multiple of tile {tile}")
    cst = constrain if constrain is not None else (lambda name, x: x)
    verts2d = jax.lax.stop_gradient(verts2d.astype(jnp.float32))
    verts_z = jax.lax.stop_gradient(verts_z.astype(jnp.float32))
    light = jnp.asarray(light, jnp.float32)
    B = verts2d.shape[0]
    F = int(hc.faces.shape[0])
    T = size // tile
    nt = T * T

    coeffs, (xmin, xmax, ymin, ymax), ok = _face_coeffs(
        verts2d, verts_z, hc, with_shade, light
    )
    fclass = jnp.broadcast_to(hc.face_class[None, :], (B, F))

    # Tile pixel grid: tile t = ty*T + tx; pixel p = oy*tile + ox.
    off = jnp.arange(tile, dtype=jnp.float32)
    ox = jnp.tile(off, tile)  # [tile²]
    oy = jnp.repeat(off, tile)
    base = jnp.arange(T, dtype=jnp.float32) * tile
    px = base[None, :, None] + ox[None, None, :]  # [1, T, tile²] x per tx
    py = base[:, None, None] + oy[None, None, :]  # [T, 1, tile²] y per ty
    pxf = jnp.broadcast_to(px, (T, T, tile * tile)).reshape(nt, tile * tile)
    pyf = jnp.broadcast_to(py, (T, T, tile * tile)).reshape(nt, tile * tile)

    if k_faces is not None and k_faces < F:
        # Per-tile culling: bbox ↔ tile overlap, top_k static face slots.
        tx0 = jnp.floor(xmin / tile)
        tx1 = jnp.floor(xmax / tile)
        ty0 = jnp.floor(ymin / tile)
        ty1 = jnp.floor(ymax / tile)
        tids = jnp.arange(T, dtype=jnp.float32)
        ovx = (tids[None, :, None] >= tx0[:, None, :]) & (
            tids[None, :, None] <= tx1[:, None, :]
        )  # [B, T, F]
        ovy = (tids[None, :, None] >= ty0[:, None, :]) & (
            tids[None, :, None] <= ty1[:, None, :]
        )
        visible = (
            ok
            & (xmax >= 0.0)
            & (xmin <= size - 1.0)
            & (ymax >= 0.0)
            & (ymin <= size - 1.0)
        )
        overlap = (
            ovy[:, :, None, :] & ovx[:, None, :, :] & visible[:, None, None, :]
        ).reshape(B, nt, F)
        ovf = overlap.astype(jnp.float32)
        topval, topidx = jax.lax.top_k(ovf, k_faces)  # [B, nt, K]
        overflow = jnp.max(
            jnp.sum(overlap, axis=-1, dtype=jnp.int32) - k_faces
        )
        overflow = jnp.maximum(overflow, 0)
        slot_coeffs = jnp.take_along_axis(
            coeffs[:, None], topidx[..., None], axis=2
        )  # [B, nt, K, 13] (coeffs broadcast over tiles)
        slot_class = jnp.take_along_axis(fclass[:, None], topidx, axis=2)
        slot_live = topval > 0.0
        K = k_faces
    else:
        slot_coeffs = jnp.broadcast_to(
            coeffs[:, None], (B, 1, F, coeffs.shape[-1])
        )
        slot_class = fclass[:, None]
        slot_live = jnp.broadcast_to(ok[:, None], (B, 1, F))
        overflow = jnp.zeros((), jnp.int32)
        K = F

    npad = -K % chunk
    if npad:
        pad = lambda a, v: jnp.pad(
            a, [(0, 0), (0, 0), (0, npad)] + [(0, 0)] * (a.ndim - 3),
            constant_values=v,
        )
        slot_coeffs = pad(slot_coeffs, 0.0)
        slot_class = pad(slot_class, 0)
        slot_live = pad(slot_live, False)
    nchunks = (K + npad) // chunk
    # [nchunks, B, nt|1, chunk, ...]
    cs = slot_coeffs.reshape(
        B, slot_coeffs.shape[1], nchunks, chunk, slot_coeffs.shape[-1]
    ).transpose(2, 0, 1, 3, 4)
    cls = slot_class.reshape(B, slot_class.shape[1], nchunks, chunk).transpose(
        2, 0, 1, 3
    )
    live = slot_live.reshape(B, slot_live.shape[1], nchunks, chunk).transpose(
        2, 0, 1, 3
    )

    def eval_z(cf, cl):
        """Evaluate this chunk's faces at this tile's pixels:
        [B, nt|1, chunk, 1] × [nt, tile²] → z [B, nt, chunk, tile²]
        (−NEG where outside/dead). Pure elementwise broadcast work."""
        w0 = cf[..., 0:1] * pxf[:, None] + cf[..., 1:2] * pyf[:, None] + cf[..., 2:3]
        w1 = cf[..., 3:4] * pxf[:, None] + cf[..., 4:5] * pyf[:, None] + cf[..., 5:6]
        w2 = cf[..., 6:7] * pxf[:, None] + cf[..., 7:8] * pyf[:, None] + cf[..., 8:9]
        z = cf[..., 9:10] * pxf[:, None] + cf[..., 10:11] * pyf[:, None] + cf[..., 11:12]
        inside = (w0 >= 0.0) & (w1 >= 0.0) & (w2 >= 0.0) & cl[..., None]
        return jnp.where(inside, z, _NEG)

    # Two passes, both gather-free: pass 1 is a pure max-reduce for the
    # z-buffer; pass 2 re-evaluates and where-accumulates the winning face's
    # class/shade at pixels whose z matches the buffer (the recompute is
    # bit-deterministic — identical ops on identical inputs). The obvious
    # single-pass carry (argmax over the chunk + take_along_axis of the
    # winner) measured ~300× slower on TPU: per-element dynamic gathers in a
    # scan body are poison for the vector unit, while max/where streams are
    # exactly what it is built for. Equal-z ties resolve to the largest
    # class id (deterministic; ties occur only on shared hull edges, where
    # both faces carry the same part anyway).

    def body_z(zbest, xs):
        cf, cl = xs
        return jnp.maximum(zbest, jnp.max(eval_z(cf, cl), axis=2)), None

    zbuf, _ = jax.lax.scan(
        body_z,
        cst("tiles_bnt", jnp.full((B, nt, tile * tile), _NEG, jnp.float32)),
        (cs, live),
    )

    def body_win(carry, xs):
        cbest, sbest = carry
        cf, cc, cl = xs
        z = eval_z(cf, cl)
        hit = z >= zbuf[:, :, None, :]
        cbest = jnp.maximum(
            cbest, jnp.max(jnp.where(hit, cc[..., None] + 1, 0), axis=2)
        )
        if with_shade:
            sbest = jnp.maximum(
                sbest, jnp.max(jnp.where(hit, cf[..., 12:13], 0.0), axis=2)
            )
        return (cbest, sbest), None

    (cwin, swin), _ = jax.lax.scan(
        body_win,
        (
            cst("tiles_bnt", jnp.zeros((B, nt, tile * tile), jnp.int32)),
            cst("tiles_bnt", jnp.zeros((B, nt, tile * tile), jnp.float32)),
        ),
        (cs, cls, live),
    )

    def detile(a):
        # [B, ty*T+tx, oy*tile+ox] → [B, S, S]
        return (
            a.reshape(B, T, T, tile, tile)
            .transpose(0, 1, 3, 2, 4)
            .reshape(B, size, size)
        )

    zbuf = cst("image_bhw", detile(zbuf))
    covered = zbuf > _NEG / 2
    # cwin already carries class+1 (0 = no face won the pixel).
    out = {
        "part_labels": cst(
            "image_bhw", jnp.where(covered, detile(cwin), 0).astype(jnp.int32)
        ),
        "silhouette": cst("image_bhw", covered.astype(jnp.float32)),
        "zbuf": zbuf,
        "overflow": overflow,
    }
    if with_shade:
        out["shade"] = cst("image_bhw", jnp.where(covered, detile(swin), 0.0))
    return out


def hard_raster_oracle(
    verts2d: np.ndarray,
    verts_z: np.ndarray,
    faces: np.ndarray,
    face_class: np.ndarray,
    size: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference numpy z-buffer labeller (single image) for golden tests —
    the same triangle loop as predict.shade_mesh but emitting part labels.
    Returns (part_labels [S,S] int32, zbuf [S,S] float32)."""
    v = np.concatenate(
        [np.asarray(verts2d, np.float64), np.asarray(verts_z, np.float64)[:, None]],
        axis=1,
    )
    tri = v[np.asarray(faces, np.int64)]
    labels = np.zeros((size, size), np.int32)
    zbuf = np.full((size, size), -np.inf, np.float64)
    for f in range(len(tri)):
        t = tri[f]
        x0, x1 = int(np.floor(t[:, 0].min())), int(np.ceil(t[:, 0].max()))
        y0, y1 = int(np.floor(t[:, 1].min())), int(np.ceil(t[:, 1].max()))
        x0, y0 = max(x0, 0), max(y0, 0)
        x1, y1 = min(x1, size - 1), min(y1, size - 1)
        if x1 < x0 or y1 < y0:
            continue
        d = (t[1, 0] - t[0, 0]) * (t[2, 1] - t[0, 1]) - (t[2, 0] - t[0, 0]) * (
            t[1, 1] - t[0, 1]
        )
        if abs(d) < 1e-9:
            continue
        xs, ys = np.meshgrid(
            np.arange(x0, x1 + 1, dtype=np.float64),
            np.arange(y0, y1 + 1, dtype=np.float64),
        )
        w1 = ((xs - t[0, 0]) * (t[2, 1] - t[0, 1]) - (t[2, 0] - t[0, 0]) * (ys - t[0, 1])) / d
        w2 = ((t[1, 0] - t[0, 0]) * (ys - t[0, 1]) - (xs - t[0, 0]) * (t[1, 1] - t[0, 1])) / d
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        z = w0 * t[0, 2] + w1 * t[1, 2] + w2 * t[2, 2]
        sub_z = zbuf[y0 : y1 + 1, x0 : x1 + 1]
        upd = inside & (z > sub_z)
        sub_z[upd] = z[upd]
        labels[y0 : y1 + 1, x0 : x1 + 1][upd] = int(face_class[f]) + 1
    return labels, zbuf.astype(np.float32)
