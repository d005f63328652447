"""Rasterizer + camera golden tests vs numpy oracle, plus gradient checks."""

import jax
import jax.numpy as jnp
import numpy as np

from indirect_learning_pose_shape_tpu.ops import camera, raster
from indirect_learning_pose_shape_tpu.utils import oracle


def test_project_matches_oracle(rng):
    x3d = rng.randn(11, 3).astype(np.float32)
    cam = np.array([0.8, 0.1, -0.2], np.float32)
    got = np.asarray(camera.project_pixel(jnp.asarray(x3d), jnp.asarray(cam), 64))
    want = oracle.project_weak_perspective(x3d, cam, 64)
    np.testing.assert_allclose(got, want, atol=1e-4)


def _setup(rng, batch=2, num_verts=40, size=32, num_parts=5):
    verts2d = (rng.rand(batch, num_verts, 2) * size).astype(np.float32)
    labels = rng.randint(0, num_parts, size=num_verts)
    layout = raster.build_part_layout(labels, num_parts, lane=16)
    cfg = raster.RasterConfig(
        image_size=size, num_parts=num_parts, sigma=2.0, bg_gamma=1.0, pixel_chunk=128
    )
    return verts2d, labels, layout, cfg


def test_raster_matches_oracle(rng):
    verts2d, labels, layout, cfg = _setup(rng)
    out = jax.jit(
        lambda v: raster.soft_rasterize(v, layout, cfg)
    )(jnp.asarray(verts2d))
    for i in range(verts2d.shape[0]):
        want = oracle.soft_rasterize(
            verts2d[i], labels, cfg.image_size, cfg.num_parts, cfg.sigma, cfg.bg_gamma
        )
        # f32 d² feeding exp amplifies rounding; 2e-3 abs on probs in [0,1].
        np.testing.assert_allclose(
            np.asarray(out["probs"][i]), want["probs"], atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(out["silhouette"][i]), want["silhouette"], atol=2e-3
        )


def test_raster_chunking_invariance(rng):
    """Output must not depend on the pixel_chunk memory knob."""
    verts2d, _, layout, cfg = _setup(rng)
    import dataclasses

    a = raster.soft_rasterize(jnp.asarray(verts2d), layout, cfg)
    cfg2 = dataclasses.replace(cfg, pixel_chunk=1024)
    b = raster.soft_rasterize(jnp.asarray(verts2d), layout, cfg2)
    np.testing.assert_allclose(np.asarray(a["probs"]), np.asarray(b["probs"]), atol=1e-6)


def test_raster_probs_normalized(rng):
    verts2d, _, layout, cfg = _setup(rng)
    out = raster.soft_rasterize(jnp.asarray(verts2d), layout, cfg)
    sums = np.asarray(out["probs"]).sum(axis=-1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_raster_gradient_finite_difference(rng):
    """FD check of d(loss)/d(verts2d) through the full raster (SURVEY §4.2).

    The finite difference is computed through the float64 numpy oracle (same
    math, see utils/oracle.py); f32 FD is too noisy for a meaningful check.
    """
    verts2d, labels, layout, cfg = _setup(rng, batch=1, num_verts=12, size=16)
    target = (rng.rand(1, 16, 16) > 0.5).astype(np.float64)

    def loss_jax(v):
        sil = raster.soft_rasterize(v, layout, cfg)["silhouette"]
        return jnp.mean((sil - target.astype(np.float32)) ** 2)

    def loss_np(v):  # float64 oracle version of the same loss
        sil = oracle.soft_rasterize(
            v[0], labels, cfg.image_size, cfg.num_parts, cfg.sigma, cfg.bg_gamma
        )["silhouette"]
        return float(np.mean((sil - target[0]) ** 2))

    g = np.asarray(jax.grad(loss_jax)(jnp.asarray(verts2d)))
    assert np.all(np.isfinite(g))
    v64 = verts2d.astype(np.float64)
    eps = 1e-5
    for (vi, ci) in [(0, 0), (5, 1), (11, 0)]:
        dv = np.zeros_like(v64)
        dv[0, vi, ci] = eps
        fd = (loss_np(v64 + dv) - loss_np(v64 - dv)) / (2 * eps)
        np.testing.assert_allclose(g[0, vi, ci], fd, rtol=5e-2, atol=1e-7)


def test_gradient_reaches_every_vertex(rng):
    """Indirect-learning property: every vertex gets signal (SURVEY §3.4)."""
    verts2d, _, layout, cfg = _setup(rng, batch=1, size=32)

    def loss(v):
        out = raster.soft_rasterize(v, layout, cfg)
        return jnp.sum(out["silhouette"])

    g = np.asarray(jax.grad(loss)(jnp.asarray(verts2d)))
    # All vertices on-canvas here, so all should receive nonzero gradient.
    assert np.all(np.abs(g).sum(axis=-1) > 0)


def test_separable_matches_xla_forward_and_grad(rng):
    """The separable MXU formulation == the pairwise gather path, fwd + grad.

    exp(−(dx²+dy²)/2σ²) = exp(−dy²/2σ²)·exp(−dx²/2σ²) exactly; both paths
    must agree to f32 rounding (different summation order only). Pins
    matmul_precision='highest' — the bit-comparison setting."""
    import dataclasses

    verts2d, _, layout, cfg = _setup(rng, batch=2, num_verts=60, size=32)
    cfg = dataclasses.replace(cfg, matmul_precision="highest")
    v = jnp.asarray(verts2d)

    def loss(vv, impl):
        out = raster.soft_rasterize(vv, layout, cfg, impl=impl)
        return jnp.sum(out["silhouette"] ** 2) + jnp.sum(out["probs"][..., 1:] ** 1.5)

    a = raster.raster_scores(v, layout, cfg, impl="xla")
    b = raster.raster_scores(v, layout, cfg, impl="separable")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    ga = np.asarray(jax.grad(loss)(v, "xla"))
    gb = np.asarray(jax.grad(loss)(v, "separable"))
    np.testing.assert_allclose(ga, gb, atol=1e-5)


def test_gather_class_sorted_inverse_vjp(rng):
    """The custom inverse-permutation VJP == plain autodiff, bit-exact.

    gather_class_sorted's backward is a gather by layout.inv instead of the
    scatter-add XLA autodiff emits (docs/DESIGN.md round-3 profile); both
    move each cotangent element to exactly one place, so the results must be
    EQUAL, not just close. Also pins the inverse-map invariants."""
    verts2d, _, layout, _ = _setup(rng, batch=2, num_verts=37)
    V = verts2d.shape[1]
    perm = np.asarray(layout.perm)
    inv = np.asarray(layout.inv)
    valid = np.asarray(layout.valid)
    assert np.array_equal(perm[inv], np.arange(V))
    assert np.all(valid[inv] == 1.0)

    def plain(v):
        g = jnp.take(v, layout.perm, axis=1)
        return jnp.where(layout.valid[None, :, None] > 0, g, raster._SENTINEL)

    v = jnp.asarray(verts2d)
    dy = jnp.asarray(rng.randn(*plain(v).shape).astype(np.float32))
    np.testing.assert_array_equal(
        np.asarray(raster.gather_class_sorted(v, layout)), np.asarray(plain(v))
    )
    g_new = jax.grad(lambda x: jnp.sum(raster.gather_class_sorted(x, layout) * dy))(v)
    g_old = jax.grad(lambda x: jnp.sum(plain(x) * dy))(v)
    np.testing.assert_array_equal(np.asarray(g_new), np.asarray(g_old))


def test_separable_sentinel_padding_invisible(rng):
    """Padded (sentinel) slots contribute exactly zero in the separable path."""
    verts2d, labels, layout, cfg = _setup(rng, num_verts=37)  # ragged -> padding
    assert float(np.asarray(layout.valid).sum()) < layout.valid.shape[0]
    scores = np.asarray(
        raster.raster_scores(jnp.asarray(verts2d), layout, cfg, impl="separable")
    )
    assert np.all(np.isfinite(scores))
    # An empty class (no vertex has the last label) must score exactly 0.
    empty = [c for c in range(cfg.num_parts) if not np.any(labels == c)]
    for c in empty:
        np.testing.assert_array_equal(scores[..., c], 0.0)


def test_raster_31_parts(rng):
    """The reference's possible 31-part segmentation (SURVEY §0.1 item 3)."""
    verts2d = (rng.rand(1, 200, 2) * 64).astype(np.float32)
    labels = rng.randint(0, 31, size=200)
    layout = raster.build_part_layout(labels, 31, lane=16)
    cfg = raster.RasterConfig(image_size=64, num_parts=31, pixel_chunk=512)
    out = raster.soft_rasterize(jnp.asarray(verts2d), layout, cfg)
    assert out["probs"].shape == (1, 64, 64, 32)
    np.testing.assert_allclose(np.asarray(out["probs"]).sum(-1), 1.0, atol=1e-5)


def test_raster_scores_cf_matches_channel_last(rng):
    """raster_scores_cf ([B,C,H,W]) is a pure layout change of raster_scores
    ([B,H*W,C]) on every impl, and honors out_dtype."""
    import dataclasses

    verts2d, _, layout, cfg = _setup(rng)
    cfg = dataclasses.replace(cfg, matmul_precision="highest")
    v = jnp.asarray(verts2d)
    B, size, C = verts2d.shape[0], cfg.image_size, cfg.num_parts
    for impl in ("separable", "xla"):
        cf = raster.raster_scores_cf(v, layout, cfg, impl=impl)
        cl = raster.raster_scores(v, layout, cfg, impl=impl)
        assert cf.shape == (B, C, size, size)
        np.testing.assert_allclose(
            np.asarray(cf),
            np.moveaxis(np.asarray(cl), 2, 1).reshape(B, C, size, size),
            atol=1e-6,
        )
    bf = raster.raster_scores_cf(v, layout, cfg, out_dtype=jnp.bfloat16)
    assert bf.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(bf, np.float32),
        np.asarray(raster.raster_scores_cf(v, layout, cfg)),
        atol=2e-2, rtol=2e-2,
    )


def test_train_score_dtype_bf16_close_to_f32(rng):
    """RasterConfig.train_score_dtype='bfloat16' (the preset setting) changes
    soft_rasterize_train's score storage only: values within bf16 rounding of
    the f32 path, s_total/silhouette still f32, and gradients through the
    score-form CE stay within ~1% relative."""
    import dataclasses

    from indirect_learning_pose_shape_tpu import losses

    verts2d, _, layout, cfg = _setup(rng)
    v = jnp.asarray(verts2d)
    cfg_bf = dataclasses.replace(cfg, train_score_dtype="bfloat16")
    labels = jnp.asarray(
        np.random.RandomState(0).randint(
            0, cfg.num_parts + 1, (verts2d.shape[0], cfg.image_size, cfg.image_size)
        ).astype(np.int32)
    )

    def ce(vv, c):
        out = raster.soft_rasterize_train(vv, layout, c)
        return losses.part_seg_ce_scores(
            out["score_cp"], out["s_total"], c.bg_gamma, labels
        )

    out_bf = raster.soft_rasterize_train(v, layout, cfg_bf)
    out_f = raster.soft_rasterize_train(v, layout, cfg)
    assert out_bf["score_cp"].dtype == jnp.bfloat16
    assert out_bf["s_total"].dtype == jnp.float32
    assert out_bf["silhouette"].dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out_bf["score_cp"], np.float32),
        np.asarray(out_f["score_cp"]),
        atol=2e-2, rtol=2e-2,
    )
    va, ga = jax.value_and_grad(ce)(v, cfg)
    vb, gb = jax.value_and_grad(ce)(v, cfg_bf)
    np.testing.assert_allclose(float(va), float(vb), rtol=2e-2)
    ga, gb = np.asarray(ga), np.asarray(gb)
    denom = np.abs(ga).max()
    np.testing.assert_allclose(gb / denom, ga / denom, atol=2e-2)
