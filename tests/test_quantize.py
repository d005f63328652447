"""int8 PTQ serving path (models/quantize.py).

Correctness tests run impl='sim' (fake-quant, f32 accumulation — the
readable reference semantics); test_int8_matches_sim pins the true-int8
path against it.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu.models import encoder as enc
from indirect_learning_pose_shape_tpu.models import network as net
from indirect_learning_pose_shape_tpu.models import quantize as q

from tests.test_network import small_model_cfg


def _encoder_with_moved_stats(key, cfg, rng, x):
    """init + one train step so BN running stats are non-trivial."""
    params, state = enc.encoder_init(key, cfg)
    _, state = enc.encoder_apply(params, state, x, cfg, train=True)
    return params, state


def test_fold_bn_matches_eval_encoder(rng):
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32))
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(0), cfg, rng, x)

    ref_feat, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    folded = q.fold_bn(params, state, cfg)
    feat, absmax = q.calibrate(folded, x, cfg)

    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref_feat), atol=2e-4)
    # One absmax per conv site: stem + 8 blocks x 2 convs + 3 projections.
    assert len(absmax) == 1 + 8 * 2 + 3
    assert all(float(v) > 0 for v in absmax.values())


def test_fold_bn_resnet50_sites(rng):
    cfg = enc.EncoderConfig(depth=50, width=8, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(1), cfg, rng, x)
    ref_feat, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    folded = q.fold_bn(params, state, cfg)
    feat, absmax = q.calibrate(folded, x, cfg)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref_feat), atol=2e-4)
    # stem + 16 blocks x 3 convs + 4 projections.
    assert len(absmax) == 1 + 16 * 3 + 4


def test_weight_quantization_roundtrip(rng):
    w = jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32)) * jnp.asarray(
        rng.uniform(0.1, 10.0, 16).astype(np.float32)
    )
    wq, ws = q._quantize_weight(w)
    assert wq.dtype == jnp.int8
    err = np.abs(np.asarray(wq, np.float32) * np.asarray(ws) - np.asarray(w))
    # Round-to-nearest: error <= half a quantization step, per channel.
    assert (err <= 0.5 * np.asarray(ws) + 1e-7).all()


def test_quantized_features_close_to_f32(rng):
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(4, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(2), cfg, rng, x)

    qp = q.ptq_quantize(params, state, cfg, x)
    feat_q = q.quantized_encoder_apply(qp, x, cfg, impl="sim")
    feat_f, _ = enc.encoder_apply(params, state, x, cfg, train=False)

    fq, ff = np.asarray(feat_q), np.asarray(feat_f)
    cos = (fq * ff).sum() / (np.linalg.norm(fq) * np.linalg.norm(ff))
    assert cos > 0.995, cos
    rel = np.abs(fq - ff).mean() / (np.abs(ff).mean() + 1e-9)
    assert rel < 0.15, rel


def test_quantized_forward_end_to_end(tiny_asset, rng):
    cfg = small_model_cfg()
    params, state, consts = net.init(jax.random.PRNGKey(0), tiny_asset, cfg)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    # Move BN stats off init so the fold is non-trivial.
    _, state = net.forward(params, state, consts, x, cfg, train=True)

    qp = q.ptq_quantize(params["encoder"], state["encoder"], cfg.encoder, x)
    out_q = jax.jit(
        lambda qp, ip, im: q.quantized_forward(qp, ip, consts, im, cfg, impl="sim")
    )(qp, params["ief"], x)
    out_f, _ = net.forward(params, state, consts, x, cfg, train=False)

    assert set(out_q) == set(out_f)
    for k in ("verts", "kp2d", "betas"):
        assert np.isfinite(np.asarray(out_q[k])).all()
    # IEF's near-zero-init final layer keeps outputs near mean params, so
    # quantization perturbs predictions only slightly at init scale.
    np.testing.assert_allclose(
        np.asarray(out_q["kp2d"]), np.asarray(out_f["kp2d"]), atol=2.0
    )


def test_quantized_encoder_rejects_odd_sizes(rng):
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32))
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(3), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x)
    with pytest.raises(ValueError, match="even input"):
        q.quantized_encoder_apply(
            qp, jnp.zeros((1, 47, 47, 3), jnp.float32), cfg, impl="sim"
        )
    with pytest.raises(ValueError, match="impl"):
        q.quantized_encoder_apply(qp, x, cfg, impl="int4")


def test_qparams_save_load_roundtrip(tmp_path, rng):
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(5), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x)

    path = str(tmp_path / "enc_int8.npz")
    q.save_qparams(path, qp)
    qp2 = q.load_qparams(path)

    assert set(qp2) == set(qp)
    f1 = q.quantized_encoder_apply(qp, x, cfg, impl="sim")
    f2 = q.quantized_encoder_apply(qp2, x, cfg, impl="sim")
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))

    # Corrupt dtype is refused.
    import numpy as onp

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    wkey = next(k for k in flat if k.endswith("::w"))
    flat[wkey] = flat[wkey].astype(onp.float32)
    bad = str(tmp_path / "bad.npz")
    onp.savez(bad, **flat)
    with pytest.raises(ValueError, match="int8"):
        q.load_qparams(bad)


def test_int8_matches_sim(rng):
    """True-int8 path == fake-quant path (int32 vs f32 accumulation only)."""
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(4), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x)
    f_sim = q.quantized_encoder_apply(qp, x, cfg, impl="sim")
    f_i8 = q.quantized_encoder_apply(qp, x, cfg, impl="int8")
    np.testing.assert_allclose(
        np.asarray(f_sim), np.asarray(f_i8), rtol=1e-3, atol=1e-3
    )


def test_int8c_matches_simc(rng):
    """Carried-int8 == its f32-accum twin (same requant rounding)."""
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(6), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x)
    f_simc = q.quantized_encoder_apply(qp, x, cfg, impl="simc")
    f_i8c = q.quantized_encoder_apply(qp, x, cfg, impl="int8c")
    np.testing.assert_allclose(
        np.asarray(f_simc), np.asarray(f_i8c), rtol=1e-3, atol=1e-3
    )


def test_carried_features_close_to_f32(rng):
    """The one extra requant per layer handoff stays accuracy-benign at
    feature level (same tolerance contract as the per-site path)."""
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(4, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(7), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x)
    feat_c = q.quantized_encoder_apply(qp, x, cfg, impl="simc")
    feat_f, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    fc, ff = np.asarray(feat_c), np.asarray(feat_f)
    cos = (fc * ff).sum() / (np.linalg.norm(fc) * np.linalg.norm(ff))
    assert cos > 0.99, cos
    rel = np.abs(fc - ff).mean() / (np.abs(ff).mean() + 1e-9)
    assert rel < 0.2, rel


def test_carried_resnet50_topology(rng):
    """Bottleneck blocks: two carried handoffs per block + proj shortcut."""
    cfg = enc.EncoderConfig(depth=50, width=8, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(8), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x)
    f_simc = q.quantized_encoder_apply(qp, x, cfg, impl="simc")
    f_i8c = q.quantized_encoder_apply(qp, x, cfg, impl="int8c")
    assert np.isfinite(np.asarray(f_simc)).all()
    np.testing.assert_allclose(
        np.asarray(f_simc), np.asarray(f_i8c), rtol=1e-3, atol=1e-3
    )


def test_keep_bf16_sites_improve_fidelity(rng):
    """keep_sites Pareto knob: bf16-kept sites skip weight AND activation
    rounding, so kept-site features sit strictly closer to the f32 encoder
    than the fully-quantized carried path; keeping EVERY site recovers the
    bf16 encoder up to bf16 rounding."""
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(4, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(9), cfg, rng, x)
    feat_f, _ = enc.encoder_apply(params, state, x, cfg, train=False)
    ff = np.asarray(feat_f)

    def err(keep):
        qp = q.ptq_quantize(params, state, cfg, x, keep_sites=keep)
        fc = np.asarray(q.quantized_encoder_apply(qp, x, cfg, impl="int8c"))
        return np.abs(fc - ff).mean()

    e_full = err(())
    e_ends = err(("stem", "s3"))
    e_all = err(("stem", "s0", "s1", "s2", "s3"))
    assert e_ends < e_full, (e_ends, e_full)
    # All-kept is NOT bit-equal to the f32 reference — the kept sites run
    # bf16 — so the floor is bf16 rounding, measured ~3.7x below full int8c.
    assert e_all < 0.5 * e_full, (e_all, e_full)


def test_keep_bf16_matches_across_impls(rng):
    """Mixed kept/quantized chains agree between int8c and simc, and the
    per-site impls accept kept sites too."""
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(10), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x, keep_sites=("stem", "s2b1", "s3"))
    assert "w_bf16" in qp["stem"] and "w_bf16" in qp["s3b0/conv1"]
    assert "w_bf16" not in qp["s0b0/conv1"]
    f_simc = q.quantized_encoder_apply(qp, x, cfg, impl="simc")
    f_i8c = q.quantized_encoder_apply(qp, x, cfg, impl="int8c")
    np.testing.assert_allclose(
        np.asarray(f_simc), np.asarray(f_i8c), rtol=2e-3, atol=2e-3
    )
    f_i8 = q.quantized_encoder_apply(qp, x, cfg, impl="int8")
    assert np.isfinite(np.asarray(f_i8)).all()


def test_keep_bf16_save_load_roundtrip(tmp_path, rng):
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(11), cfg, rng, x)
    qp = q.ptq_quantize(params, state, cfg, x, keep_sites=("stem",))
    path = str(tmp_path / "enc_keep.npz")
    q.save_qparams(path, qp)
    qp2 = q.load_qparams(path)
    assert qp2["stem"]["w_bf16"].dtype == jnp.bfloat16
    f1 = q.quantized_encoder_apply(qp, x, cfg, impl="simc")
    f2 = q.quantized_encoder_apply(qp2, x, cfg, impl="simc")
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_keep_bf16_refuses_unmatched_patterns(rng):
    """A keep pattern matching no site must raise, not silently keep
    nothing (regression: '--keep-bf16 s4' was a silent no-op — ResNet
    stages are s0-s3, so 's4' matched zero sites and produced a qparams
    tree bit-identical to plain int8c)."""
    cfg = enc.EncoderConfig(depth=18, width=16, compute_dtype=jnp.float32)
    x = jnp.asarray(rng.randn(2, 48, 48, 3).astype(np.float32)).clip(-1, 1)
    params, state = _encoder_with_moved_stats(jax.random.PRNGKey(9), cfg, rng, x)
    with pytest.raises(ValueError, match="s4"):
        q.ptq_quantize(params, state, cfg, x, keep_sites=("s4",))
    with pytest.raises(ValueError, match="match no encoder site"):
        q.ptq_quantize(params, state, cfg, x, keep_sites=("stem", "nope"))
