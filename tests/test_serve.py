"""Bucketed serving runtime (serve.Predictor)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from indirect_learning_pose_shape_tpu import serve, train
from indirect_learning_pose_shape_tpu.data import synthetic
from tests.test_train import tiny_train_cfg


@pytest.fixture(scope="module")
def setup(tiny_asset):
    cfg = tiny_train_cfg(batch_size=4)
    ts, consts = train.init_state(cfg, tiny_asset)
    batch = jax.jit(lambda k: synthetic.generate_batch(k, 8, consts, cfg.model))(
        jax.random.PRNGKey(0)
    )
    return cfg, ts, consts, batch


def test_bucketing_pads_and_slices(setup):
    cfg, ts, consts, batch = setup
    p = serve.Predictor(cfg, ts.params, ts.model_state, consts, buckets=(2, 4, 8))
    assert p.bucket_for(1) == 2 and p.bucket_for(3) == 4 and p.bucket_for(8) == 8
    with pytest.raises(ValueError, match="exceeds largest bucket"):
        p.bucket_for(9)

    out3 = p(batch["image"][:3])
    assert out3["verts"].shape[0] == 3  # sliced back from the 4-bucket

    # Padded rows do not perturb real rows: batch-3 result equals the first
    # three rows of the batch-8 (exact-bucket) result. BatchNorm runs on
    # running stats at eval, so rows are independent.
    out8 = p(batch["image"])
    np.testing.assert_allclose(
        np.asarray(out3["kp2d"]), np.asarray(out8["kp2d"][:3]), rtol=1e-4, atol=1e-4
    )


def test_one_compile_per_bucket(setup):
    cfg, ts, consts, batch = setup
    p = serve.Predictor(cfg, ts.params, ts.model_state, consts, buckets=(2, 4))
    for n in (1, 2):
        p(batch["image"][:n])
    sizes1 = p._fwd._cache_size()
    for n in (1, 2, 1, 2):  # same buckets again: no new entries
        p(batch["image"][:n])
    assert p._fwd._cache_size() == sizes1 == 1  # both n pad to bucket 2


def test_int8_predictor(setup):
    cfg, ts, consts, batch = setup
    from indirect_learning_pose_shape_tpu.models import quantize as quant

    qp = quant.ptq_quantize(
        ts.params["encoder"], ts.model_state["encoder"], cfg.model.encoder,
        batch["image"],
    )
    p = serve.Predictor(cfg, ts.params, ts.model_state, consts, qparams=qp,
                        buckets=(4,))
    out = p(batch["image"][:3])
    assert out["verts"].shape[0] == 3
    assert np.isfinite(np.asarray(out["kp2d"])).all()


def test_bad_buckets_refused(setup):
    cfg, ts, consts, _ = setup
    with pytest.raises(ValueError, match="positive"):
        serve.Predictor(cfg, ts.params, ts.model_state, consts, buckets=(0, 4))
